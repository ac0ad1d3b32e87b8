"""Masked-attention transformer decoder (video Mask2Former).

Mirrors reference src/models/mask2former/video_seg_decoder.py:
  * 100 learned queries with two embeddings (:1483-1575);
  * 9 decoder layers (config.decoder_layers - 1, :1186), each =
    masked cross-attention (attention restricted to the foreground of the
    previous layer's predicted mask, binarized at 0.5, :1423-1480) +
    self-attention + FFN, cycling over the 3 pixel-decoder levels (:1304);
  * mask head: 3-layer MLP -> einsum with per-frame pixel embeddings
    ``bqc,bthwc->bqthw`` (:1444-1458);
  * per-layer intermediate (layernormed) states for aux class predictions.

Batch-first layout throughout (the reference is seq-first); frames = views.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from siu3r_tpu.config import Mask2formerCfg
from siu3r_tpu.models.layers import bilinear_resize_torch
from siu3r_tpu.models.mask2former.position import sine_pos_embed_3d
from siu3r_tpu.ops.attention import multi_head_attention


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention-equivalent (packed qkv in torch; here
    separate q/k/v projections — the converter splits in_proj_weight).
    mask: [B, Nq, Nk] bool, True = exclude (torch attn_mask semantics)."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, exclude_mask=None):
        b, nq, c = query.shape
        nk = key.shape[1]
        h = self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(value)
        q = q.reshape(b, nq, h, c // h).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, h, c // h).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, h, c // h).transpose(0, 2, 1, 3)
        mask = None if exclude_mask is None else ~exclude_mask
        out = multi_head_attention(q, k, v, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class SelfAttention(nn.Module):
    """VideoMask2FormerAttention (reference :739-912): position embeddings
    added to q and k, values from the original states."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, pos):
        b, n, c = hidden.shape
        h = self.num_heads
        withpos = hidden + pos
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(withpos)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(withpos)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(hidden)
        q = q.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)
        out = multi_head_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class MLPPredictionHead(nn.Module):
    """3-layer MLP (reference :1380-1420)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MaskPredictor(nn.Module):
    """reference :1423-1480"""

    cfg: Mask2formerCfg
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, outputs, pixel_embeddings, target_hw: Tuple[int, int]):
        """outputs [B, Q, C]; pixel_embeddings [B, V, H, W, C].
        Returns (mask_logits [B, Q, V, H, W], exclude_mask [B, Q, V*h*w])."""
        mask_emb = MLPPredictionHead(
            self.cfg.hidden_dim, self.cfg.mask_feature_size, dtype=self.dtype,
            name="mask_embedder",
        )(outputs)
        mask_logits = jnp.einsum("bqc,bvhwc->bqvhw", mask_emb, pixel_embeddings)
        b, q, v, h, w = mask_logits.shape
        th, tw = target_hw
        att = bilinear_resize_torch(
            mask_logits.reshape(b * q * v, h, w, 1), (th, tw), align_corners=False
        ).reshape(b, q, v, th, tw)
        att = jax.nn.sigmoid(att).reshape(b, q, v * th * tw)
        exclude = att < 0.5  # True = do not attend
        exclude = jax.lax.stop_gradient(exclude)
        return mask_logits, exclude


class DecoderLayer(nn.Module):
    """reference :915-1162 (post-norm variant, config.pre_norm=False)."""

    cfg: Mask2formerCfg
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden,
        level_feat,
        level_pos,
        query_pos,
        exclude_mask,
        lang_input: bool = False,
    ):
        c = self.cfg
        residual = hidden
        attn = MultiheadAttention(
            c.num_attention_heads, dtype=self.dtype, name="cross_attn"
        )(hidden + query_pos, level_feat + level_pos, level_feat, exclude_mask)
        hidden = residual + attn
        hidden = nn.LayerNorm(epsilon=1e-5, name="cross_attn_layer_norm")(hidden)

        if not lang_input:
            residual = hidden
            attn = SelfAttention(
                c.num_attention_heads, dtype=self.dtype, name="self_attn"
            )(hidden, query_pos)
            hidden = residual + attn
            hidden = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(hidden)

        residual = hidden
        hidden = nn.relu(nn.Dense(c.dim_feedforward, dtype=self.dtype, name="fc1")(hidden))
        hidden = nn.Dense(c.hidden_dim, dtype=self.dtype, name="fc2")(hidden)
        hidden = residual + hidden
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(hidden)


class VideoMask2FormerTransformerModule(nn.Module):
    """reference :1483-1575 + :1165-1360 (decoder loop)."""

    cfg: Mask2formerCfg
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        multi_scale_features: List[jax.Array],
        mask_features: jax.Array,
        lang_input: bool = False,
    ):
        """multi_scale_features: 3 x [B, V, h, w, 256] (1/32, 1/16, 1/8);
        mask_features [B, V, H/4, W/4, 256].

        Returns dict with ``intermediate`` (10 x [B, Q, C] layernormed
        states), ``mask_logits`` (10 x [B, Q, V, H/4, W/4]), and
        ``last_hidden_state`` [B, Q, C]."""
        c = self.cfg
        b, v = mask_features.shape[0], mask_features.shape[1]
        d = c.hidden_dim

        level_feats, level_pos, size_list = [], [], []
        level_embed = nn.Embed(3, d, name="level_embed")
        for i in range(3):
            f = multi_scale_features[i]
            hh, ww = f.shape[2], f.shape[3]
            size_list.append((hh, ww))
            pos = sine_pos_embed_3d(v, hh, ww, d // 2).astype(f.dtype)
            level_pos.append(pos.reshape(1, v * hh * ww, d))
            feat = f.reshape(b, v * hh * ww, d) + level_embed(jnp.array(i))
            level_feats.append(feat)

        queries_features = nn.Embed(c.num_queries, d, name="queries_features")
        queries_embedder = nn.Embed(c.num_queries, d, name="queries_embedder")
        hidden = jnp.broadcast_to(
            queries_features.embedding[None], (b, c.num_queries, d)
        ).astype(self.dtype)
        query_pos = jnp.broadcast_to(
            queries_embedder.embedding[None], (b, c.num_queries, d)
        ).astype(self.dtype)

        layernorm = nn.LayerNorm(epsilon=1e-5, name="layernorm")
        mask_predictor = MaskPredictor(c, dtype=self.dtype, name="mask_predictor")

        intermediate = []
        mask_logits_all = []

        inter = layernorm(hidden)
        intermediate.append(inter)
        pred_mask, exclude = mask_predictor(inter, mask_features, size_list[0])
        mask_logits_all.append(pred_mask)

        num_layers = c.decoder_layers - 1
        for idx in range(num_layers):
            level_index = idx % 3
            # rows that exclude everything attend everywhere instead
            # (reference :1306-1308)
            all_excluded = exclude.all(axis=-1, keepdims=True)
            exclude = jnp.where(all_excluded, False, exclude)
            hidden = DecoderLayer(c, dtype=self.dtype, name=f"layers_{idx}")(
                hidden,
                level_feats[level_index],
                level_pos[level_index],
                query_pos,
                exclude,
                lang_input=lang_input,
            )
            inter = layernorm(hidden)
            intermediate.append(inter)
            pred_mask, exclude = mask_predictor(
                inter, mask_features, size_list[(idx + 1) % 3]
            )
            mask_logits_all.append(pred_mask)

        return {
            "intermediate": intermediate,
            "mask_logits": mask_logits_all,
            "last_hidden_state": hidden,
        }
