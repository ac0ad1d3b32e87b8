"""Video Mask2Former pixel decoder (multi-scale deformable encoder + FPN).

Mirrors reference src/models/mask2former/video_seg_decoder.py:1617-2196:
  * 3 input projections (1x1 conv + GroupNorm32) on the 1/32, 1/16, 1/8
    adapter levels (processed high-to-low resolution order: features
    reversed);
  * 6 deformable-attention encoder layers (8 heads, 4 points, 3 levels,
    ffw 1024) over the concatenated level tokens;
  * one extra FPN level at 1/4 (lateral 1x1+GN, out 3x3+GN+ReLU);
  * 1x1 ``mask_projection`` producing mask features at 1/4.

Frames (views) ride the batch axis through the whole module, exactly like
the reference's (batch*nframe) flattening (:2090-2092). All maps NHWC.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from siu3r_tpu.config import Mask2formerCfg
from siu3r_tpu.models.layers import bilinear_resize_torch
from siu3r_tpu.models.mask2former.position import sine_pos_embed_2d
from siu3r_tpu.ops.deformable import (
    multi_scale_deformable_attention,
    reference_points_for_shapes,
)


class _InputProjection(nn.Module):
    features: int
    use_bias: bool = True  # FPN lateral convs are bias-free (reference :2035)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="conv"
        )(x)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm")(x)


class _DeformableEncoderLayer(nn.Module):
    """reference :1725-1821"""

    cfg: Mask2formerCfg
    spatial_shapes: Sequence[Tuple[int, int]]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, pos_embed, reference_points):
        c = self.cfg
        d = c.feature_size
        heads = c.num_attention_heads
        n_levels = len(self.spatial_shapes)
        n_points = 4
        residual = hidden
        query = hidden + pos_embed
        b, lq, _ = query.shape
        value = nn.Dense(d, dtype=self.dtype, name="value_proj")(hidden)
        value = value.reshape(b, lq, heads, d // heads)
        offsets = nn.Dense(
            heads * n_levels * n_points * 2, dtype=self.dtype, name="sampling_offsets"
        )(query).reshape(b, lq, heads, n_levels, n_points, 2)
        weights = nn.Dense(
            heads * n_levels * n_points, dtype=self.dtype, name="attention_weights"
        )(query).reshape(b, lq, heads, n_levels * n_points)
        weights = jax.nn.softmax(weights, axis=-1).reshape(
            b, lq, heads, n_levels, n_points
        )
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in self.spatial_shapes], dtype=jnp.float32
        )
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        attn = multi_scale_deformable_attention(
            value, self.spatial_shapes, locations, weights
        )
        attn = nn.Dense(d, dtype=self.dtype, name="output_proj")(attn)
        hidden = residual + attn
        hidden = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(hidden)
        residual = hidden
        hidden = nn.relu(nn.Dense(c.encoder_feedforward_dim, dtype=self.dtype, name="fc1")(hidden))
        hidden = nn.Dense(d, dtype=self.dtype, name="fc2")(hidden)
        hidden = residual + hidden
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(hidden)


class VideoMask2FormerPixelDecoder(nn.Module):
    cfg: Mask2formerCfg
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[jax.Array]):
        """features: 4 levels [B, V, H_l, W_l, C_in], resolution high->low
        (1/4, 1/8, 1/16, 1/32). Returns (multi_scale_features
        [3 x [B, V, h, w, 256]] low->high res (1/32, 1/16, 1/8),
        mask_features [B, V, H/4, W/4, 256])."""
        c = self.cfg
        d = c.feature_size
        b, v = features[0].shape[0], features[0].shape[1]
        flat = [f.reshape((b * v,) + f.shape[2:]) for f in features]

        # top 3 levels, processed low-res last in reference order:
        # features[::-1][:3] = [1/32, 1/16, 1/8]
        levels = [flat[3], flat[2], flat[1]]
        embeds, pos_embeds, shapes = [], [], []
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, d)
        )
        for i, x in enumerate(levels):
            e = _InputProjection(d, dtype=self.dtype, name=f"input_projections_{i}")(x)
            hh, ww = e.shape[1], e.shape[2]
            shapes.append((hh, ww))
            embeds.append(e.reshape(b * v, hh * ww, d))
            pe = sine_pos_embed_2d(hh, ww, d // 2).reshape(1, hh * ww, d)
            pos_embeds.append(pe + level_embed[i])

        tokens = jnp.concatenate(embeds, axis=1)
        pos = jnp.concatenate(pos_embeds, axis=1).astype(tokens.dtype)
        ref = reference_points_for_shapes(shapes)  # [1, sum, 1, 2]
        ref = jnp.broadcast_to(
            ref, (1, ref.shape[1], len(shapes), 2)
        )  # valid_ratios = 1 -> same point per level (reference :1847-1881)

        hidden = tokens
        for i in range(c.encoder_layers):
            hidden = _DeformableEncoderLayer(
                c, tuple(shapes), dtype=self.dtype, name=f"encoder_layers_{i}"
            )(hidden, pos, ref)

        outputs = []
        startp = 0
        for (hh, ww) in shapes:
            outputs.append(hidden[:, startp : startp + hh * ww].reshape(b * v, hh, ww, d))
            startp += hh * ww

        # FPN extra level at 1/4 (reference :2026-2059, :2166-2180)
        lateral = _InputProjection(d, use_bias=False, dtype=self.dtype, name="adapter_1")(flat[0])
        up = bilinear_resize_torch(
            outputs[-1], (lateral.shape[1], lateral.shape[2]), align_corners=False
        )
        out = lateral + up
        out = nn.Conv(d, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="layer_1_conv")(out)
        out = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="layer_1_norm")(out)
        out = nn.relu(out)
        outputs.append(out)

        mask_features = nn.Conv(
            c.mask_feature_size, (1, 1), dtype=self.dtype, name="mask_projection"
        )(outputs[-1])

        unflat = lambda x: x.reshape((b, v) + x.shape[1:])
        multi_scale = [unflat(o) for o in outputs[:3]]
        return multi_scale, unflat(mask_features)
