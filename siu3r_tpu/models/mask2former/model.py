"""Top-level video Mask2Former (reference video_seg_decoder.py:2199-2477).

Composes the pixel decoder and masked-attention transformer module, applies
the class predictor to every intermediate decoder state, and (for
text-referred segmentation) runs 6 language cross-attention layers matching
word embeddings against the object queries (:2400-2443).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from siu3r_tpu.config import Mask2formerCfg
from siu3r_tpu.models.mask2former.decoder import (
    MultiheadAttention,
    VideoMask2FormerTransformerModule,
)
from siu3r_tpu.models.mask2former.pixel_decoder import VideoMask2FormerPixelDecoder


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SegOutput:
    """reference VideoMask2FormerForVideoSegmentationOutput (:80-87)."""

    class_queries_logits: jax.Array  # [B, Q, num_labels+1]
    masks_queries_logits: jax.Array  # [B, Q, V, H/4, W/4]
    aux_class_logits: List[jax.Array]  # per intermediate layer (incl. final)
    aux_mask_logits: List[jax.Array]
    last_hidden_state: jax.Array  # [B, Q, C]
    word_logits: Optional[jax.Array] = None  # [B, n_words, Q] refer-seg


class VideoMask2Former(nn.Module):
    cfg: Mask2formerCfg
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        multi_scale_feat: List[jax.Array],
        word_embeddings: Optional[jax.Array] = None,
    ) -> SegOutput:
        """multi_scale_feat: 4 levels [B, V, H_l, W_l, 1024] (1/4..1/32).
        word_embeddings: optional [B, n_words, C] text features."""
        c = self.cfg
        multi_scale, mask_features = VideoMask2FormerPixelDecoder(
            c, dtype=self.dtype, name="pixel_decoder"
        )(multi_scale_feat)
        # lang_input stays False even in refer mode: the reference's
        # top-level forward never forwards word_embeddings into self.model
        # (video_seg_decoder.py:2375-2380 calls it without the argument), so
        # its decoder skip-self-attn lang path (:992, :1572) is DEAD CODE —
        # the released refer behavior runs the decoder normally and applies
        # the 6 lang cross-attn layers afterwards (:2400-2443). Verified by
        # f64 oracle comparison (tests/test_torch_parity_lang.py).
        dec = VideoMask2FormerTransformerModule(
            c, dtype=self.dtype, name="transformer_module"
        )(multi_scale, mask_features, lang_input=False)

        class_predictor = nn.Dense(
            c.num_labels + 1, dtype=self.dtype, name="class_predictor"
        )
        class_logits = [class_predictor(s) for s in dec["intermediate"]]
        mask_logits = dec["mask_logits"]

        word_logits = None
        if word_embeddings is not None:
            obj_queries = dec["last_hidden_state"]  # [B, Q, C]
            hs = word_embeddings
            for li in range(6):
                residual = hs
                attn = MultiheadAttention(
                    c.num_attention_heads, dtype=self.dtype, name=f"lang_cross_attns_{li}"
                )(hs, obj_queries, obj_queries)
                hs = nn.LayerNorm(epsilon=1e-5, name=f"lang_attn_norms_{li}")(residual + attn)
                residual = hs
                hs = nn.relu(nn.Dense(c.hidden_dim, dtype=self.dtype, name=f"lang_fc1s_{li}")(hs))
                hs = nn.Dense(c.hidden_dim, dtype=self.dtype, name=f"lang_fc2s_{li}")(hs)
                hs = nn.LayerNorm(epsilon=1e-5, name=f"lang_attn_norms_final_{li}")(residual + hs)
            # dot-product similarity words x queries (reference :2431-2443)
            word_logits = jnp.einsum("bwc,bqc->bwq", hs, obj_queries)

        return SegOutput(
            class_queries_logits=class_logits[-1],
            masks_queries_logits=mask_logits[-1],
            aux_class_logits=class_logits,
            aux_mask_logits=mask_logits,
            last_hidden_state=dec["last_hidden_state"],
            word_logits=word_logits,
        )
