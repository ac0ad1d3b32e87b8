"""CroCo ViT-Adapter: injects a conv pyramid into the frozen ViT stream and
returns 4-scale (1/4, 1/8, 1/16, 1/32) features for segmentation.

Mirrors reference src/models/vit_adapter/vit_adapter.py:
  * SpatialPriorModule conv stem (:200-302);
  * 4 InteractionBlock_Efficient at ViT blocks [5, 11, 17, 23], each a
    deformable-attention Extractor (queries = pyramid tokens, keys = ViT
    tokens) + ConvFFN with depthwise conv (:62-197);
  * transposed-conv upsample to 1/4, per-level BatchNorm (SyncBN in torch —
    here flax BatchNorm with a cross-replica axis when training) (:356-360).

All tensors NHWC; pyramid tokens are [B, N, C] with N = 21*n (16n @1/8,
4n @1/16, n @1/32).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from siu3r_tpu.models.layers import ConvTranspose2dTorch, bilinear_resize_torch
from siu3r_tpu.ops.deformable import (
    multi_scale_deformable_attention,
    reference_points_for_shapes,
)

LayerNorm6 = lambda name=None: nn.LayerNorm(epsilon=1e-6, name=name)


class BatchNorm(nn.Module):
    """torch-compatible BatchNorm2d over NHWC (momentum 0.1, eps 1e-5).
    ``axis_name`` enables cross-replica (SyncBN) statistics in training."""

    features: int
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            name="bn",
        )(x)


class _ConvBN(nn.Module):
    features: int
    stride: int = 1
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = BatchNorm(self.features, axis_name=self.axis_name, name="norm")(x, train)
        return nn.relu(x)


class SpatialPriorModule(nn.Module):
    """reference vit_adapter.py:200-302"""

    inplanes: int = 64
    embed_dim: int = 1024
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = _ConvBN(self.inplanes, 2, self.axis_name, self.dtype, name="stem1")(x, train)
        c1 = _ConvBN(self.inplanes, 1, self.axis_name, self.dtype, name="stem2")(c1, train)
        c1 = _ConvBN(self.inplanes, 1, self.axis_name, self.dtype, name="stem3")(c1, train)
        c1 = nn.max_pool(c1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        c2 = _ConvBN(2 * self.inplanes, 2, self.axis_name, self.dtype, name="conv2")(c1, train)
        c3 = _ConvBN(4 * self.inplanes, 2, self.axis_name, self.dtype, name="conv3")(c2, train)
        c4 = _ConvBN(4 * self.inplanes, 2, self.axis_name, self.dtype, name="conv4")(c3, train)
        c1 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="fc1")(c1)
        c2 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="fc2")(c2)
        c3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="fc3")(c3)
        c4 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="fc4")(c4)
        return c1, c2, c3, c4


class MSDeformAttn(nn.Module):
    """reference vit_adapter/blocks.py:87-213 (grid_sample core)."""

    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, value_flat, spatial_shapes):
        """query [B, Lq, C]; reference_points [1orB, Lq, n_levels, 2];
        value_flat [B, Len_in, C]; spatial_shapes static list of (H, W)."""
        b, lq, _ = query.shape
        len_in = value_flat.shape[1]
        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value_flat)
        value = value.reshape(b, len_in, self.n_heads, self.d_model // self.n_heads)
        offsets = nn.Dense(
            self.n_heads * self.n_levels * self.n_points * 2,
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(b, lq, self.n_heads, self.n_levels, self.n_points, 2)
        weights = nn.Dense(
            self.n_heads * self.n_levels * self.n_points,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(b, lq, self.n_heads, self.n_levels * self.n_points)
        weights = jax.nn.softmax(weights, axis=-1).reshape(
            b, lq, self.n_heads, self.n_levels, self.n_points
        )
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], dtype=jnp.float32
        )  # [L, 2] (x, y)
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        out = multi_scale_deformable_attention(value, spatial_shapes, locations, weights)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)


class DWConv(nn.Module):
    """Depthwise 3x3 over the 3 pyramid sub-resolutions
    (reference vit_adapter.py:16-31)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h16: int, w16: int):
        b, n, c = x.shape
        n1 = n // 21
        conv = nn.Conv(
            self.dim,
            (3, 3),
            padding=1,
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )
        x1 = conv(x[:, : 16 * n1].reshape(b, h16 * 2, w16 * 2, c)).reshape(b, 16 * n1, c)
        x2 = conv(x[:, 16 * n1 : 20 * n1].reshape(b, h16, w16, c)).reshape(b, 4 * n1, c)
        x3 = conv(x[:, 20 * n1 :].reshape(b, h16 // 2, w16 // 2, c)).reshape(b, n1, c)
        return jnp.concatenate([x1, x2, x3], axis=1)


class ConvFFN(nn.Module):
    """reference vit_adapter.py:34-59"""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h16: int, w16: int):
        out_features = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = DWConv(self.hidden, dtype=self.dtype, name="dwconv")(x, h16, w16)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(out_features, dtype=self.dtype, name="fc2")(x)
        return x


class Extractor(nn.Module):
    """reference vit_adapter.py:62-121"""

    dim: int
    num_heads: int
    n_points: int
    cffn_ratio: float = 0.25
    with_cffn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, feat, spatial_shapes, h16, w16):
        attn = MSDeformAttn(
            self.dim, 1, self.num_heads, self.n_points, dtype=self.dtype, name="attn"
        )(
            LayerNorm6(name="query_norm")(query),
            reference_points,
            LayerNorm6(name="feat_norm")(feat),
            spatial_shapes,
        )
        query = query + attn
        if self.with_cffn:
            query = query + ConvFFN(
                int(self.dim * self.cffn_ratio), dtype=self.dtype, name="ffn"
            )(LayerNorm6(name="ffn_norm")(query), h16, w16)
        return query


class InteractionBlock(nn.Module):
    """InteractionBlock_Efficient (reference vit_adapter.py:124-197):
    extractor(s) pulling ViT features into the pyramid."""

    dim: int
    num_heads: int
    n_points: int
    extra_extractor: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, ref_points, spatial_shapes, h16, w16):
        c = Extractor(
            self.dim, self.num_heads, self.n_points, dtype=self.dtype, name="extractor"
        )(c, ref_points, x, spatial_shapes, h16, w16)
        if self.extra_extractor:
            for i in range(2):
                c = Extractor(
                    self.dim,
                    self.num_heads,
                    self.n_points,
                    dtype=self.dtype,
                    name=f"extra_extractors_{i}",
                )(c, ref_points, x, spatial_shapes, h16, w16)
        return c


class CroCoViTAdapter(nn.Module):
    """reference vit_adapter.py:305-441"""

    num_block: int = 24
    embed_dim: int = 1024
    patch_size: int = 16
    conv_inplane: int = 64
    n_points: int = 4
    deform_num_heads: int = 16
    interaction_indexes: Sequence[int] = (5, 11, 17, 23)
    add_vit_feature: bool = True
    use_extra_extractor: bool = True
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, image: jax.Array, all_feat: List[jax.Array], train: bool = False
    ) -> List[jax.Array]:
        """image [B, H, W, 3]; all_feat: 24 x [B, N, C] ViT block outputs
        (intrinsic token already stripped). Returns 4 NHWC maps at
        1/4, 1/8, 1/16, 1/32, all ``embed_dim`` channels."""
        b, h, w, _ = image.shape
        h16, w16 = h // self.patch_size, w // self.patch_size
        shapes_query = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
        shapes_feat = [(h16, w16)]
        ref_query = reference_points_for_shapes(shapes_query)  # queries sample ViT map
        # reference deform_inputs (vit_adapter/blocks.py:27-51): extractor
        # queries are the pyramid tokens, sampling from the single ViT level
        ref_query = ref_query  # [1, 21n, 1, 2]

        c1, c2, c3, c4 = SpatialPriorModule(
            self.conv_inplane, self.embed_dim, self.axis_name, self.dtype, name="spm"
        )(image, train)
        n2 = c2.shape[1] * c2.shape[2]
        n3 = c3.shape[1] * c3.shape[2]
        n4 = c4.shape[1] * c4.shape[2]
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, self.embed_dim)
        )
        c2f = c2.reshape(b, n2, self.embed_dim) + level_embed[0]
        c3f = c3.reshape(b, n3, self.embed_dim) + level_embed[1]
        c4f = c4.reshape(b, n4, self.embed_dim) + level_embed[2]
        c = jnp.concatenate([c2f, c3f, c4f], axis=1)

        outs = []
        for i, idx in enumerate(self.interaction_indexes):
            x = all_feat[idx]
            c = InteractionBlock(
                self.embed_dim,
                self.deform_num_heads,
                self.n_points,
                extra_extractor=(
                    self.use_extra_extractor and i == len(self.interaction_indexes) - 1
                ),
                dtype=self.dtype,
                name=f"interactions_{i}",
            )(x, c, ref_query, shapes_feat, h16, w16)
            outs.append(x.reshape(b, h16, w16, self.embed_dim))

        c2o = c[:, :n2].reshape(b, h // 8, w // 8, self.embed_dim)
        c3o = c[:, n2 : n2 + n3].reshape(b, h16, w16, self.embed_dim)
        c4o = c[:, n2 + n3 :].reshape(b, h // 32, w // 32, self.embed_dim)
        c1o = ConvTranspose2dTorch(self.embed_dim, 2, 2, dtype=self.dtype, name="up")(c2o) + c1

        if self.add_vit_feature:
            x1, x2, x3, x4 = outs
            rs = lambda t, hh, ww: bilinear_resize_torch(t, (hh, ww), align_corners=False)
            c1o = c1o + rs(x1, h // 4, w // 4)
            c2o = c2o + rs(x2, h // 8, w // 8)
            c3o = c3o + x3
            c4o = c4o + rs(x4, h // 32, w // 32)

        f1 = BatchNorm(self.embed_dim, self.axis_name, name="norm1")(c1o, train)
        f2 = BatchNorm(self.embed_dim, self.axis_name, name="norm2")(c2o, train)
        f3 = BatchNorm(self.embed_dim, self.axis_name, name="norm3")(c3o, train)
        f4 = BatchNorm(self.embed_dim, self.axis_name, name="norm4")(c4o, train)
        return [f1, f2, f3, f4]
