"""Transformer building blocks for the CroCo backbone (flax.linen).

Semantics follow reference src/models/croco/blocks.py: pre-norm ViT blocks
with RoPE2D applied to q/k inside attention, fp32 softmax. Parameter names
mirror the torch module names so checkpoint conversion is a mechanical
key-mapping (see siu3r_tpu/checkpoint.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from siu3r_tpu.ops.attention import multi_head_attention, rope_attention
from siu3r_tpu.ops.rope import rope2d

LayerNorm = lambda name=None: nn.LayerNorm(epsilon=1e-6, name=name)


class Mlp(nn.Module):
    """reference croco/blocks.py:58-79"""

    hidden_features: int
    out_features: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(out_features, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Self-attention with RoPE2D (reference croco/blocks.py:81-112)."""

    num_heads: int
    rope_base: Optional[float] = 100.0
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, xpos):
        b, n, c = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, c // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [b, h, n, d]
        if self.rope_base is not None:
            out = rope_attention(q, k, v, xpos, xpos, rope_base=self.rope_base)
        else:
            out = multi_head_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """reference croco/blocks.py:132-169"""

    num_heads: int
    rope_base: Optional[float] = 100.0
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, qpos, kpos, mask=None):
        b, nq, c = query.shape
        nk = key.shape[1]
        h = self.num_heads
        d = c // h
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="projq")(query)
        k = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="projk")(key)
        v = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="projv")(value)
        q = q.reshape(b, nq, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, h, d).transpose(0, 2, 1, 3)
        if self.rope_base is not None:
            out = rope_attention(
                q, k, v, qpos, kpos, rope_base=self.rope_base, mask=mask
            )
        else:
            out = multi_head_attention(q, k, v, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Encoder block (reference croco/blocks.py:114-130)."""

    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: Optional[float] = 100.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, xpos):
        c = x.shape[-1]
        y = LayerNorm(name="norm1")(x)
        x = x + Attention(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="attn"
        )(y, xpos)
        y = LayerNorm(name="norm2")(x)
        x = x + Mlp(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        return x


class DecoderBlock(nn.Module):
    """Self-attn + cross-attn + MLP (reference croco/blocks.py:171-191)."""

    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: Optional[float] = 100.0
    norm_mem: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, xpos, ypos, cross_mask=None):
        c = x.shape[-1]
        x = x + Attention(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="attn"
        )(LayerNorm(name="norm1")(x), xpos)
        y_ = LayerNorm(name="norm_y")(y) if self.norm_mem else y
        x = x + CrossAttention(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="cross_attn"
        )(LayerNorm(name="norm2")(x), y_, y_, xpos, ypos, mask=cross_mask)
        x = x + Mlp(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            LayerNorm(name="norm3")(x)
        )
        return x, y


def token_positions(h: int, w: int) -> jnp.ndarray:
    """Integer (y, x) position of each patch token, row-major
    (reference croco/blocks.py:195-207 PositionGetter)."""
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # [h*w, 2]


class PatchEmbed(nn.Module):
    """Conv16x16/s16 patchifier (reference croco/blocks.py:209-241,
    PatchEmbedDust3R patch_embed.py:19-29)."""

    patch_size: int = 16
    embed_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: [B, H, W, 3] (NHWC) -> tokens [B, N, C], pos [B, N, 2]."""
        b, h, w, _ = images.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0, f"image {h}x{w} not divisible by {p}"
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(images)
        gh, gw = h // p, w // p
        x = x.reshape(b, gh * gw, self.embed_dim)
        pos = jnp.broadcast_to(token_positions(gh, gw)[None], (b, gh * gw, 2))
        return x, pos


def conv_transpose_torch(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    stride: int,
) -> jax.Array:
    """2D transposed convolution with PyTorch ConvTranspose2d semantics.

    x: [B, H, W, Cin] (NHWC); kernel: [kh, kw, Cout, Cin] (torch layout
    [Cin, Cout, kh, kw] transposed to spatial-first); padding assumed 0.
    Implemented as input-dilated conv with spatially-flipped kernel — the
    exact gradient-of-conv definition torch uses.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = kernel[::-1, ::-1]  # [kh, kw, Cout, Cin]
    # conv_general_dilated wants [kh, kw, Cin, Cout]
    rhs = flipped.transpose(0, 1, 3, 2)
    out = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out


class ConvTranspose2dTorch(nn.Module):
    """ConvTranspose2d(features, k, stride) with torch semantics & layout."""

    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.features, in_features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv_transpose_torch(
            x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype), self.stride
        )


def bilinear_resize_torch(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear resize on NHWC matching torch.nn.functional.interpolate
    (antialias=False — torch never low-pass-filters on downscale, unlike
    jax.image.resize, so this is a direct gather-based resampler).

    align_corners=False: src = (dst + 0.5) * (in/out) - 0.5 (half-pixel).
    align_corners=True: src = dst * (in-1)/(out-1).
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x

    def grid(src, dst):
        if align_corners:
            if dst == 1:
                return jnp.zeros((1,), jnp.float32)
            return jnp.arange(dst, dtype=jnp.float32) * (src - 1) / (dst - 1)
        pos = (jnp.arange(dst, dtype=jnp.float32) + 0.5) * (src / dst) - 0.5
        return jnp.clip(pos, 0.0, src - 1)

    ys = grid(h, oh)
    xs = grid(w, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]
    g00 = x[:, y0][:, :, x0]
    g01 = x[:, y0][:, :, x1]
    g10 = x[:, y1][:, :, x0]
    g11 = x[:, y1][:, :, x1]
    top = g00 * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)
