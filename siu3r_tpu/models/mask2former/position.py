"""Sine position embeddings for the video Mask2Former.

2D variant: reference video_seg_decoder.py:683-735 (pixel decoder keys).
3D (t, y, x) variant: reference video_seg_decoder.py:607-679 (transformer
module keys; the frame axis adds a z-term shared across y/x channels).
Both use normalize=True with scale 2*pi. Outputs are NHWC / [B, T, H, W, C].
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _dim_t(num_pos_feats: int, temperature: float = 10000.0) -> jnp.ndarray:
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    return temperature ** (2 * jnp.floor(i / 2) / num_pos_feats)


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """pos [..., D] -> [..., D] with sin on even dims, cos on odd dims,
    interleaved as stack(sin(0::2), cos(1::2)).flatten."""
    sin = jnp.sin(pos[..., 0::2])
    cos = jnp.cos(pos[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(pos.shape)


def sine_pos_embed_2d(
    h: int, w: int, num_pos_feats: int = 128, temperature: float = 10000.0
) -> jnp.ndarray:
    """[H, W, 2*num_pos_feats] = concat(y-embed, x-embed)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]  # cumsum of ones
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_y = _interleave_sin_cos(jnp.broadcast_to(y[..., None], (h, w, num_pos_feats)) / dim_t * 1.0)
    pos_x = _interleave_sin_cos(jnp.broadcast_to(x[..., None], (h, w, num_pos_feats)) / dim_t * 1.0)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine_pos_embed_3d(
    t: int, h: int, w: int, num_pos_feats: int = 128, temperature: float = 10000.0
) -> jnp.ndarray:
    """[T, H, W, 2*num_pos_feats]: concat(y, x) + z broadcast
    (reference :628-679)."""
    scale = 2 * math.pi
    eps = 1e-6
    yx = sine_pos_embed_2d(h, w, num_pos_feats, temperature)  # [H, W, 2D]
    z = jnp.arange(1, t + 1, dtype=jnp.float32) / (t + eps) * scale
    dim_t_z = _dim_t(2 * num_pos_feats, temperature)
    pos_z = _interleave_sin_cos(z[:, None] / dim_t_z)  # [T, 2D]
    return yx[None] + pos_z[:, None, None, :]
