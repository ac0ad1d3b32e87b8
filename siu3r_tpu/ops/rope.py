"""2D rotary position embedding (RoPE2D).

Semantics match the reference (src/models/croco/pos_embed.py:126-179 slow
path, src/models/croco/curope/kernels.cu:39-81 CUDA path): the head dim D is
split in half; the first half is rotated by the token's y position, the second
half by its x position. Each half uses GPT-NeoX-style rotation with
``D/4`` frequencies ``base**(-2i/(D/2))``.

In JAX this is a pure function (no in-place trick needed); the backward pass
is automatic (and equals applying the rotation with negated angle, as the
reference's custom autograd does — curope2d.py:24-29). The TPU flash-attention
kernel fuses this rotation into the q/k tiles; this module is the reference
implementation used for parity tests and the XLA fallback path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope2d_cos_sin(positions: jax.Array, head_dim: int, base: float = 100.0):
    """Precompute per-token cos/sin tables.

    Args:
      positions: [B, N, 2] integer (y, x) token positions.
      head_dim: per-head feature dim D (must be divisible by 4).
    Returns:
      cos, sin: each [B, N, D] — per-feature rotation factors laid out so that
      ``out = tokens * cos + rotate_half2(tokens) * sin``.
    """
    if head_dim % 4 != 0:
        raise ValueError(f"head_dim must be divisible by 4, got {head_dim}")
    half = head_dim // 2  # features rotated by each of (y, x)
    quarter = half // 2  # distinct frequencies per half
    # inv_freq[i] = base ** (-(2i)/half), i in [0, quarter)
    inv_freq = 1.0 / (base ** (jnp.arange(0, half, 2, dtype=jnp.float32) / half))
    pos = positions.astype(jnp.float32)  # [B, N, 2]
    freqs = pos[..., None] * inv_freq  # [B, N, 2, quarter]
    freqs = jnp.concatenate([freqs, freqs], axis=-1)  # [B, N, 2, half]
    y_f, x_f = freqs[..., 0, :], freqs[..., 1, :]
    angles = jnp.concatenate([y_f, x_f], axis=-1)  # [B, N, D]
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half2(x: jax.Array) -> jax.Array:
    """rotate_half applied independently to the y-half and the x-half."""
    d = x.shape[-1]
    half = d // 2
    quarter = half // 2
    y1 = x[..., :quarter]
    y2 = x[..., quarter:half]
    x1 = x[..., half : half + quarter]
    x2 = x[..., half + quarter :]
    return jnp.concatenate([-y2, y1, -x2, x1], axis=-1)


def rope2d(
    tokens: jax.Array, positions: jax.Array, base: float = 100.0
) -> jax.Array:
    """Apply 2D RoPE.

    Args:
      tokens: [B, H, N, D] (heads axis second, as in the reference).
      positions: [B, N, 2] int (y, x).
    Returns:
      rotated tokens, same shape/dtype.
    """
    d = tokens.shape[-1]
    cos, sin = rope2d_cos_sin(positions, d, base=base)
    cos = cos[:, None, :, :].astype(tokens.dtype)
    sin = sin[:, None, :, :].astype(tokens.dtype)
    return tokens * cos + _rotate_half2(tokens) * sin


def rope2d_from_cos_sin(tokens: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply with precomputed tables (cos/sin [B, N, D]; tokens [B, H, N, D])."""
    cos = cos[:, None, :, :].astype(tokens.dtype)
    sin = sin[:, None, :, :].astype(tokens.dtype)
    return tokens * cos + _rotate_half2(tokens) * sin
