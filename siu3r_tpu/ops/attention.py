"""Multi-head attention for the ViT/CroCo stack.

Two execution paths with identical semantics:
  * ``xla``  — plain jnp einsum attention; XLA fuses this well for the short
    (≈257-token) sequences of the backbone, and it runs anywhere.
  * ``pallas`` — fused flash-attention TPU kernel (ops/flash_attention.py)
    with optional fused RoPE2D rotation of q/k.

The reference computes naive softmax(QK^T)V in fp32
(src/models/croco/blocks.py:105-111, 162-167); both paths reproduce that
numerics contract (accumulation in fp32 regardless of input dtype).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = "auto"  # "auto" | "xla" | "pallas"


def set_attention_backend(name: str) -> None:
    global _BACKEND
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(name)
    _BACKEND = name


def _use_pallas() -> bool:
    if _BACKEND == "pallas":
        return True
    if _BACKEND == "xla":
        return False
    return jax.default_backend() == "tpu"


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    kv_mask: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """softmax(q k^T * scale) v over [B, H, N, D] tensors.

    kv_mask: optional [B, Nk] bool, True = attendable.
    mask: optional [B, Nq, Nk] (or broadcastable) bool per-query mask.
    Accumulates in fp32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if _use_pallas() and mask is None:
        from siu3r_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, kv_mask=kv_mask)
    return xla_attention(q, k, v, scale=scale, kv_mask=kv_mask, mask=mask)


def rope_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    qpos: jax.Array,
    kpos: jax.Array,
    rope_base: float = 100.0,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """RoPE2D + attention; on TPU the rotation fuses into the attention
    kernel (one kernel replaces the reference's cuRoPE2D + naive attention
    pipeline). Masked attention falls back to the XLA path."""
    from siu3r_tpu.ops.rope import rope2d

    scale = q.shape[-1] ** -0.5
    if _use_pallas() and mask is None:
        from siu3r_tpu.ops.flash_attention import flash_attention_rope

        return flash_attention_rope(q, k, v, qpos, kpos, scale, rope_base)
    q = rope2d(q, qpos, base=rope_base)
    k = rope2d(k, kpos, base=rope_base)
    return xla_attention(q, k, v, scale, mask=mask)


def xla_attention(q, k, v, scale, kv_mask=None, mask=None):
    out_dtype = q.dtype
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, -1e30)
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None]
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(out_dtype)
