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
        return _flash_diff(q, k, v, kv_mask, scale)
    return xla_attention(q, k, v, scale=scale, kv_mask=kv_mask, mask=mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_diff(q, k, v, kv_mask, scale):
    """Pallas flash-attention forward with the XLA twin as backward — the
    kernel itself is forward-only (round-2 fix: training on real TPU hit
    'Linearization failed' through pallas_call; CPU tests never saw it
    because they take the XLA path)."""
    from siu3r_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, scale=scale, kv_mask=kv_mask)


def _flash_diff_fwd(q, k, v, kv_mask, scale):
    return _flash_diff(q, k, v, kv_mask, scale), (q, k, v, kv_mask)


def _flash_diff_bwd(scale, res, g):
    q, k, v, kv_mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: xla_attention(q_, k_, v_, scale, kv_mask=kv_mask),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_rope_diff(q, k, v, qpos, kpos, scale, rope_base):
    """Fused RoPE flash attention forward; backward via the XLA twin
    (rope2d + naive attention — the reference's exact backward math)."""
    from siu3r_tpu.ops.flash_attention import flash_attention_rope

    return flash_attention_rope(q, k, v, qpos, kpos, scale, rope_base)


def _flash_rope_diff_fwd(q, k, v, qpos, kpos, scale, rope_base):
    return _flash_rope_diff(q, k, v, qpos, kpos, scale, rope_base), (
        q, k, v, qpos, kpos,
    )


def _flash_rope_diff_bwd(scale, rope_base, res, g):
    from siu3r_tpu.ops.rope import rope2d

    q, k, v, qpos, kpos = res

    def ref(q_, k_, v_):
        qr = rope2d(q_, qpos, base=rope_base)
        kr = rope2d(k_, kpos, base=rope_base)
        return xla_attention(qr, kr, v_, scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_rope_diff.defvjp(_flash_rope_diff_fwd, _flash_rope_diff_bwd)


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
        return _flash_rope_diff(q, k, v, qpos, kpos, scale, rope_base)
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
