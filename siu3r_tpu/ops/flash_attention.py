"""Fused attention TPU kernel (Pallas).

One kernel computes softmax(q k^T * scale) v without materializing the
[Nq, Nk] attention matrix in HBM. For the backbone's sequence lengths
(L = 257 tokens two-view; up to V*L ≈ 2k multi-view) the whole K/V block for
one (batch, head) fits VMEM, so a single-pass kernel with fp32 softmax is
bandwidth-optimal — no online-softmax streaming needed. Replaces the
reference's naive matmul+softmax attention (src/models/croco/blocks.py:105-111)
and the cuRoPE2D+attention pipeline (src/models/croco/curope/kernels.cu).

Falls back to the XLA path automatically for very long KV (> _MAX_KV_VMEM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 256  # query tile
_LANE = 128
_MAX_KV_VMEM = 4096  # beyond this, stream via the XLA path instead


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [Nk, D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + bias_ref[0]  # [BQ, Nk] fp32, bias = 0 / -inf padding mask
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _rot_half2(x):
    d = x.shape[-1]
    half, quarter = d // 2, d // 4
    y1 = x[:, :quarter]
    y2 = x[:, quarter:half]
    x1 = x[:, half : half + quarter]
    x2 = x[:, half + quarter :]
    return jnp.concatenate([-y2, y1, -x2, x1], axis=-1)


def _attn_rope_kernel(
    q_ref, k_ref, v_ref, qcos_ref, qsin_ref, kcos_ref, ksin_ref, bias_ref,
    o_ref, *, scale: float,
):
    """Attention with the 2D rotary embedding fused into the q/k tiles —
    replaces the reference's separate cuRoPE2D kernel + naive attention
    (croco/curope/kernels.cu + croco/blocks.py:105-111) with one kernel:
    the rotation happens in VMEM right before the QK^T matmul."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    q = q * qcos_ref[0] + _rot_half2(q) * qsin_ref[0]
    k = k * kcos_ref[0] + _rot_half2(k) * ksin_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention_rope_padded(q, k, v, qcos, qsin, kcos, ksin, bias, scale):
    bh, nq, d = q.shape
    nk = k.shape[1]
    grid = (bh, nq // _BQ)
    q_spec = pl.BlockSpec((1, _BQ, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_rope_kernel, scale=scale),
        grid=grid,
        in_specs=[q_spec, k_spec, k_spec, q_spec, q_spec, k_spec, k_spec,
                  pl.BlockSpec((1, 1, nk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _BQ, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * nq * nk * d,
            bytes_accessed=(q.size * 3 + k.size * 3 + v.size) * q.dtype.itemsize,
            transcendentals=bh * nq * nk,
        ),
    )(q, k, v, qcos, qsin, kcos, ksin, bias)


def flash_attention_rope(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    qpos: jax.Array,
    kpos: jax.Array,
    scale: float,
    rope_base: float = 100.0,
) -> jax.Array:
    """Fused RoPE2D + attention. q [B, H, Nq, D]; k/v [B, H, Nk, D];
    qpos/kpos [B, N, 2] integer (y, x) token positions."""
    from siu3r_tpu.ops.rope import rope2d_cos_sin

    b, h, nq, d = q.shape
    nk = k.shape[2]
    if nk > _MAX_KV_VMEM:
        from siu3r_tpu.ops.attention import xla_attention
        from siu3r_tpu.ops.rope import rope2d

        return xla_attention(
            rope2d(q, qpos, base=rope_base), rope2d(k, kpos, base=rope_base),
            v, scale,
        )
    qcos, qsin = rope2d_cos_sin(qpos, d, base=rope_base)  # [B, Nq, D]
    kcos, ksin = rope2d_cos_sin(kpos, d, base=rope_base)

    nq_p = _round_up(nq, _BQ)
    nk_p = _round_up(nk, _LANE)
    pad_q = ((0, 0), (0, 0), (0, nq_p - nq), (0, 0))
    pad_k = ((0, 0), (0, 0), (0, nk_p - nk), (0, 0))
    pad_cs_q = ((0, 0), (0, nq_p - nq), (0, 0))
    pad_cs_k = ((0, 0), (0, nk_p - nk), (0, 0))
    qp = jnp.pad(q, pad_q).reshape(b * h, nq_p, d)
    kp = jnp.pad(k, pad_k).reshape(b * h, nk_p, d)
    vp = jnp.pad(v, pad_k).reshape(b * h, nk_p, d)

    def tile_cs(cs, pad, n):
        cs = jnp.pad(cs, pad)
        cs = jnp.broadcast_to(cs[:, None], (b, h, n, d)).reshape(b * h, n, d)
        return cs.astype(q.dtype)

    qcos_t = tile_cs(qcos, pad_cs_q, nq_p)
    qsin_t = tile_cs(qsin, pad_cs_q, nq_p)
    kcos_t = tile_cs(kcos, pad_cs_k, nk_p)
    ksin_t = tile_cs(ksin, pad_cs_k, nk_p)

    valid = jnp.arange(nk_p) < nk
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)
    bias = jnp.broadcast_to(bias[None, None, :], (b * h, 1, nk_p))

    out = _flash_attention_rope_padded(
        qp, kp, vp, qcos_t, qsin_t, kcos_t, ksin_t, bias, scale
    )
    return out.reshape(b, h, nq_p, d)[:, :, :nq]


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention_padded(q, k, v, bias, scale):
    bh, nq, d = q.shape
    nk = k.shape[1]
    grid = (bh, nq // _BQ)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BQ, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _BQ, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * nq * nk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * nq * nk,
        ),
    )(q, k, v, bias)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    kv_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """[B, H, Nq, D] x [B, H, Nk, D] -> [B, H, Nq, D].

    kv_mask: optional [B, Nk] bool (True = attendable).
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if nk > _MAX_KV_VMEM:
        from siu3r_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v, scale, kv_mask=kv_mask)

    nq_p = _round_up(nq, _BQ)
    nk_p = _round_up(nk, _LANE)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, nq_p - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))

    # additive bias row per (b): 0 for valid keys, -inf for padding/masked
    valid = jnp.ones((b, nk), dtype=bool) if kv_mask is None else kv_mask
    valid = jnp.pad(valid, ((0, 0), (0, nk_p - nk)))
    bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)  # [B, nk_p]
    bias = jnp.broadcast_to(bias[:, None, None, :], (b, h, 1, nk_p))

    qf = qp.reshape(b * h, nq_p, d)
    kf = kp.reshape(b * h, nk_p, d)
    vf = vp.reshape(b * h, nk_p, d)
    bf = bias.reshape(b * h, 1, nk_p)
    out = _flash_attention_padded(qf, kf, vf, bf, scale)
    return out.reshape(b, h, nq_p, d)[:, :, :nq]
