"""Fused multi-scale deformable attention Pallas kernel.

The XLA lowering in ops/deformable.py builds the bilinear one-hot weight
matrix A[b, q, h, hw] as materialized HBM tensors (four corner
select_reduce fusions + an add fusion + the dot) — ~35% of the whole SIU3R
forward at 256^2 (~11 ms/item of ~32, trace r2). This kernel builds A
tile-by-tile in VMEM and feeds the MXU directly.

Measured outcome (v5e-1, adapter shape N=2 Lq=5440 H=16 HW=256): kernel
1.34 ms/call vs XLA 1.36 ms/call — the op is VPU-bound on the weight-matrix
build, and XLA's bf16 select/reduce lowering already sits near that
roofline, so the kernel is kept as an optional full-fp32-accuracy path
(maxdiff 0 vs the fp32 reference math; the in-model XLA path differs ~2e-2
from fp32 due to bf16 matmul inputs), not wired as the default. BASELINE.md
documents this bound as part of the round-2 MFU analysis.

Layout choices (TPU tiling: last dim = lanes(128), 2nd-last = sublanes):
  * gx/gy/aw enter as [N, Lq, H*P]  — lane dim H*P (32..64), query tiles on
    sublanes; a single (q-column, point) scalar column is a cheap lane slice;
  * value enters as [N, H, D, HW]   — the dot contracts the lane dim of both
    A [TQ, HW] and V_h [D, HW] (dot_general ((1,),(1,))), no relayouts;
  * out is [N, Lq, H*D].

Semantics identical to ops/deformable.multi_scale_deformable_attention
(grid_sample bilinear, zeros padding, align_corners=False — reference
src/models/mask2former/utils.py:8-58): out-of-range corner taps drop via the
iota equality (an index outside [0, hw) matches no lane).

Backward runs through the jnp twin (custom_vjp) — training keeps the XLA
path's gradients; the kernel serves the inference/serving hot path.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level_kernel(gx_ref, gy_ref, aw_ref, val_ref, out_ref, *,
                  hh: int, ww: int, n_heads: int, n_points: int,
                  head_dim: int, tile_q: int):
    """Separable bilinear-weight build: A = sum_p (Ry_p (x) Rx_p), where
    Ry/Rx are 2-tap row weights over [TQ, hh]/[TQ, ww] (tiny compares) and
    the expansion to the y-major [TQ, hh*ww] grid rides two constant 0/1
    MXU matmuls — ~6x less VPU work than 4 one-hot corner compares over the
    full [TQ, hh*ww] tile."""
    hw = hh * ww
    # E[y, k] = 1[k // ww == y]; T[x, k] = 1[k % ww == x]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (hh, hw), 1)
    y_iota = jax.lax.broadcasted_iota(jnp.int32, (hh, hw), 0)
    expand_y = (k_iota // ww == y_iota).astype(jnp.float32)
    k_iota_x = jax.lax.broadcasted_iota(jnp.int32, (ww, hw), 1)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (ww, hw), 0)
    tile_x = (k_iota_x % ww == x_iota).astype(jnp.float32)
    yy = jax.lax.broadcasted_iota(jnp.int32, (tile_q, hh), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (tile_q, ww), 1)

    def expand(r, m):
        return jax.lax.dot_general(
            r, m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for h in range(n_heads):
        acc = jnp.zeros((tile_q, hw), jnp.float32)
        for p in range(n_points):
            c = h * n_points + p
            gx = gx_ref[0, :, c][:, None]  # [TQ, 1]
            gy = gy_ref[0, :, c][:, None]
            aw = aw_ref[0, :, c][:, None]
            x0 = jnp.floor(gx)
            y0 = jnp.floor(gy)
            wx = gx - x0
            wy = gy - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            # 2-tap rows; OOB taps (y0 = -1 or y0+1 = hh) match no column
            ry = jnp.where(yy == y0i, (1.0 - wy) * aw, 0.0) + jnp.where(
                yy == y0i + 1, wy * aw, 0.0
            )  # [TQ, hh]
            rx = jnp.where(xx == x0i, 1.0 - wx, 0.0) + jnp.where(
                xx == x0i + 1, wx, 0.0
            )  # [TQ, ww]
            acc = acc + expand(ry, expand_y) * expand(rx, tile_x)
        v_h = val_ref[0, h]  # [D, HW]
        out = jax.lax.dot_general(
            acc, v_h.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, D]
        out_ref[0, :, h * head_dim:(h + 1) * head_dim] = out.astype(out_ref.dtype)


def _msda_level(gx, gy, aw, val, *, hh, ww, tile_q):
    n, lq, hp = gx.shape
    _, n_heads, head_dim, hw = val.shape
    n_points = hp // n_heads
    n_q = pl.cdiv(lq, tile_q)
    kernel = functools.partial(
        _level_kernel, hh=hh, ww=ww, n_heads=n_heads,
        n_points=n_points, head_dim=head_dim, tile_q=tile_q,
    )
    flops = 2 * n * lq * n_heads * hw * head_dim + 16 * n * lq * hp * hw
    return pl.pallas_call(
        kernel,
        grid=(n, n_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, hp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, hp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, hp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, head_dim, hw), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, n_heads * head_dim),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, lq, n_heads * head_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=val.size * 4 + 4 * gx.size * 4,
            transcendentals=0,
        ),
    )(gx, gy, aw, val)


def _msda_pallas_fwd_impl(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    b, _, n_heads, head_dim = value.shape
    _, lq, _, n_levels, n_points, _ = sampling_locations.shape
    # bound VMEM: a few [TQ, HW] fp32 tiles live per unrolled point loop
    max_hw = max(hh * ww for hh, ww in spatial_shapes)
    tile_q = min(512 if max_hw <= 256 else 128, max(8, -(-lq // 8) * 8))
    out = jnp.zeros((b, lq, n_heads * head_dim), jnp.float32)
    start = 0
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        val_l = value[:, start:start + hh * ww]  # [B, HW, H, D]
        start += hh * ww
        val_t = val_l.transpose(0, 2, 3, 1)  # [B, H, D, HW]
        loc = sampling_locations[:, :, :, lvl]  # [B, Lq, H, P, 2]
        gx = (loc[..., 0] * ww - 0.5).reshape(b, lq, n_heads * n_points)
        gy = (loc[..., 1] * hh - 0.5).reshape(b, lq, n_heads * n_points)
        aw = attention_weights[:, :, :, lvl].reshape(b, lq, n_heads * n_points)
        out = out + _msda_level(
            gx.astype(jnp.float32), gy.astype(jnp.float32),
            aw.astype(jnp.float32), val_t, hh=hh, ww=ww, tile_q=tile_q,
        )
    return out.astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def msda_pallas(value, spatial_shapes, sampling_locations, attention_weights):
    """Fused-TPU multi-scale deformable attention. Same contract as
    ops/deformable.multi_scale_deformable_attention."""
    return _msda_pallas_fwd_impl(
        value, spatial_shapes, sampling_locations, attention_weights
    )


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _msda_pallas_fwd_impl(
        value, spatial_shapes, sampling_locations, attention_weights
    )
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, res, g):
    from siu3r_tpu.ops.deformable import _msda_matmul

    value, sampling_locations, attention_weights = res
    _, vjp = jax.vjp(
        lambda v, l, a: _msda_matmul(v, spatial_shapes, l, a),
        value, sampling_locations, attention_weights,
    )
    return vjp(g)


msda_pallas.defvjp(_fwd, _bwd)
