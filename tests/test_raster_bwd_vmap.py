"""Batched (vmapped) Pallas rasterizer backward: semantics isolation.

The analytic Pallas backward is gradcheck-validated unbatched on-chip
(tools/mb_raster_bwd.py) but faults at TPU runtime inside the full
train step (batched via vmap OR lax.map — so the fault is not the vmap
lowering). This test checks the vmapped kernel in Pallas interpret mode
against per-item kernel calls: a pass means the kernel's math and its
vmap batching semantics (batched scalar-prefetch operands, scratch,
while_loop) are correct, ruling those out as the in-step fault.
Reference backward: /root/reference/submodules/diff-gaussian-rasterization
(CUDA backward.cu); ours re-derives the suffix-sum recurrence for the
chunked GEMM forward (render/rasterizer.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from siu3r_tpu.render.rasterizer import (
    TILE_H,
    TILE_W,
    _CHUNK,
    _tiles_backward,
)


@pytest.mark.parametrize("n_channels", [3])
def test_vmapped_backward_matches_per_item(n_channels):
    b, nt, k_cap = 3, 2, _CHUNK  # one chunk per tile keeps interpret fast
    npix = TILE_H * TILE_W
    rng = np.random.RandomState(0)

    # params rows: [mx, my, ca, cb, cc, opacity, depth, pad] — conic in
    # pixel units, means inside the tile so alphas are non-trivial
    params = np.zeros((b, nt, k_cap, 8), np.float32)
    params[..., 0] = rng.uniform(0, TILE_W, (b, nt, k_cap))
    params[..., 1] = rng.uniform(0, TILE_H, (b, nt, k_cap))
    params[..., 2] = rng.uniform(0.01, 0.1, (b, nt, k_cap))
    params[..., 3] = rng.uniform(-0.005, 0.005, (b, nt, k_cap))
    params[..., 4] = rng.uniform(0.01, 0.1, (b, nt, k_cap))
    params[..., 5] = rng.uniform(0.1, 0.9, (b, nt, k_cap))
    params[..., 6] = rng.uniform(1.0, 10.0, (b, nt, k_cap))
    colors = rng.rand(b, nt, k_cap, n_channels).astype(np.float32)
    # varying counts per (item, tile) exercises the count cut incl. a
    # partial chunk and the saturation early-exit bookkeeping
    counts = np.array([[k_cap, 40], [7, k_cap], [0, 96]], np.int32)
    row0 = np.zeros((b, nt), np.int32)
    col0 = np.zeros((b, nt), np.int32)
    gcolor = rng.randn(b, nt, n_channels, TILE_H, TILE_W).astype(np.float32)
    gaux = np.zeros((b, nt, 8, TILE_H, TILE_W), np.float32)
    gaux[:, :, 0] = rng.randn(b, nt, TILE_H, TILE_W)  # d(depth)
    gaux[:, :, 1] = rng.randn(b, nt, TILE_H, TILE_W)  # d(1 - T_N)

    def bwd(c, r, cl, p, co, gc, ga):
        return _tiles_backward(
            c, r, cl, p, co, gc, ga,
            k_cap=k_cap, n_channels=n_channels, interpret=True,
        )

    dp_v, dc_v = jax.vmap(bwd)(
        jnp.asarray(counts), jnp.asarray(row0), jnp.asarray(col0),
        jnp.asarray(params), jnp.asarray(colors),
        jnp.asarray(gcolor), jnp.asarray(gaux),
    )

    for i in range(b):
        dp_i, dc_i = bwd(
            jnp.asarray(counts[i]), jnp.asarray(row0[i]),
            jnp.asarray(col0[i]), jnp.asarray(params[i]),
            jnp.asarray(colors[i]), jnp.asarray(gcolor[i]),
            jnp.asarray(gaux[i]),
        )
        np.testing.assert_allclose(
            np.asarray(dp_v[i]), np.asarray(dp_i), rtol=1e-6, atol=1e-6,
            err_msg=f"d_params diverges for batch item {i}",
        )
        np.testing.assert_allclose(
            np.asarray(dc_v[i]), np.asarray(dc_i), rtol=1e-6, atol=1e-6,
            err_msg=f"d_colors diverges for batch item {i}",
        )
