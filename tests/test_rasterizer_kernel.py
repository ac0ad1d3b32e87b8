"""Pallas kernel (interpret mode) vs its jnp twin — the twin is what CPU
paths and the custom-VJP backward differentiate, so the two must agree."""

import jax
import jax.numpy as jnp
import numpy as np

from siu3r_tpu.render.rasterizer import _CHUNK, _rasterize_tiles, _tiles_jnp, TILE_H, TILE_W


def test_kernel_matches_jnp_twin():
    rng = np.random.RandomState(0)
    nt, k = 2, _CHUNK * 2
    params = np.zeros((nt, k, 8), np.float32)
    params[..., 0] = rng.uniform(0, TILE_W, (nt, k))  # mean x
    params[..., 1] = rng.uniform(0, TILE_H, (nt, k))  # mean y
    params[..., 2] = rng.uniform(0.01, 0.2, (nt, k))  # conic a
    params[..., 3] = rng.uniform(-0.01, 0.01, (nt, k))
    params[..., 4] = rng.uniform(0.01, 0.2, (nt, k))
    params[..., 5] = rng.uniform(0.1, 0.9, (nt, k))  # opacity
    params[..., 6] = rng.uniform(1, 10, (nt, k))  # depth
    colors = rng.rand(nt, k, 3).astype(np.float32)
    counts = np.array([k, k // 2], np.int32)
    row0 = np.array([0, TILE_H], np.int32)
    col0 = np.array([0, 0], np.int32)

    c_kernel, a_kernel = _rasterize_tiles(
        jnp.asarray(counts), jnp.asarray(row0), jnp.asarray(col0),
        jnp.asarray(params), jnp.asarray(colors),
        k_cap=k, n_channels=3, interpret=True,
    )
    c_jnp, a_jnp = _tiles_jnp(
        jnp.asarray(counts), jnp.asarray(row0), jnp.asarray(col0),
        jnp.asarray(params), jnp.asarray(colors),
    )
    # the kernel's whole-tile early exit only skips sub-1e-4-transmittance
    # contributions
    np.testing.assert_allclose(np.asarray(c_kernel), np.asarray(c_jnp), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(a_kernel[:, :2]), np.asarray(a_jnp[:, :2]), atol=2e-4
    )


def test_twin_gradients_finite():
    rng = np.random.RandomState(1)
    nt, k = 1, _CHUNK
    params = np.zeros((nt, k, 8), np.float32)
    params[..., 0] = rng.uniform(0, TILE_W, (nt, k))
    params[..., 1] = rng.uniform(0, TILE_H, (nt, k))
    params[..., 2] = 0.05
    params[..., 4] = 0.05
    params[..., 5] = 0.5
    params[..., 6] = 5.0
    colors = rng.rand(nt, k, 3).astype(np.float32)
    counts = jnp.array([k], jnp.int32)
    zeros = jnp.zeros((nt,), jnp.int32)

    def loss(p, c):
        col, aux = _tiles_jnp(counts, zeros, zeros, p, c)
        return col.sum() + aux[:, 0].sum()

    g_p, g_c = jax.grad(loss, argnums=(0, 1))(jnp.asarray(params), jnp.asarray(colors))
    assert np.isfinite(np.asarray(g_p)).all()
    assert np.isfinite(np.asarray(g_c)).all()
    assert float(jnp.abs(g_c).max()) > 0
