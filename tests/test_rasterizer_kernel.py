"""Pallas kernel (interpret mode) vs its jnp twin — the twin is what CPU
paths and the custom-VJP backward differentiate, so the two must agree."""

import jax
import jax.numpy as jnp
import numpy as np

from siu3r_tpu.render.rasterizer import (
    _CHUNK,
    _rasterize_tiles,
    _tiles_backward,
    _tiles_jnp,
    TILE_H,
    TILE_W,
)


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


def _random_tiles(rng, nt, k, n_channels=3, opacity_hi=0.9):
    params = np.zeros((nt, k, 8), np.float32)
    params[..., 0] = rng.uniform(-10, TILE_W + 10, (nt, k))
    params[..., 1] = rng.uniform(-10, TILE_H + 10, (nt, k))
    params[..., 2] = rng.uniform(0.01, 0.2, (nt, k))
    params[..., 3] = rng.uniform(-0.01, 0.01, (nt, k))
    params[..., 4] = rng.uniform(0.01, 0.2, (nt, k))
    params[..., 5] = rng.uniform(0.05, opacity_hi, (nt, k))
    params[..., 6] = rng.uniform(1, 10, (nt, k))
    colors = rng.rand(nt, k, n_channels).astype(np.float32)
    return params, colors


def test_pallas_backward_matches_twin_vjp():
    """The analytic Pallas backward must reproduce the jnp-twin VJP on
    unsaturated tiles (where the saturation early-exit never fires), for
    full and partial counts and multi-channel colors."""
    rng = np.random.RandomState(2)
    nt, k, c = 3, _CHUNK * 3, 5
    params, colors = _random_tiles(rng, nt, k, n_channels=c, opacity_hi=0.35)
    counts = np.array([k, k // 2, 37], np.int32)
    row0 = np.array([0, TILE_H, 0], np.int32)
    col0 = np.array([0, 0, TILE_W], np.int32)
    args = [jnp.asarray(x) for x in (counts, row0, col0, params, colors)]

    out, vjp = jax.vjp(lambda p, cc: _tiles_jnp(*args[:3], p, cc), args[3], args[4])
    g_rng = np.random.RandomState(3)
    gcolor = jnp.asarray(g_rng.randn(nt, c, TILE_H, TILE_W).astype(np.float32))
    gaux = jnp.zeros((nt, 8, TILE_H, TILE_W), np.float32)
    gaux = gaux.at[:, 0].set(
        jnp.asarray(g_rng.randn(nt, TILE_H, TILE_W).astype(np.float32))
    )
    gaux = gaux.at[:, 1].set(
        jnp.asarray(g_rng.randn(nt, TILE_H, TILE_W).astype(np.float32))
    )
    d_params_ref, d_colors_ref = vjp((gcolor, gaux))

    d_params, d_colors = _tiles_backward(
        *args, gcolor, gaux, k_cap=k, n_channels=c, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(d_colors), np.asarray(d_colors_ref), rtol=1e-4, atol=1e-5
    )
    scale = np.abs(np.asarray(d_params_ref)).max()
    np.testing.assert_allclose(
        np.asarray(d_params), np.asarray(d_params_ref),
        rtol=1e-4, atol=1e-5 * max(scale, 1.0),
    )


def test_pallas_backward_saturated_tile():
    """On a saturating tile the backward stops at the forward's early-exit
    point; gradients of the truncated tail are <= the 1e-4 transmittance
    bound. Compare against the twin VJP with a loose absolute tolerance
    scaled to the cotangent magnitude."""
    rng = np.random.RandomState(4)
    nt, k = 1, _CHUNK * 4
    params, colors = _random_tiles(rng, nt, k, opacity_hi=0.95)
    # big fat splats covering the tile -> rapid saturation
    params[..., 0] = rng.uniform(0, TILE_W, (nt, k))
    params[..., 1] = rng.uniform(0, TILE_H, (nt, k))
    params[..., 2] = 0.002
    params[..., 4] = 0.002
    params[..., 3] = 0.0
    params[..., 5] = 0.9
    counts = np.array([k], np.int32)
    zeros = np.zeros((nt,), np.int32)
    args = [
        jnp.asarray(x) for x in (counts, zeros, zeros, params, colors)
    ]
    out, vjp = jax.vjp(lambda p, cc: _tiles_jnp(*args[:3], p, cc), args[3], args[4])
    gcolor = jnp.ones((nt, 3, TILE_H, TILE_W), np.float32)
    gaux = jnp.zeros((nt, 8, TILE_H, TILE_W), np.float32)
    gaux = gaux.at[:, :2].set(1.0)
    d_params_ref, d_colors_ref = vjp((gcolor, gaux))
    d_params, d_colors = _tiles_backward(
        *args, gcolor, gaux, k_cap=k, n_channels=3, interpret=True
    )
    # tail gaussians see transmittance < 1e-4; their grads are that small
    np.testing.assert_allclose(
        np.asarray(d_colors), np.asarray(d_colors_ref), atol=2e-4 * TILE_H * TILE_W
    )
    np.testing.assert_allclose(
        np.asarray(d_params), np.asarray(d_params_ref),
        atol=2e-4 * TILE_H * TILE_W,
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
