"""Splat rasterizer tests: analytic single-gaussian cases + tiled kernel vs
the dense jnp reference compositor (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siu3r_tpu.gaussians import build_covariance
from siu3r_tpu.render.rasterizer import rasterize, rasterize_reference


def make_scene(g, key, spread=2.0, depth_range=(4.0, 8.0), scale=0.1):
    ks = jax.random.split(key, 5)
    means = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (g, 2), minval=-spread, maxval=spread),
            jax.random.uniform(ks[1], (g, 1), minval=depth_range[0], maxval=depth_range[1]),
        ],
        axis=-1,
    )
    scales = jax.random.uniform(ks[2], (g, 3), minval=scale * 0.5, maxval=scale)
    quats = jax.random.normal(ks[3], (g, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    covs = build_covariance(scales, quats)
    opac = jax.random.uniform(ks[4], (g,), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(jax.random.PRNGKey(7), (g, 3))
    return means, covs, opac, colors


def cam(h, w, fx=None):
    fx = fx or w * 1.2
    intr = jnp.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]])
    viewmat = jnp.eye(4)
    return viewmat[None], intr[None]


def test_single_gaussian_center():
    """A gaussian on the optical axis lands at the image center with its
    analytic alpha."""
    h, w = 32, 128
    means = jnp.array([[0.0, 0.0, 5.0]])
    covs = jnp.eye(3)[None] * 0.01
    opac = jnp.array([0.8])
    colors = jnp.array([[1.0, 0.5, 0.25]])
    viewmats, intr = cam(h, w)
    color, depth, alpha = rasterize(
        means, covs, opac, colors, viewmats, intr, (h, w), max_per_tile=128
    )
    cy, cx = h // 2, w // 2
    # center pixel: d = (cx - u). u = fx*0/5 + cx - 0.5 -> d = 0.5 px
    fx = float(intr[0, 0, 0])
    sigma2 = 0.01 * (fx / 5.0) ** 2 + 0.3  # projected variance + low-pass
    expected_alpha = 0.8 * np.exp(-0.5 * (0.5**2 + 0.5**2) / sigma2)
    got = float(alpha[0, cy, cx])
    assert abs(got - expected_alpha) < 1e-3
    np.testing.assert_allclose(
        np.asarray(color[0, cy, cx]),
        expected_alpha * np.array([1.0, 0.5, 0.25]),
        atol=1e-3,
    )
    # depth = expected depth * weight
    assert abs(float(depth[0, cy, cx]) - expected_alpha * 5.0) < 1e-2
    # far corner: nothing
    assert float(alpha[0, 0, 0]) < 1e-6


def test_kernel_matches_reference_compositor():
    h, w = 64, 256  # 4 rows x 2 cols of (16,128) tiles
    means, covs, opac, colors = make_scene(300, jax.random.PRNGKey(0))
    viewmats, intr = cam(h, w)
    bg = jnp.array([0.1, 0.2, 0.3])
    color, depth, alpha = rasterize(
        means, covs, opac, colors, viewmats, intr, (h, w),
        background=bg, max_per_tile=512,
    )
    rcolor, rdepth, ralpha = rasterize_reference(
        means, covs, opac, colors, viewmats, intr, (h, w), background=bg
    )
    # tolerance: the kernel bins by the 3-sigma box (like the CUDA
    # rasterizer), so gaussian tails past the box are cut where the dense
    # oracle still composites them (alpha up to ~op*exp(-4.5) ≈ 0.01)
    np.testing.assert_allclose(np.asarray(color), np.asarray(rcolor), atol=5e-3)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ralpha), atol=5e-3)
    # depth amplifies the tail-cutoff weight differences by the depth value
    np.testing.assert_allclose(np.asarray(depth), np.asarray(rdepth), atol=6e-2)


def test_multi_camera_and_channels():
    h, w = 32, 128
    means, covs, opac, _ = make_scene(100, jax.random.PRNGKey(1))
    c = 10
    colors = jax.random.uniform(jax.random.PRNGKey(2), (100, c))
    viewmats, intr = cam(h, w)
    shift = jnp.eye(4).at[0, 3].set(0.3)
    viewmats = jnp.concatenate([viewmats, (jnp.linalg.inv(shift))[None]], axis=0)
    intr = jnp.concatenate([intr, intr], axis=0)
    color, depth, alpha = rasterize(
        means, covs, opac, colors, viewmats, intr, (h, w),
        max_per_tile=256, channel_chunk=4,
    )
    rcolor, rdepth, ralpha = rasterize_reference(
        means, covs, opac, colors, viewmats, intr, (h, w)
    )
    assert color.shape == (2, h, w, c)
    np.testing.assert_allclose(np.asarray(color), np.asarray(rcolor), atol=2e-3)
    # the two cameras see different images
    assert float(jnp.abs(color[0] - color[1]).max()) > 1e-3


def test_truncation_drops_farthest():
    """When a tile overflows max_per_tile, the nearest gaussians win."""
    h, w = 16, 128
    g = 64
    means = jnp.concatenate(
        [jnp.zeros((g, 2)), jnp.linspace(3.0, 9.0, g)[:, None]], axis=-1
    )
    covs = jnp.eye(3)[None].repeat(g, 0) * 0.02
    opac = jnp.full((g,), 0.99)
    colors = jnp.stack([jnp.linspace(0, 1, g)] * 3, axis=-1)
    viewmats, intr = cam(h, w)
    full, _, _ = rasterize(means, covs, opac, colors, viewmats, intr, (h, w), max_per_tile=64)
    trunc, _, _ = rasterize(means, covs, opac, colors, viewmats, intr, (h, w), max_per_tile=8)
    # nearest gaussians saturate the pixel; dropping the far ones changes little
    np.testing.assert_allclose(
        np.asarray(full[0, 8, 64]), np.asarray(trunc[0, 8, 64]), atol=1e-2
    )


def test_binning_count_matches_sort():
    """The sort-free counting binning (bin_gaussians_count) must produce
    byte-identical tables/counts to the key-sort path it replaced, including
    duplicate depths (stable order), culled gaussians (radius 0), and
    footprints clamped by the slot grid."""
    from siu3r_tpu.render.projection import project_gaussians
    from siu3r_tpu.render.rasterizer import (
        bin_gaussians_count,
        bin_gaussians_sort,
    )

    h, w = 64, 256  # 4x2 tile grid at 16x128 tiles
    viewmat, intr = cam(h, w)
    for seed, g, scale in [(0, 512, 0.1), (1, 2048, 0.4), (2, 256, 1.5)]:
        means, covs, opac, _ = make_scene(
            g, jax.random.PRNGKey(seed), spread=3.0, scale=scale
        )
        if seed == 1:
            # force depth ties (stable-order check)
            means = means.at[:, 2].set(jnp.round(means[:, 2] * 2) / 2)
        proj = project_gaussians(
            means, covs, viewmat[0], intr[0], (h, w), 0.2, 1000.0
        )
        for k_cap in (128, 512):
            t_sort, c_sort = bin_gaussians_sort(proj, (h, w), k_cap, 4, 2)
            t_cnt, c_cnt = bin_gaussians_count(proj, (h, w), k_cap, 4, 2)
            np.testing.assert_array_equal(np.asarray(c_sort), np.asarray(c_cnt))
            ts, tc = np.asarray(t_sort), np.asarray(t_cnt)
            cs = np.asarray(c_sort)
            for t in range(ts.shape[0]):
                np.testing.assert_array_equal(
                    ts[t, : cs[t]], tc[t, : cs[t]],
                    err_msg=f"seed={seed} k={k_cap} tile={t}",
                )
