"""Pallas binning kernel vs the jnp counting oracle (interpret mode).

The kernel must reproduce bin_gaussians_count EXACTLY: same table entries
up to each tile's count (depth order, stable ties by construction — the
test uses distinct depths), same counts, including truncation at
max_per_tile, dead gaussians, and non-chunk-multiple G (pad path).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siu3r_tpu.render.rasterizer import (
    bin_gaussians_count,
    bin_gaussians_pallas,
    _BIN_CHUNK,
)
from siu3r_tpu.render.projection import ProjectedGaussians


def _random_proj(rng, g, extent=276.0, max_radius=30.0, dead_frac=0.1):
    mean2d = jnp.asarray(rng.rand(g, 2) * (extent + 40) - 20, jnp.float32)
    # distinct depths so stable-tie behavior can't differ between sorts
    depth = jnp.asarray(rng.permutation(g) + rng.rand(g) * 0.5, jnp.float32)
    radius = jnp.asarray(rng.rand(g) * max_radius, jnp.float32)
    radius = jnp.where(jnp.asarray(rng.rand(g)) < dead_frac, 0.0, radius)
    return ProjectedGaussians(
        mean2d=mean2d,
        conic=jnp.ones((g, 3), jnp.float32) * 0.05,
        depth=depth,
        radius=radius,
    )


def _assert_same(proj, image_size, k, slots_y=4, slots_x=2):
    t_ref, c_ref = bin_gaussians_count(proj, image_size, k, slots_y, slots_x)
    t_pal, c_pal = bin_gaussians_pallas(
        proj, image_size, k, slots_y, slots_x, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(c_pal), np.asarray(c_ref))
    # entries beyond count are unspecified in both implementations
    mask = np.arange(k)[None, :] < np.asarray(c_ref)[:, None]
    np.testing.assert_array_equal(
        np.where(mask, np.asarray(t_pal), -1),
        np.where(mask, np.asarray(t_ref), -1),
    )


@pytest.mark.parametrize("g", [_BIN_CHUNK * 3, _BIN_CHUNK * 2 + 37])
def test_binning_matches_count_oracle(g):
    rng = np.random.RandomState(0)
    _assert_same(_random_proj(rng, g), (256, 256), 512)


def test_binning_truncation_at_k_cap():
    # huge radii so every gaussian touches every tile -> counts hit k
    rng = np.random.RandomState(1)
    g = _BIN_CHUNK * 2
    proj = _random_proj(rng, g, max_radius=500.0, dead_frac=0.0)
    k = 128
    t_pal, c_pal = bin_gaussians_pallas(proj, (256, 256), k, 16, 2, interpret=True)
    t_ref, c_ref = bin_gaussians_count(proj, (256, 256), k, 16, 2)
    np.testing.assert_array_equal(np.asarray(c_pal), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(t_pal), np.asarray(t_ref))


def test_binning_all_dead():
    rng = np.random.RandomState(2)
    proj = _random_proj(rng, _BIN_CHUNK, dead_frac=1.0)
    t, c = bin_gaussians_pallas(proj, (256, 256), 256, 4, 2, interpret=True)
    assert int(jnp.sum(c)) == 0


def test_binning_vmapped():
    rng = np.random.RandomState(3)
    g = _BIN_CHUNK * 2
    projs = [_random_proj(rng, g) for _ in range(3)]
    stacked = ProjectedGaussians(
        mean2d=jnp.stack([p.mean2d for p in projs]),
        conic=jnp.stack([p.conic for p in projs]),
        depth=jnp.stack([p.depth for p in projs]),
        radius=jnp.stack([p.radius for p in projs]),
    )
    k = 512
    t_v, c_v = jax.vmap(
        lambda p: bin_gaussians_pallas(p, (256, 256), k, 4, 2, interpret=True)
    )(stacked)
    for i, p in enumerate(projs):
        t_ref, c_ref = bin_gaussians_count(p, (256, 256), k, 4, 2)
        np.testing.assert_array_equal(np.asarray(c_v[i]), np.asarray(c_ref))
        mask = np.arange(k)[None, :] < np.asarray(c_ref)[:, None]
        np.testing.assert_array_equal(
            np.where(mask, np.asarray(t_v[i]), -1),
            np.where(mask, np.asarray(t_ref), -1),
        )
