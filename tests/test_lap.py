"""Auction LAP solver vs scipy linear_sum_assignment."""

import numpy as np
import pytest

from siu3r_tpu.ops.lap import auction_lap

scipy_opt = pytest.importorskip("scipy.optimize")


@pytest.mark.parametrize("r,c,seed", [(5, 8, 0), (20, 100, 1), (48, 100, 2), (100, 100, 3)])
def test_matches_scipy_cost(r, c, seed):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    cost = rng.rand(r, c).astype(np.float32) * 10
    ours = np.asarray(auction_lap(jnp.asarray(cost)))
    rows, cols = scipy_opt.linear_sum_assignment(cost)
    # assignments must be a permutation and cost-optimal (ties allowed)
    assert len(np.unique(ours)) == r
    ours_cost = cost[np.arange(r), ours].sum()
    ref_cost = cost[rows, cols].sum()
    assert ours_cost <= ref_cost + 1e-3, (ours_cost, ref_cost)


def test_invalid_rows():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    cost = rng.rand(6, 10).astype(np.float32)
    valid = np.array([True, True, False, True, False, True])
    ours = np.asarray(auction_lap(jnp.asarray(cost), jnp.asarray(valid)))
    assert (ours[~valid] == -1).all()
    assigned = ours[valid]
    assert (assigned >= 0).all() and len(np.unique(assigned)) == valid.sum()
    rows, cols = scipy_opt.linear_sum_assignment(cost[valid])
    assert cost[valid][np.arange(valid.sum()), assigned].sum() <= cost[valid][rows, cols].sum() + 1e-3


def test_vmap_and_jit():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(4)
    costs = jnp.asarray(rng.rand(3, 12, 30).astype(np.float32))
    valids = jnp.asarray(rng.rand(3, 12) > 0.3)
    f = jax.jit(jax.vmap(auction_lap))
    out = np.asarray(f(costs, valids))
    for b in range(3):
        v = np.asarray(valids[b])
        a = out[b][v]
        assert (a >= 0).all() and len(np.unique(a)) == v.sum()


@pytest.mark.parametrize("r,c", [(8, 100), (24, 100)])
def test_fast_rectangular_path_fuzz(r, c):
    """The single-round rectangular path (2r <= c) must stay exact-optimal
    across many instances, including near-tied costs (price-war stress)."""
    import jax.numpy as jnp

    for seed in range(15):
        rng = np.random.RandomState(seed)
        cost = rng.rand(r, c).astype(np.float32) * 10
        if seed % 3 == 2:  # near-ties
            cost = (cost * 1e-4 + 5.0).astype(np.float32)
        ours = np.asarray(auction_lap(jnp.asarray(cost)))
        rows, cols = scipy_opt.linear_sum_assignment(cost)
        assert len(np.unique(ours)) == r
        gap = cost[np.arange(r), ours].sum() - cost[rows, cols].sum()
        assert gap <= 1e-3, (seed, gap)
