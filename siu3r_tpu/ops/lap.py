"""Linear assignment on-device: Jacobi auction algorithm (pure JAX,
jit/vmap/SPMD-safe).

Replaces the scipy ``linear_sum_assignment`` host callback the reference
relies on for Hungarian matching (video_seg_decoder.py:56-57, :215).
A host callback stalls the device (10x per train step — once per aux layer)
and is not supported inside SPMD-sharded jits; the auction algorithm runs
entirely on-device and is epsilon-optimal — with epsilon below the minimal
cost gap it returns an exact optimal assignment (validated against scipy in
tests/test_lap.py).

Two regimes (dispatched on the static shape):
  * ``r <= c/2`` (the training case: <=~24 GT objects vs 100 queries) — a
    SINGLE round from all-zero prices. With equal initial prices the
    rectangular forward auction is r*eps-optimal (Bertsekas; the lambda
    condition "unassigned prices <= assigned prices" holds since unassigned
    columns keep the common initial price), and with c-r slack columns it
    converges in O(r) Jacobi iterations — measured <=19 iterations at
    48x100 vs ~1400 for the round-1 squared form (the zero-benefit dummy
    rows all chased the same cheapest column, one winner per iteration).
  * otherwise — the round-1 squared form with dummy rows + epsilon scaling
    with persistent prices (sound because every column ends each round
    assigned; warm-started prices tame the near-tie price wars that make a
    cold small-epsilon square run take thousands of iterations).

Invalid rows are masked out and reported as -1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e18


def _auction_round(benefit, row_valid, prices, eps, max_iters,
                   owner=None, row_of=None):
    """One Jacobi auction round: bid until every valid row is assigned.
    benefit [R, C]; prices [C]. ``owner``/``row_of`` warm-start a partial
    assignment (escalating-eps rescue rounds); if everything is already
    assigned the while_loop exits after zero iterations.
    Returns (prices, owner, row_of [R])."""
    r, c = benefit.shape
    rows_arange = jnp.arange(r, dtype=jnp.int32)
    if owner is None:
        owner = jnp.full((c,), -1, jnp.int32)  # column -> owning row
    if row_of is None:
        row_of = jnp.full((r,), -1, jnp.int32)  # row -> column

    def cond(state):
        it, prices, owner, row_of = state
        return (it < max_iters) & ((row_of < 0) & row_valid).any()

    def body(state):
        it, prices, owner, row_of = state
        values = benefit - prices[None, :]  # [r, c]
        top2_vals, top2_idx = jax.lax.top_k(values, 2)
        best_v = top2_vals[:, 0]
        second_v = top2_vals[:, 1]
        best_j = top2_idx[:, 0]
        bids = prices[best_j] + (best_v - second_v) + eps
        bidding = (row_of < 0) & row_valid
        bids = jnp.where(bidding, bids, _NEG)
        col_best_bid = jnp.full((c,), _NEG).at[best_j].max(bids)
        is_cand = bidding & (bids >= col_best_bid[best_j]) & (bids > _NEG)
        # deterministic tie-break: lowest row index wins the column
        winner_row = jnp.full((c,), r, jnp.int32).at[
            jnp.where(is_cand, best_j, c)
        ].min(rows_arange, mode="drop")
        won = is_cand & (winner_row[best_j] == rows_arange)
        win_cols = jnp.where(won, best_j, c)
        prev_owner = jnp.where(won, owner[best_j], -1)
        row_of = row_of.at[jnp.where(prev_owner >= 0, prev_owner, r)].set(
            -1, mode="drop"
        )
        owner = owner.at[win_cols].set(rows_arange, mode="drop")
        row_of = row_of.at[jnp.where(won, rows_arange, r)].set(
            win_cols.astype(jnp.int32), mode="drop"
        )
        prices = prices.at[win_cols].set(
            jnp.where(won, bids, 0.0), mode="drop"
        )
        return it + 1, prices, owner, row_of

    _, prices, owner, row_of = jax.lax.while_loop(
        cond, body, (jnp.int32(0), prices, owner, row_of)
    )
    return prices, owner, row_of


def auction_lap(
    cost: jax.Array,
    row_valid: jax.Array | None = None,
    eps_scale: int = 7,
    max_iters: int = 4000,
) -> jax.Array:
    """cost [R, C] float32 (R <= C); row_valid [R] bool (invalid rows get
    assignment -1). Returns the assigned column per row, int32.

    Non-convergence contract: if every round (including the escalating-eps
    rescues, whose final eps is 4096x the base — large enough to end any
    price war within the iteration budget) exhausts ``max_iters``, a
    still-unassigned *valid* row returns -1. The criterion treats -1 as
    "unmatched": every consumer masks with ``assignment >= 0`` before
    ``jnp.clip(assignment, 0)`` (train/losses.py _label_loss /
    _mask_losses_item), so a non-converged row drops out of the loss instead
    of wrapping into a wrong query — graceful degradation, not silent
    corruption.

    Optimality: rows assigned in round k satisfy eps_k-CS at bid time, so
    the total-cost gap is bounded by sum of the per-row bid-time epsilons;
    in the common case everything assigns in round 0 (eps = spread/250000,
    gap <= r*spread/250000). Tie-heavy matrices (duplicate GT masks,
    saturated dice) may differ from scipy in *assignment* while agreeing in
    *total cost* — fuzz-validated to gap <= 3e-7 over duplicated rows/
    columns, quantized and constant-block costs (tests/test_lap.py)."""
    r, c = cost.shape
    assert r <= c, "auction_lap expects rows <= cols"
    if row_valid is None:
        row_valid = jnp.ones((r,), bool)

    if 2 * r <= c:
        # fast rectangular path: first round at exactness-level eps, then
        # escalating-eps rescue rounds carrying prices AND assignments
        # forward. Random cost matrices converge in the first round
        # (<=~20 Jacobi iterations at 48x100) and every rescue round exits
        # after ZERO iterations (no unassigned rows) — free. Tie-heavy
        # matrices (duplicate GT masks) can stall the tiny-eps round in an
        # eps-increment price war (measured 5600+ iterations for 15
        # duplicated rows at 30x100 — the round-2 single-round form returned
        # unassigned rows there); each rescue round multiplies eps by 8,
        # ending the war while preserving eps-CS for rows assigned earlier
        # at their smaller bid-time eps.
        benefit = jnp.where(row_valid[:, None], -cost.astype(jnp.float32), 0.0)
        spread = jnp.maximum(jnp.max(jnp.abs(benefit)), 1.0)
        eps0 = spread / 250000.0
        prices = jnp.zeros((c,), jnp.float32)
        prices, owner, row_of = _auction_round(
            benefit, row_valid, prices, eps0, max_iters
        )
        for k in (64.0, 4096.0):
            prices, owner, row_of = _auction_round(
                benefit, row_valid, prices, eps0 * k, max_iters,
                owner=owner, row_of=row_of,
            )
        return jnp.where(row_valid, row_of, -1)

    # near-square: dummy rows + epsilon scaling with persistent prices
    benefit = jnp.zeros((c, c), jnp.float32)
    benefit = benefit.at[:r].set(
        jnp.where(row_valid[:, None], -cost.astype(jnp.float32), 0.0)
    )
    all_valid = jnp.ones((c,), bool)
    spread = jnp.maximum(jnp.max(jnp.abs(benefit)), 1.0)

    def run_eps(prices, eps):
        prices, _, row_of = _auction_round(
            benefit, all_valid, prices, eps, max_iters
        )
        return prices, row_of

    eps0 = spread / 4.0
    epss = eps0 / (5.0 ** jnp.arange(eps_scale, dtype=jnp.float32))
    prices = jnp.zeros((c,), jnp.float32)
    prices, row_of = jax.lax.scan(run_eps, prices, epss)
    return jnp.where(row_valid, row_of[-1][:r], -1)
