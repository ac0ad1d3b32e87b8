"""Linear assignment on-device: Jacobi auction algorithm with epsilon
scaling (pure JAX, jit/vmap/SPMD-safe).

Replaces the scipy ``linear_sum_assignment`` host callback the reference
relies on for Hungarian matching (video_seg_decoder.py:56-57, :215).
A host callback stalls the device (10x per train step — once per aux layer)
and is not supported inside SPMD-sharded jits; the auction algorithm runs
entirely on-device and is epsilon-optimal — with the final epsilon below the
minimal cost gap it returns an exact optimal assignment (validated against
scipy in tests/test_lap.py).

The rectangular problem (R rows <= C columns) is squared up with zero-cost
dummy rows: epsilon-scaling with persistent prices is only sound when every
column ends the round assigned (unassigned columns would otherwise carry
stale inflated prices across rounds, silently destroying optimality) — the
dummies absorb the leftover columns at zero cost without changing the
optimum over real rows. Invalid rows are treated as dummies and reported as
-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e18


def auction_lap(
    cost: jax.Array,
    row_valid: jax.Array | None = None,
    eps_scale: int = 7,
    max_iters: int = 4000,
) -> jax.Array:
    """cost [R, C] float32 (R <= C); row_valid [R] bool (invalid rows get
    assignment -1). Returns the assigned column per row, int32."""
    r, c = cost.shape
    assert r <= c, "auction_lap expects rows <= cols"
    if row_valid is None:
        row_valid = jnp.ones((r,), bool)

    # square up: real valid rows keep -cost benefits; dummy/invalid rows get
    # zero benefit everywhere
    benefit_real = -cost.astype(jnp.float32)
    benefit = jnp.zeros((c, c), jnp.float32)
    benefit = benefit.at[:r].set(
        jnp.where(row_valid[:, None], benefit_real, 0.0)
    )
    n = c
    spread = jnp.maximum(jnp.max(jnp.abs(benefit)), 1.0)
    rows_arange = jnp.arange(n, dtype=jnp.int32)

    def run_eps(carry, eps):
        prices = carry
        owner = jnp.full((n,), -1, jnp.int32)
        row_of = jnp.full((n,), -1, jnp.int32)

        def cond(state):
            it, prices, owner, row_of = state
            return (it < max_iters) & (row_of < 0).any()

        def body(state):
            it, prices, owner, row_of = state
            values = benefit - prices[None, :]  # [n, n]
            top2_vals, top2_idx = jax.lax.top_k(values, 2)
            best_v = top2_vals[:, 0]
            second_v = top2_vals[:, 1]
            best_j = top2_idx[:, 0]
            bids = prices[best_j] + (best_v - second_v) + eps
            bidding = row_of < 0
            bids = jnp.where(bidding, bids, _NEG)
            col_best_bid = jnp.full((n,), _NEG).at[best_j].max(bids)
            is_cand = bidding & (bids >= col_best_bid[best_j]) & (bids > _NEG)
            # deterministic tie-break: lowest row index wins the column
            winner_row = jnp.full((n,), n, jnp.int32).at[
                jnp.where(is_cand, best_j, n)
            ].min(rows_arange, mode="drop")
            won = is_cand & (winner_row[best_j] == rows_arange)
            win_cols = jnp.where(won, best_j, n)
            prev_owner = jnp.where(won, owner[best_j], -1)
            row_of = row_of.at[jnp.where(prev_owner >= 0, prev_owner, n)].set(
                -1, mode="drop"
            )
            owner = owner.at[win_cols].set(rows_arange, mode="drop")
            row_of = row_of.at[jnp.where(won, rows_arange, n)].set(
                win_cols.astype(jnp.int32), mode="drop"
            )
            prices = prices.at[win_cols].set(
                jnp.where(won, bids, 0.0), mode="drop"
            )
            return it + 1, prices, owner, row_of

        _, prices, owner, row_of = jax.lax.while_loop(
            cond, body, (jnp.int32(0), prices, owner, row_of)
        )
        return prices, row_of

    eps0 = spread / 4.0
    epss = eps0 / (5.0 ** jnp.arange(eps_scale, dtype=jnp.float32))
    prices = jnp.zeros((n,), jnp.float32)
    prices, row_of = jax.lax.scan(run_eps, prices, epss)
    final = row_of[-1][:r]
    return jnp.where(row_valid, final, -1)
