"""Hungarian matching between queries and (padded) ground-truth objects.

Reference: VideoMask2FormerHungarianMatcher (video_seg_decoder.py:98-226) —
point-sampled class/mask-BCE/dice costs, scipy linear_sum_assignment on the
host.

Here the cost matrix is computed densely under jit over a fixed GT pad
(invalid objects masked) and the assignment is solved ON-DEVICE by the
epsilon-scaled auction algorithm (ops/lap.py): no host round-trips (the
reference pays one scipy sync per batch item per aux layer), and it works
inside SPMD-sharded jits where host callbacks are not supported.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from siu3r_tpu.ops.deformable import grid_sample_bilinear, grid_sample_separable


_MATMUL_MAX_HW = 4096


def largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of ``n`` that is <= ``cap`` (static Python ints —
    used to pick row-chunk sizes that tile ``n`` exactly without ever
    falling back to the full, OOM-prone width)."""
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def _interp_matrix(coords: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear interpolation matrix S [P, H*W] for shared sample points
    (grid_sample semantics: align_corners=False, zeros padding — OOB corner
    taps match no column)."""
    hw_iota = jax.lax.broadcasted_iota(jnp.int32, (1, h * w), 1)
    gx = (coords[:, 0] * w - 0.5)[:, None]  # [P, 1]
    gy = (coords[:, 1] * h - 0.5)[:, None]
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    s = jnp.zeros((coords.shape[0], h * w), jnp.float32)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = y0i + dy
        xi = x0i + dx
        cw = (wy if dy else 1.0 - wy) * (wx if dx else 1.0 - wx)
        oob = (yi < 0) | (yi >= h) | (xi < 0) | (xi >= w)
        idx = jnp.where(oob, -1, yi * w + xi)
        s = s + jnp.where(hw_iota == idx, cw, 0.0)
    return s


def sample_mask_points(
    masks: jax.Array, coords: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """masks [N, V, H, W]; coords [P, 2] in [0,1] (x, y) shared across N.
    Returns [N, V, P] bilinear samples (grid_sample semantics,
    align_corners=False, reference utils.py:62-96).

    Small grids ride the MXU: because the points are shared across all
    masks, sampling is one interpolation matrix S [P, HW] x the flattened
    masks — 10x faster than the per-mask gather at the matcher's training
    shapes (105 -> ~8 ms for 200 masks x 12544 points, v5e). HIGHEST matmul
    precision keeps it numerically equivalent to the gather path (criterion
    parity tolerance 1e-4)."""
    n, v, h, w = masks.shape
    if h * w <= _MATMUL_MAX_HW:
        s = _interp_matrix(coords, h, w)
        flat = masks.reshape(n * v, h * w)
        out = jax.lax.dot_general(
            flat.astype(jnp.float32), s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [N*V, P]
        return out.reshape(n, v, -1)
    imgs = masks.reshape(n * v, h, w, 1)
    grid = jnp.broadcast_to(2.0 * coords - 1.0, (n * v,) + coords.shape)
    # chunk the row sweep: the separable sampler's one-hot row matrix is
    # [rows, P, H] — materialized for ALL N*V rows at once it is the largest
    # allocation in the train step (4.59 GiB at the V=8 reference shape,
    # 384 rows x 12544 pts x 256 — the round-4 HBM OOM). lax.map over
    # 16-row chunks caps it at ~200 MiB; the sampling is a no-grad batched
    # matmul, so 24 sequential chunks cost ~no wall-clock (MXU-bound,
    # ~0.1 ms/chunk).
    nb = n * v
    # largest divisor <= 16 (never the full width — see losses.py row_chunk)
    chunk = largest_divisor_leq(nb, 16)
    if chunk < nb:
        out = jax.lax.map(
            lambda a: grid_sample_separable(a[0], a[1], precision=precision),
            (
                imgs.reshape(nb // chunk, chunk, h, w, 1),
                grid.reshape(nb // chunk, chunk, -1, 2),
            ),
        ).reshape(nb, -1, 1)
    else:
        out = grid_sample_separable(imgs, grid, precision=precision)  # [N*V, P, 1]
    return out.reshape(n, v, -1)


def pairwise_sigmoid_ce(inputs: jax.Array, labels: jax.Array) -> jax.Array:
    """inputs [Q, P] logits; labels [O, P] binary. Returns [Q, O]
    (reference utils.py:227-254)."""
    p = inputs.shape[1]
    pos = jax.nn.softplus(-inputs)  # BCE vs target 1
    neg = jax.nn.softplus(inputs)  # BCE vs target 0
    loss = jnp.einsum("qp,op->qo", pos, labels) + jnp.einsum(
        "qp,op->qo", neg, 1.0 - labels
    )
    return loss / p


def pairwise_dice(inputs: jax.Array, labels: jax.Array) -> jax.Array:
    """reference utils.py:204-223"""
    probs = jax.nn.sigmoid(inputs)
    numerator = 2 * jnp.einsum("qp,op->qo", probs, labels)
    denominator = probs.sum(-1)[:, None] + labels.sum(-1)[None, :]
    return 1 - (numerator + 1) / (denominator + 1)


def hungarian_match(
    class_logits: jax.Array,
    mask_logits: jax.Array,
    gt_masks: jax.Array,
    gt_classes: jax.Array,
    gt_valid: jax.Array,
    rng: jax.Array,
    num_points: int = 12544,
    cost_class: float = 1.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
    coords: jax.Array = None,
    tgt_pts: jax.Array = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Single-item matching (vmap over batch outside).

    class_logits [Q, C+1]; mask_logits [Q, V, h, w]; gt_masks [O, V, H, W];
    gt_classes [O]; gt_valid [O]. Returns assignment [O] int32 (query id per
    gt, -1 when invalid). ``coords`` [P, 2] overrides the random sample
    points (parity tests inject the reference's coordinates); ``tgt_pts``
    [O, V*P] supplies pre-sampled GT values for those coords (the criterion
    shares match points across aux layers so the static GT masks are
    sampled once, not once per layer)."""
    # matching is not differentiated (reference matcher is @torch.no_grad)
    class_logits = jax.lax.stop_gradient(class_logits)
    mask_logits = jax.lax.stop_gradient(mask_logits)
    q = class_logits.shape[0]
    o = gt_masks.shape[0]
    if coords is None:
        coords = jax.random.uniform(rng, (num_points, 2))
    pred_pts = sample_mask_points(
        mask_logits, coords, precision=precision
    ).reshape(q, -1)
    if tgt_pts is None:
        tgt_pts = sample_mask_points(
            gt_masks, coords, precision=precision
        ).reshape(o, -1)

    probs = jax.nn.softmax(class_logits, axis=-1)
    cls_cost = -probs[:, jnp.clip(gt_classes, 0, probs.shape[1] - 1)]  # [Q, O]
    cost = (
        cost_mask * pairwise_sigmoid_ce(pred_pts, tgt_pts)
        + cost_class * cls_cost
        + cost_dice * pairwise_dice(pred_pts, tgt_pts)
    )
    # solve min-cost assignment of gts (rows) to queries (cols) on-device
    from siu3r_tpu.ops.lap import auction_lap

    return auction_lap(cost.T, row_valid=gt_valid)
