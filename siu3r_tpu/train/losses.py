"""Training losses (reference parity).

Segmentation criterion mirrors VideoMask2FormerLoss
(video_seg_decoder.py:230-604): Hungarian-matched CE over classes with
no-object weight 0.1, point-sampled sigmoid-BCE + dice mask losses with
uncertainty-based sampling (12544 pts, oversample 3.0, importance 0.75),
repeated for every auxiliary decoder layer.

Pipeline losses mirror src/pipeline.py: seg x0.05, instance-masked depth
smoothness x0.05 (:242-265), MSE render + 0.5*LPIPS at half resolution
(:337-364).

All shapes static: GT objects are padded to a fixed ``O`` with a validity
mask; matching runs fully on-device (auction LAP, ops/lap.py); point
sampling rides the MXU via separable 2-tap contractions
(ops/deformable.grid_sample_separable).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from siu3r_tpu.ops.deformable import grid_sample_separable
from siu3r_tpu.train.matcher import (
    hungarian_match,
    largest_divisor_leq,
    sample_mask_points,
)


def _sample_points_one_mask(logits_hw, rng, num_points, oversample, importance,
                            pre_coords=None, extra_coords=None):
    """Uncertainty-based point sampling for ONE mask [H, W]
    (reference :444-506). Returns [num_points, 2] (x, y) in [0, 1].
    ``pre_coords`` [n_sampled, 2] / ``extra_coords`` [n_random, 2] override
    the two random draws (parity tests inject the reference's points).

    Note: re-using the uncertainty-pass logit samples for the picked points
    (instead of re-sampling at the final coords) was tried in round 3 and
    REVERTED: it wires the 3x-larger uncertainty sampling into the
    differentiated graph, whose VJP then transposes the full 37632-point
    sampling — mask losses measured 40% slower (788 -> 1102 ms fwd,
    +460 ms grad). Re-sampling keeps the uncertainty pass gradient-free
    (top_k indices are non-differentiable) so XLA drops it from the
    backward entirely."""
    n_sampled = int(num_points * oversample)
    coords = (
        pre_coords if pre_coords is not None
        else jax.random.uniform(rng, (n_sampled, 2))
    )
    vals = grid_sample_separable(
        logits_hw[None, :, :, None], (2.0 * coords - 1.0)[None]
    )[0, :, 0]
    uncertainty = -jnp.abs(vals)
    n_uncertain = int(importance * num_points)
    n_random = num_points - n_uncertain
    if pre_coords is not None:
        # parity path: bit-exact selection vs the reference's torch.topk
        _, idx = jax.lax.top_k(uncertainty, n_uncertain)
    else:
        # training path: TPU-native approximate top-k. Exact top_k over the
        # 37632 candidates is the single most expensive op in the criterion
        # (~37 ms/layer of the 79 ms mask losses, round-3 microbench); the
        # candidates are uniform RANDOM points, so swapping <=5% of the
        # selected set for near-threshold neighbours is training-noise-level
        _, idx = jax.lax.approx_max_k(
            uncertainty, n_uncertain, recall_target=0.95
        )
    picked = coords[idx]
    if extra_coords is not None:
        extra = extra_coords
    else:
        rng2 = jax.random.fold_in(rng, 1)
        extra = jax.random.uniform(rng2, (n_random, 2))
    return jnp.concatenate([picked, extra], axis=0)


def _mask_losses_item(
    mask_logits,  # [Q, V, h, w]
    gt_masks,  # [O, V, H, W]
    assignment,  # [O] query per gt (-1 invalid)
    rng,
    num_points: int,
    oversample: float,
    importance: float,
    pre_coords=None,  # [O*V, n_sampled, 2] injected (parity tests)
    extra_coords=None,  # [O*V, n_random, 2]
    row_chunk: int = 16,
):
    """Returns (ce_sum, dice_sum) over this item's matched (gt, view) rows
    — reference loss_masks (:343-409) treats each matched (mask, frame) as a
    row; normalization by num_masks happens at batch level."""
    o, v = gt_masks.shape[0], gt_masks.shape[1]
    valid = assignment >= 0
    a = jnp.clip(assignment, 0)
    pred = mask_logits[a]  # [O, V, h, w]

    rows_pred = pred.reshape(o * v, *pred.shape[2:])
    rows_tgt = gt_masks.reshape(o * v, *gt_masks.shape[2:])
    rows_valid = jnp.repeat(valid, v)
    rngs = jax.random.split(rng, o * v)

    def per_row(logits_hw, tgt_hw, key, pre=None, extra=None):
        coords = _sample_points_one_mask(
            logits_hw, key, num_points, oversample, importance,
            pre_coords=pre, extra_coords=extra,
        )
        # uncertainty-point selection must not leak gradients into the
        # re-sample below (reference: point_coords from a no-grad block)
        coords = jax.lax.stop_gradient(coords)
        grid = (2.0 * coords - 1.0)[None]
        pl_ = grid_sample_separable(logits_hw[None, :, :, None], grid)[0, :, 0]
        # GT is a binary mask with no gradient: one-pass bf16 MXU sampling
        # (~6x faster at 256^2) perturbs the loss target by <=4e-3 — only
        # the parity path pays fp32 (grid_sample_separable docstring)
        tgt_precision = (
            jax.lax.Precision.HIGHEST if pre is not None
            else jax.lax.Precision.DEFAULT
        )
        tl_ = grid_sample_separable(
            tgt_hw[None, :, :, None], grid, precision=tgt_precision
        )[0, :, 0]
        tl_ = jax.lax.stop_gradient(tl_)
        ce = jnp.mean(
            jnp.maximum(pl_, 0) - pl_ * tl_ + jax.nn.softplus(-jnp.abs(pl_))
        )
        probs = jax.nn.sigmoid(pl_)
        dice = 1 - (2 * jnp.sum(probs * tl_) + 1) / (
            jnp.sum(probs) + jnp.sum(tl_) + 1
        )
        return ce, dice

    if pre_coords is not None:
        ce, dice = jax.vmap(per_row)(
            rows_pred, rows_tgt, rngs, pre_coords, extra_coords
        )
    else:
        # chunk the row sweep: one flat vmap over all O*V rows makes the
        # VJP transpose the separable point-sampling for EVERY row at once —
        # a [B, O*V, P, W] temp (3.45 GiB at the B=3 training shape, the
        # largest allocation in the step and the round-4 HBM-OOM culprit
        # once the Pallas rasterizer backward landed). lax.map over chunks
        # of 16 rows keeps that temp at chunk size (~58 MiB per item) while
        # each chunk still carries 16x12544 points of parallel work.
        n_rows = o * v
        if n_rows % row_chunk:
            # largest divisor <= row_chunk — NEVER fall back to the full
            # width: the flat vmap's transposed point-sampling temp
            # (3.45 GiB at the training shape) was the round-4 OOM, and an
            # odd query/view config must not silently reintroduce it
            row_chunk = largest_divisor_leq(n_rows, row_chunk)
        ce, dice = jax.lax.map(
            lambda args: jax.vmap(per_row)(*args),
            (
                rows_pred.reshape(-1, row_chunk, *rows_pred.shape[1:]),
                rows_tgt.reshape(-1, row_chunk, *rows_tgt.shape[1:]),
                rngs.reshape(-1, row_chunk, *rngs.shape[1:]),
            ),
        )
        ce = ce.reshape(n_rows)
        dice = dice.reshape(n_rows)
    ce = jnp.where(rows_valid, ce, 0.0).sum()
    dice = jnp.where(rows_valid, dice, 0.0).sum()
    return ce, dice


def _label_loss(
    class_logits,  # [B, Q, C+1]
    gt_classes,  # [B, O]
    assignment,  # [B, O]
    num_labels: int,
    no_object_weight: float,
):
    """Weighted CE (reference loss_labels :298-341; torch CrossEntropyLoss
    with class weights normalizes by the summed weights of the targets)."""
    b, q, _ = class_logits.shape
    target = jnp.full((b, q), num_labels, jnp.int32)
    valid = assignment >= 0
    a = jnp.clip(assignment, 0)
    bidx = jnp.arange(b)[:, None]
    target = target.at[bidx, a].set(
        jnp.where(valid, gt_classes, num_labels), mode="drop"
    )
    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    weights = jnp.where(target == num_labels, no_object_weight, 1.0)
    return (ce * weights).sum() / weights.sum()


def segmentation_loss(
    aux_class_logits: List[jax.Array],
    aux_mask_logits: List[jax.Array],
    gt_masks: jax.Array,  # [B, O, V, H, W] float binary
    gt_classes: jax.Array,  # [B, O]
    gt_valid: jax.Array,  # [B, O] bool
    rng: jax.Array,
    num_labels: int,
    class_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    no_object_weight: float = 0.1,
    num_points: int = 12544,
    oversample: float = 3.0,
    importance: float = 0.75,
    match_points: int = 12544,
    injected_coords: Optional[List[Dict[str, jax.Array]]] = None,
) -> Dict[str, jax.Array]:
    """Total criterion over the final + auxiliary decoder outputs
    (reference VideoMask2FormerLoss.forward :508-571 + weight application
    :2327-2331).

    ``injected_coords``: per-layer dicts with ``match`` [B, P, 2],
    ``pre`` [B, O*V, n_sampled, 2], ``extra`` [B, O*V, n_random, 2] —
    overrides every random draw so the criterion can be compared
    term-by-term against the reference with identical sample points
    (tests/test_criterion_parity.py).

    Random path (training): the matcher's uniform sample points are drawn
    once per item and SHARED across layers — the static GT masks are
    point-sampled once instead of once per layer (the reference redraws per
    layer, video_seg_decoder.py:136-147; sharing only correlates the
    matcher's sampling noise across layers, each layer's cost matrix stays
    an unbiased estimate of the same integral). The layer loop stays
    UNROLLED: a lax.scan variant measured 2x slower on-chip (round 3) —
    serializing the layers destroys XLA's inter-layer overlap of MXU
    matmuls with the matcher's VPU/while_loop work. The injected path keeps
    the reference's per-layer independent draws."""
    b = gt_masks.shape[0]
    num_masks = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)
    n_layers = len(aux_class_logits)
    match_fn = functools.partial(
        hungarian_match,
        num_points=match_points,
        cost_class=1.0,
        cost_mask=mask_weight,
        cost_dice=dice_weight,
    )
    loss_fn = functools.partial(
        _mask_losses_item,
        num_points=num_points,
        oversample=oversample,
        importance=importance,
    )
    losses: Dict[str, jax.Array] = {}

    if injected_coords is not None:
        # parity path: reference-identical per-layer draws, unrolled
        total = 0.0
        for li, (cls_l, msk_l) in enumerate(
            zip(aux_class_logits, aux_mask_logits)
        ):
            inj = injected_coords[li]
            rng_layer = jax.random.fold_in(rng, li)
            match_rngs = jax.random.split(jax.random.fold_in(rng_layer, 0), b)
            assignment = jax.vmap(
                lambda c, m, gm, gc, gv, r, mc: match_fn(
                    c, m, gm, gc, gv, r, coords=mc
                )
            )(cls_l, msk_l, gt_masks, gt_classes, gt_valid, match_rngs,
              inj["match"])
            mask_rngs = jax.random.split(jax.random.fold_in(rng_layer, 1), b)
            ce_sum, dice_sum = jax.vmap(
                lambda m, gm, a, r, pre, extra: loss_fn(
                    m, gm, a, r, pre_coords=pre, extra_coords=extra
                )
            )(msk_l, gt_masks, assignment, mask_rngs, inj["pre"], inj["extra"])
            loss_mask = ce_sum.sum() / num_masks
            loss_dice = dice_sum.sum() / num_masks
            loss_ce = _label_loss(
                cls_l, gt_classes, assignment, num_labels, no_object_weight
            )
            suffix = "" if li == n_layers - 1 else f"_{li}"
            losses[f"loss_mask{suffix}"] = loss_mask
            losses[f"loss_dice{suffix}"] = loss_dice
            losses[f"loss_cross_entropy{suffix}"] = loss_ce
            total = total + (
                mask_weight * loss_mask
                + dice_weight * loss_dice
                + class_weight * loss_ce
            )
        losses["seg_total"] = total
        return losses

    # training path: shared match points, GT sampled once, layers unrolled
    from siu3r_tpu.train.matcher import sample_mask_points

    # the matcher is a no-grad assignment heuristic (reference @torch.no_grad
    # matcher): one-pass bf16 MXU sampling is ample for its cost matrix
    match_prec = jax.lax.Precision.DEFAULT
    match_rng = jax.random.fold_in(rng, 1000)
    match_coords = jax.random.uniform(match_rng, (b, match_points, 2))
    tgt_pts = jax.vmap(
        lambda gm, c: sample_mask_points(
            gm, c, precision=match_prec
        ).reshape(gm.shape[0], -1)
    )(gt_masks, match_coords)  # [B, O, V*P]

    # the point-loss body is wrapped in jax.checkpoint: its live residuals
    # (the one-hot interpolation rows over 37632 candidate points per
    # matched object) would otherwise be stored for all 10 unrolled layers
    # at once — ~1 GB of the train step's 16.2 GiB peak, which OOMs the
    # 16 GB v5e chip (round-3 memory_analysis). The matcher stays OUTSIDE
    # the checkpoint: it is stop_gradient (no residuals to store) and
    # rematerializing it would re-run the auction while_loop in the
    # backward for nothing.
    ckpt_point_losses = jax.checkpoint(
        lambda m, gm, a, r: jax.vmap(loss_fn)(m, gm, a, r)
    )

    total = 0.0
    for li, (cls_l, msk_l) in enumerate(
        zip(aux_class_logits, aux_mask_logits)
    ):
        rng_layer = jax.random.fold_in(rng, li)
        assignment = jax.vmap(
            lambda c, m, gm, gc, gv, mc, tp: match_fn(
                c, m, gm, gc, gv, None, coords=mc, tgt_pts=tp,
                precision=match_prec,
            )
        )(cls_l, msk_l, gt_masks, gt_classes, gt_valid, match_coords, tgt_pts)
        mask_rngs = jax.random.split(jax.random.fold_in(rng_layer, 1), b)
        ce_sum, dice_sum = ckpt_point_losses(
            msk_l, gt_masks, assignment, mask_rngs
        )
        loss_mask = ce_sum.sum() / num_masks
        loss_dice = dice_sum.sum() / num_masks
        loss_ce = _label_loss(
            cls_l, gt_classes, assignment, num_labels, no_object_weight
        )
        suffix = "" if li == n_layers - 1 else f"_{li}"
        losses[f"loss_mask{suffix}"] = loss_mask
        losses[f"loss_dice{suffix}"] = loss_dice
        losses[f"loss_cross_entropy{suffix}"] = loss_ce
        total = total + (
            mask_weight * loss_mask
            + dice_weight * loss_dice
            + class_weight * loss_ce
        )
    losses["seg_total"] = total
    return losses


def depth_smoothness_loss(
    depth: jax.Array, seg_mask: jax.Array, instance_masked: bool = True
) -> jax.Array:
    """Instance-masked depth smoothness (reference pipeline.py:242-265).

    depth [B, N, H, W] rendered depth at context views; seg_mask [B, N, H, W]
    segment ids (-1 = invalid fill). ``instance_masked=False`` drops the
    segment gating and penalizes all depth gradients — the
    ``enable_instance_depth_smoothness`` config toggle (the reference
    DECLARES that flag, config.py:117, but never reads it; we wire it as the
    name says: it gates the instance masking)."""
    depth_dx = jnp.diff(depth, axis=-1)
    depth_dy = jnp.diff(depth, axis=-2)
    if not instance_masked:
        return jnp.abs(depth_dx).mean() + jnp.abs(depth_dy).mean()
    same_x = jnp.diff(seg_mask, axis=-1) == 0
    same_x &= seg_mask[..., :, 1:] != -1
    same_y = jnp.diff(seg_mask, axis=-2) == 0
    same_y &= seg_mask[..., 1:, :] != -1
    same_x = jax.lax.stop_gradient(same_x)
    same_y = jax.lax.stop_gradient(same_y)
    return (
        jnp.abs(depth_dx * same_x).mean() + jnp.abs(depth_dy * same_y).mean()
    )


def mse_render_loss(render: jax.Array, target: jax.Array) -> jax.Array:
    """Plain MSE (torchmetrics MeanSquaredError over all elements)."""
    return jnp.mean((render - target) ** 2)


def refer_word_match_loss(word_logits: jax.Array, assignment: jax.Array, gt_valid: jax.Array) -> jax.Array:
    """Referring-expression loss (reference refer_seg_forward
    video_seg_decoder.py:573-594): CE between word/query similarity logits
    and the matched query index. word_logits [B, W, Q]; assignment [B, O]
    with word i <-> object i. Normalization matches the reference exactly:
    ``F.cross_entropy`` (mean over an item's words) accumulated with ``+=``
    over the batch — i.e. per-item mean, summed over items."""
    b, nw, q = word_logits.shape
    target = jnp.clip(assignment[:, :nw], 0)
    valid = (assignment[:, :nw] >= 0) & gt_valid[:, :nw]
    logp = jax.nn.log_softmax(word_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    per_item = jnp.where(valid, ce, 0.0).sum(axis=1) / jnp.maximum(
        valid.sum(axis=1), 1
    )
    return per_item.sum()
