"""Seeded criterion parity vs the reference VideoMask2FormerLoss
(VERDICT round-1 item #8; reference video_seg_decoder.py:230-604).

Every random draw in both implementations is the set of point coordinates
used for (a) the matcher cost matrix and (b) the uncertainty-sampled mask
losses. The test generates those arrays once, feeds them to the reference
by monkeypatching ``torch.rand`` (a FIFO of preplanned tensors matching the
reference's exact call order), and to our criterion through the
``injected_coords`` hooks — then asserts matcher assignments and each loss
term agree to <= 1e-4.

Row alignment: the reference's mask-loss rows are ordered (batch item,
match rank ascending by query index, view) while ours are (item, gt index,
view); the test permutes the shared row coordinates through the reference's
matcher output before handing them to our side.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not REF.exists(), reason="reference not mounted")]

B, Q, V, H, W = 2, 8, 2, 16, 16
NUM_LABELS = 5
O_B = [3, 2]  # ragged object counts; ours pads to max with a validity mask
O = max(O_B)
NUM_POINTS = 32
OVERSAMPLE = 2.0
IMPORTANCE = 0.75
N_SAMPLED = int(NUM_POINTS * OVERSAMPLE)
N_RANDOM = NUM_POINTS - int(IMPORTANCE * NUM_POINTS)


@pytest.fixture(scope="module")
def ref_loss():
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from transformers import Mask2FormerConfig

    from src.models.mask2former.video_seg_decoder import VideoMask2FormerLoss

    cfg = Mask2FormerConfig(num_labels=NUM_LABELS)
    cfg.train_num_points = NUM_POINTS
    cfg.oversample_ratio = OVERSAMPLE
    cfg.importance_sample_ratio = IMPORTANCE
    return VideoMask2FormerLoss(cfg, weight_dict={})


class _RandQueue:
    """torch.rand replacement returning preplanned tensors in call order."""

    def __init__(self, arrays):
        self.queue = [torch.from_numpy(a.copy()) for a in arrays]

    def __call__(self, *shape, **kw):
        if shape and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        t = self.queue.pop(0)
        assert tuple(t.shape) == tuple(shape), (t.shape, shape)
        return t


@pytest.mark.parametrize("seed", [0, 1])
def test_criterion_parity(ref_loss, seed, monkeypatch):
    import jax.numpy as jnp
    import jax

    from siu3r_tpu.train.losses import segmentation_loss

    rng = np.random.RandomState(seed)
    cls_np = (rng.randn(B, Q, NUM_LABELS + 1) * 2).astype(np.float32)
    msk_np = (rng.randn(B, Q, V, H, W) * 2).astype(np.float32)
    gt_masks_np = np.zeros((B, O, V, H, W), np.float32)
    gt_classes_np = np.zeros((B, O), np.int32)
    gt_valid_np = np.zeros((B, O), bool)
    mask_labels, class_labels = [], []
    for i, ob in enumerate(O_B):
        m = (rng.rand(ob, V, H, W) > 0.6).astype(np.float32)
        c = rng.randint(0, NUM_LABELS, ob)
        gt_masks_np[i, :ob] = m
        gt_classes_np[i, :ob] = c
        gt_valid_np[i, :ob] = True
        mask_labels.append(torch.from_numpy(m))
        class_labels.append(torch.from_numpy(c.astype(np.int64)))

    # shared random draws
    match_coords = rng.rand(B, NUM_POINTS, 2).astype(np.float32)
    total_rows = sum(O_B) * V
    pre_ref = rng.rand(total_rows, N_SAMPLED, 2).astype(np.float32)
    extra_ref = rng.rand(total_rows, N_RANDOM, 2).astype(np.float32)

    # --- reference run, torch.rand fed from the FIFO (call order:
    # matcher per item [1,P,2], then loss_masks [rows,ns,2], [rows,nr,2])
    queue = _RandQueue(
        [match_coords[i:i + 1] for i in range(B)] + [pre_ref, extra_ref]
    )
    monkeypatch.setattr(torch, "rand", queue)
    with torch.no_grad():
        indices = ref_loss.matcher(
            torch.from_numpy(msk_np), torch.from_numpy(cls_np),
            mask_labels, class_labels,
        )
        # re-arm the FIFO (matcher consumed its part) and run the full loss
        queue2 = _RandQueue(
            [match_coords[i:i + 1] for i in range(B)] + [pre_ref, extra_ref]
        )
        monkeypatch.setattr(torch, "rand", queue2)
        ref_out = ref_loss(
            torch.from_numpy(msk_np), torch.from_numpy(cls_np),
            mask_labels, class_labels,
        )
    assert not queue2.queue, "reference consumed fewer rand draws than planned"

    # --- our run: permute the reference's row coords from (item, rank, view)
    # to (item, gt index, view)
    pre_ours = np.zeros((B, O * V, N_SAMPLED, 2), np.float32)
    extra_ours = np.zeros((B, O * V, N_RANDOM, 2), np.float32)
    offset = 0
    for i, (src, tgt) in enumerate(indices):
        for rank, t in enumerate(tgt.numpy()):
            for vi in range(V):
                pre_ours[i, t * V + vi] = pre_ref[(offset + rank) * V + vi]
                extra_ours[i, t * V + vi] = extra_ref[(offset + rank) * V + vi]
        offset += len(tgt)

    injected = [{
        "match": jnp.asarray(match_coords),
        "pre": jnp.asarray(pre_ours),
        "extra": jnp.asarray(extra_ours),
    }]
    ours = segmentation_loss(
        [jnp.asarray(cls_np)], [jnp.asarray(msk_np)],
        jnp.asarray(gt_masks_np), jnp.asarray(gt_classes_np),
        jnp.asarray(gt_valid_np), jax.random.PRNGKey(0),
        num_labels=NUM_LABELS,
        num_points=NUM_POINTS, oversample=OVERSAMPLE, importance=IMPORTANCE,
        match_points=NUM_POINTS,
        injected_coords=injected,
    )

    # matcher agreement: same (gt, query) pairs (checked via our losses
    # being computed on the same rows — and directly:)
    from siu3r_tpu.train.matcher import hungarian_match

    for i, (src, tgt) in enumerate(indices):
        ref_pairs = {(int(t), int(s)) for s, t in zip(src, tgt)}
        ours_assign = hungarian_match(
            jnp.asarray(cls_np[i]), jnp.asarray(msk_np[i]),
            jnp.asarray(gt_masks_np[i]), jnp.asarray(gt_classes_np[i]),
            jnp.asarray(gt_valid_np[i]), jax.random.PRNGKey(0),
            num_points=NUM_POINTS, coords=jnp.asarray(match_coords[i]),
        )
        our_pairs = {
            (k, int(q)) for k, q in enumerate(np.asarray(ours_assign))
            if q >= 0 and gt_valid_np[i, k]
        }
        assert our_pairs == ref_pairs, f"item {i}"

    np.testing.assert_allclose(
        float(ours["loss_cross_entropy"]),
        float(ref_out["loss_cross_entropy"]), atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(ours["loss_mask"]), float(ref_out["loss_mask"]),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(ours["loss_dice"]), float(ref_out["loss_dice"]),
        atol=1e-4, rtol=1e-4,
    )


def test_chunked_rows_match_flat_vmap():
    """The lax.map row-chunking in the training path (HBM-OOM fix: keeps
    the VJP's transposed point-sampling temp at chunk granularity) must be
    value-identical to the flat vmap — rows are independent and the rng
    split order is unchanged."""
    import jax
    import jax.numpy as jnp

    from siu3r_tpu.train.losses import _mask_losses_item

    rng = np.random.RandomState(0)
    o, v, q, h, w = 16, 2, 8, 16, 16  # o*v=32 -> two chunks of 16
    mask_logits = jnp.asarray(rng.randn(q, v, h, w).astype(np.float32))
    gt_masks = jnp.asarray((rng.rand(o, v, h, w) > 0.6).astype(np.float32))
    assignment = jnp.asarray(rng.randint(-1, q, (o,)), jnp.int32)
    key = jax.random.PRNGKey(3)
    kw = dict(num_points=16, oversample=2.0, importance=0.75)
    ce_c, dice_c = _mask_losses_item(
        mask_logits, gt_masks, assignment, key, row_chunk=16, **kw
    )
    ce_f, dice_f = _mask_losses_item(
        mask_logits, gt_masks, assignment, key, row_chunk=o * v, **kw
    )
    np.testing.assert_allclose(np.asarray(ce_c), np.asarray(ce_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dice_c), np.asarray(dice_f), rtol=1e-6)


def test_odd_row_count_uses_divisor_chunk():
    """An O*V not divisible by 16 must pick the largest divisor <= 16, not
    fall back to the full flat width (ADVICE r4: the flat vmap's transposed
    point-sampling temp was the round-4 OOM)."""
    import jax
    import jax.numpy as jnp

    from siu3r_tpu.train.losses import _mask_losses_item
    from siu3r_tpu.train.matcher import largest_divisor_leq

    assert largest_divisor_leq(96, 16) == 16
    assert largest_divisor_leq(36, 16) == 12
    assert largest_divisor_leq(34, 16) == 2
    assert largest_divisor_leq(17, 16) == 1

    rng = np.random.RandomState(1)
    o, v, q, h, w = 9, 2, 8, 16, 16  # o*v=18 -> divisor chunk 9
    mask_logits = jnp.asarray(rng.randn(q, v, h, w).astype(np.float32))
    gt_masks = jnp.asarray((rng.rand(o, v, h, w) > 0.6).astype(np.float32))
    assignment = jnp.asarray(rng.randint(-1, q, (o,)), jnp.int32)
    key = jax.random.PRNGKey(4)
    kw = dict(num_points=16, oversample=2.0, importance=0.75)
    ce_c, dice_c = _mask_losses_item(
        mask_logits, gt_masks, assignment, key, row_chunk=16, **kw
    )
    ce_f, dice_f = _mask_losses_item(
        mask_logits, gt_masks, assignment, key, row_chunk=o * v, **kw
    )
    np.testing.assert_allclose(np.asarray(ce_c), np.asarray(ce_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dice_c), np.asarray(dice_f), rtol=1e-6)
