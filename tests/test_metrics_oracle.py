"""Randomized cross-checks of eval/metrics.py against brute-force oracles
written directly from the metric definitions (VERDICT round-1 item #6).

The reference computes PQ and mask-mAP via torchmetrics (src/evaluator.py:
32-106), which is not installed here; these oracles follow the published
definitions instead:
  * PQ — Kirillov et al. "Panoptic Segmentation": segments keyed by
    (category, instance), matches = same-category pairs with IoU > 0.5
    (void pixels removed from the union; a theorem guarantees uniqueness,
    which the oracle asserts rather than assumes), unmatched predictions
    with > 50% void overlap ignored, PQ_c = sum(IoU) / (TP + FP/2 + FN/2).
  * AP — COCO conventions: per-image greedy matching in descending score
    order at IoU thresholds 0.50:0.05:0.95, global PR curve, 101-point
    interpolated precision computed as a direct max-scan (the
    implementation uses the envelope + searchsorted formulation).

Documented deviations from pycocotools (PARITY.md): no maxDets truncation
(the model emits <= 100 queries total, the limit is unreachable), no area
ranges, no crowd handling (datasets carry none).
"""

import numpy as np
import pytest

from siu3r_tpu.eval.metrics import MeanAveragePrecision, PanopticQuality

THINGS = (3, 4, 5, 6)
STUFFS = (1, 2)
KNOWN = set(THINGS) | set(STUFFS)


# ---------------------------------------------------------------- PQ oracle


def _oracle_segments(sem, ins, things, stuffs):
    segs = {}
    for c in stuffs:
        m = sem == c
        if m.any():
            segs[(c, "stuff")] = m
    for c in things:
        cm = sem == c
        for iid in np.unique(ins[cm]) if cm.any() else []:
            segs[(c, int(iid))] = cm & (ins == iid)
    return segs


def oracle_pq(pairs, things, stuffs):
    """pairs: list of (pred [H,W,2], target [H,W,2]). Returns
    {cat: pq} over categories observed (gt segment or counted FP)."""
    cats = sorted(set(things) | set(stuffs))
    iou_sum = {c: 0.0 for c in cats}
    tp = {c: 0 for c in cats}
    fp = {c: 0 for c in cats}
    fn = {c: 0 for c in cats}
    seen = set()
    for pred, target in pairs:
        psem, pins = pred[..., 0], pred[..., 1]
        tsem, tins = target[..., 0], target[..., 1]
        void = ~np.isin(tsem, cats)
        gt = _oracle_segments(tsem, tins, things, stuffs)
        pr = _oracle_segments(psem, pins, things, stuffs)
        # all same-category matches with IoU > 0.5 (void-subtracted union)
        matches = []
        for gk, gm in gt.items():
            for pk, pm in pr.items():
                if pk[0] != gk[0]:
                    continue
                inter = (gm & pm).sum()
                union = (gm | pm).sum() - (pm & void).sum()
                if union > 0 and inter / union > 0.5:
                    matches.append((gk, pk, inter / union))
        # uniqueness theorem: no segment participates in two matches
        gks = [m[0] for m in matches]
        pks = [m[1] for m in matches]
        assert len(gks) == len(set(gks)) and len(pks) == len(set(pks))
        for gk, pk, iou in matches:
            tp[gk[0]] += 1
            iou_sum[gk[0]] += iou
        for gk, gm in gt.items():
            seen.add(gk[0])
            if gk not in gks:
                fn[gk[0]] += 1
        for pk, pm in pr.items():
            if pk in pks:
                continue
            if (pm & void).sum() / max(pm.sum(), 1) > 0.5:
                continue
            fp[pk[0]] += 1
            seen.add(pk[0])
    out = {}
    for c in cats:
        if c not in seen:
            continue
        denom = tp[c] + 0.5 * fp[c] + 0.5 * fn[c]
        out[c] = iou_sum[c] / denom if denom > 0 else 0.0
    return out


def _random_panoptic(rng, h=24, w=24):
    """Random (semantic, instance) map: blobby rectangles over background."""
    sem = np.zeros((h, w), np.int64)
    ins = np.zeros((h, w), np.int64)
    # occasionally emit an unknown category (void in gt, ignored in pred)
    cat_pool = list(KNOWN) + [9]
    for k in range(rng.randint(1, 7)):
        c = cat_pool[rng.randint(len(cat_pool))]
        y0, x0 = rng.randint(0, h - 2), rng.randint(0, w - 2)
        y1, x1 = rng.randint(y0 + 1, h), rng.randint(x0 + 1, w)
        sem[y0:y1, x0:x1] = c
        ins[y0:y1, x0:x1] = k + 1 if c in THINGS else 0
    return np.stack([sem, ins], axis=-1)


@pytest.mark.parametrize("chunk", range(4))
def test_pq_fuzz(chunk):
    rng = np.random.RandomState(100 + chunk)
    for _ in range(60):
        n_imgs = rng.randint(1, 4)
        pairs = [
            (_random_panoptic(rng), _random_panoptic(rng)) for _ in range(n_imgs)
        ]
        metric = PanopticQuality(THINGS, STUFFS)
        for p, t in pairs:
            metric.update(p, t)
        ours = metric.compute()
        oracle = oracle_pq(pairs, THINGS, STUFFS)
        expected = np.array([oracle[c] for c in sorted(oracle)])
        np.testing.assert_allclose(np.sort(ours), np.sort(expected), atol=1e-12)
        assert len(ours) == len(expected)


# ---------------------------------------------------------------- AP oracle


def _iou_masks(a, b):
    inter = (a & b).sum()
    union = (a | b).sum()
    return inter / union if union else 0.0


def oracle_ap(preds, gts, ious=np.arange(0.5, 1.0, 0.05)):
    """Definition-direct COCO AP. preds/gts: lists per image of dicts with
    masks [N,H,W] bool, labels [N], (preds) scores [N]."""
    classes = sorted(
        {int(c) for e in preds for c in e["labels"]}
        | {int(c) for e in gts for c in e["labels"]}
    )
    grid = np.linspace(0, 1, 101)
    per_class = {}
    for c in classes:
        n_gt = sum(int((g["labels"] == c).sum()) for g in gts)
        if n_gt == 0:
            continue
        ap_per_thr = []
        for thr in ious:
            rows = []  # (score, matched)
            for p, g in zip(preds, gts):
                pi = np.where(p["labels"] == c)[0]
                gi = np.where(g["labels"] == c)[0]
                order = pi[np.argsort(-p["scores"][pi], kind="stable")]
                taken = set()
                for d in order:
                    best_iou, best_g = thr, None
                    for gg in gi:
                        if gg in taken:
                            continue
                        iou = _iou_masks(p["masks"][d], g["masks"][gg])
                        if iou >= best_iou:
                            best_iou, best_g = iou, gg
                    if best_g is not None:
                        taken.add(best_g)
                        rows.append((p["scores"][d], True))
                    else:
                        rows.append((p["scores"][d], False))
            rows.sort(key=lambda r: -r[0])
            tp = fp = 0
            pr = []  # (recall, precision)
            for _, ok in rows:
                tp += ok
                fp += not ok
                pr.append((tp / n_gt, tp / (tp + fp)))
            # interpolated precision by direct max-scan
            interp = []
            for r in grid:
                vals = [p for (rc, p) in pr if rc >= r]
                interp.append(max(vals) if vals else 0.0)
            ap_per_thr.append(float(np.mean(interp)))
        per_class[c] = ap_per_thr
    if not per_class:
        return {"map": -1.0, "map_50": -1.0, "map_75": -1.0}
    return {
        "map": float(np.mean([np.mean(v) for v in per_class.values()])),
        "map_50": float(np.mean([v[0] for v in per_class.values()])),
        "map_75": float(np.mean([v[5] for v in per_class.values()])),
    }


def _random_instances(rng, h=16, w=16, with_scores=False, max_n=6):
    n = rng.randint(0, max_n + 1)
    masks = np.zeros((n, h, w), bool)
    for i in range(n):
        y0, x0 = rng.randint(0, h - 2), rng.randint(0, w - 2)
        y1, x1 = rng.randint(y0 + 1, h), rng.randint(x0 + 1, w)
        masks[i, y0:y1, x0:x1] = True
    out = {"masks": masks, "labels": rng.randint(1, 4, n)}
    if with_scores:
        out["scores"] = rng.rand(n)
    return out


@pytest.mark.parametrize("chunk", range(4))
def test_map_fuzz(chunk):
    rng = np.random.RandomState(200 + chunk)
    for _ in range(60):
        n_imgs = rng.randint(1, 4)
        preds = [_random_instances(rng, with_scores=True) for _ in range(n_imgs)]
        gts = [_random_instances(rng) for _ in range(n_imgs)]
        metric = MeanAveragePrecision()
        for p, g in zip(preds, gts):
            metric.update(p, g)
        ours = metric.compute()
        ref = oracle_ap(preds, gts)
        for k in ("map", "map_50", "map_75"):
            np.testing.assert_allclose(ours[k], ref[k], atol=1e-10, err_msg=k)
