"""Panoptic post-processing + Gaussian label lift (jit-able redesign).

The reference post-process (image_processing_video_mask2former.py:1238-1481)
is ragged and host-side: per image it keeps a variable number of queries,
assigns segment ids in a python loop with stuff fusion, and emits a ragged
``query_class_logits`` list. Here the same math runs as dense, fixed-shape
ops (vmapped over batch, lax.scan over the 100 queries for sequential id
assignment), with kept queries packed into ``max_lift_queries`` padded slots
so everything stays jit-able; only the human-readable ``segments_info`` list
is built on the host from the dense outputs.

Semantics parity notes:
  * masks are resized to the fixed (256, 256) mask size, sigmoided, THEN
    resized to the target size (two-stage, like reference :1299-1308 +
    :1386-1391);
  * per-pixel query assignment = argmax over score-weighted kept-query
    probabilities (:1394-1403); queries failing the area/ratio checks keep
    their pixels unassigned (background), exactly like the reference loop;
  * stuff classes in ``label_ids_to_fuse`` share one segment id (:1430-1460).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from siu3r_tpu.models.layers import bilinear_resize_torch

MASK_SIZE = (256, 256)


def _resize_sigmoid_resize(ml: jax.Array, target_size: Tuple[int, int]) -> jax.Array:
    """[N, mh, mw] mask logits -> [N, th, tw] probabilities via the
    reference's two-stage path: resize to the fixed mask size, sigmoid, then
    resize to the target size (image_processing_video_mask2former.py:1299-1308
    + :1386-1391)."""
    n, mh, mw = ml.shape
    x = bilinear_resize_torch(ml[..., None], MASK_SIZE, align_corners=False)
    x = jax.nn.sigmoid(x)
    x = bilinear_resize_torch(x, target_size, align_corners=False)
    return x[..., 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "target_size",
        "label_ids_to_fuse",
        "max_lift_queries",
        "num_labels",
        "threshold",
        "mask_threshold",
        "overlap_area_threshold",
    ),
)
def panoptic_segmentation(
    class_logits: jax.Array,
    mask_logits: jax.Array,
    *,
    target_size: Tuple[int, int],
    label_ids_to_fuse: Tuple[int, ...],
    num_labels: int,
    max_lift_queries: int = 16,
    threshold: float = 0.5,
    mask_threshold: float = 0.5,
    overlap_area_threshold: float = 0.8,
    word_logits: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """class_logits [B, Q, C+1]; mask_logits [B, Q, V, h, w];
    word_logits optional [B, n_words, Q] (refer-seg restricts kept queries to
    word-argmax queries, reference :1330-1350).

    Returns dense arrays (see body) — batch axis preserved.
    """
    b, q, v, mh, mw = mask_logits.shape
    th, tw = target_size

    class_probs = jax.nn.softmax(class_logits, axis=-1)  # [B, Q, C+1]
    pred_scores = class_probs.max(axis=-1)
    pred_labels = class_probs.argmax(axis=-1)

    keep = (pred_labels != num_labels) & (pred_scores > threshold)  # [B, Q]
    if word_logits is not None:
        # preserve only queries that some word argmaxes to
        preserve = jnp.zeros((b, q), dtype=bool)
        w_arg = word_logits.argmax(axis=-1)  # [B, n_words]
        preserve = preserve.at[
            jnp.arange(b)[:, None], w_arg
        ].set(True)
        keep = keep & preserve

    # Score-weighted argmax over kept queries, chunked over Q so the
    # [B, Q, V, th, tw] full-res probability tensor is never materialized
    # (round-1 B=4 throughput regression, VERDICT weak #3). A lax.scan
    # carries the running (max, argmax); strict > keeps the first index of
    # ties exactly like jnp.argmax over the full axis.
    chunk = min(q, 16)
    nch = -(-q // chunk)
    qp = nch * chunk
    pad = qp - q
    ml_p = jnp.pad(mask_logits, ((0, 0), (0, pad)) + ((0, 0),) * 3)
    sc_p = jnp.pad(pred_scores, ((0, 0), (0, pad)))
    kp_p = jnp.pad(keep, ((0, 0), (0, pad)))  # padded queries: keep=False
    ml_c = ml_p.reshape(b, nch, chunk, v, mh, mw).transpose(1, 0, 2, 3, 4, 5)
    sc_c = sc_p.reshape(b, nch, chunk).transpose(1, 0, 2)
    kp_c = kp_p.reshape(b, nch, chunk).transpose(1, 0, 2)
    q0s = jnp.arange(nch, dtype=jnp.int32) * chunk

    def argmax_body(carry, inp):
        best_val, best_q = carry
        ml_i, sc_i, kp_i, q0 = inp
        probs = _resize_sigmoid_resize(
            ml_i.reshape(b * chunk * v, mh, mw), (th, tw)
        ).reshape(b, chunk, v, th, tw)
        w_i = probs * sc_i[:, :, None, None, None]
        orig_area = (w_i >= mask_threshold).sum(axis=(2, 3, 4))  # [B, chunk]
        wm = jnp.where(kp_i[:, :, None, None, None], w_i, -1.0)
        cmax = wm.max(axis=1)
        carg = (wm.argmax(axis=1) + q0).astype(jnp.int32)
        upd = cmax > best_val
        best_val = jnp.where(upd, cmax, best_val)
        best_q = jnp.where(upd, carg, best_q)
        return (best_val, best_q), orig_area

    init = (
        jnp.full((b, v, th, tw), -1.0, jnp.float32),
        jnp.zeros((b, v, th, tw), jnp.int32),
    )
    (_, pixel_query), orig_area_c = jax.lax.scan(
        argmax_body, init, (ml_c, sc_c, kp_c, q0s)
    )
    original_area_all = orig_area_c.transpose(1, 0, 2).reshape(b, qp)[:, :q]

    fuse_mask = jnp.zeros((num_labels + 1,), dtype=bool)
    for lbl in label_ids_to_fuse:
        fuse_mask = fuse_mask.at[lbl].set(True)

    def per_item(keep_i, labels_i, scores_i, original_area, pixel_query_i):
        # pixels assigned per query: scatter-add histogram of the argmax map
        # (== (pixel_query == k).sum() for each k), zeroed for non-kept
        # queries exactly like the reference's `assigned & keep` (:1408)
        counts = jnp.zeros((q,), jnp.int32).at[pixel_query_i.reshape(-1)].add(
            1, mode="drop"
        )
        mask_area = jnp.where(keep_i, counts, 0)
        ratio = mask_area / jnp.maximum(original_area, 1)
        exists = (
            keep_i
            & (mask_area > 0)
            & (original_area > 0)
            & (ratio > overlap_area_threshold)
        )

        # sequential segment-id assignment with stuff fusion (lax.scan over
        # queries, mirroring the reference's python loop :1408-1460)
        def assign(carry, k):
            current_id, stuff_mem = carry
            lbl = labels_i[k]
            fuse = fuse_mask[lbl]
            ex = exists[k]
            mem_id = stuff_mem[lbl]
            reuse = ex & (mem_id > 0)
            new_id = current_id + 1
            seg_id = jnp.where(ex, jnp.where(reuse, mem_id, new_id), 0)
            current_id = jnp.where(ex & ~reuse, new_id, current_id)
            write = ex & fuse & (mem_id == 0)
            stuff_mem = jnp.where(
                write, stuff_mem.at[lbl].set(seg_id), stuff_mem
            )
            return (current_id, stuff_mem), seg_id

        (_, _), seg_ids = jax.lax.scan(
            assign,
            (jnp.int32(0), jnp.zeros((num_labels + 1,), jnp.int32)),
            jnp.arange(q),
        )

        # per-pixel maps; -1 fill ONLY when no query passes the keep
        # threshold (reference :1351-1375 empty fallback); kept-but-no-
        # segment images stay 0-filled (:1379-1383)
        pix_exists = exists[pixel_query_i]  # [V, H, W]
        segmentation = jnp.where(pix_exists, seg_ids[pixel_query_i], 0)
        segmentation = jnp.where(keep_i.any(), segmentation, -1)
        semantic = jnp.where(pix_exists, labels_i[pixel_query_i] + 1, 0)

        # packed lift slots in kept order (reference keep_querys :1457)
        slot = jnp.where(exists, jnp.cumsum(exists) - 1, q + max_lift_queries)
        lifted = exists & (slot < max_lift_queries)
        return (
            exists,
            seg_ids,
            segmentation.astype(jnp.int32),
            semantic.astype(jnp.int32),
            slot,
            lifted,
        )

    exists, seg_ids, segmentation, semantic, slot, lifted = jax.vmap(per_item)(
        keep, pred_labels, pred_scores, original_area_all, pixel_query
    )

    # gather kept queries into padded lift slots, resizing ONLY the
    # <= max_lift_queries lifted masks to full res (the scatter formulation
    # needed all Q full-res masks live)
    s = max_lift_queries

    def pack(slot_i, lifted_i, class_probs_i, ml_i, scores_i):
        tgt = jnp.where(lifted_i, slot_i, s)  # OOB drops
        lift_q = jnp.zeros((s,), jnp.int32).at[tgt].set(
            jnp.arange(q, dtype=jnp.int32), mode="drop"
        )
        valid = jnp.zeros((s,), bool).at[tgt].set(lifted_i, mode="drop")
        sel = ml_i[lift_q]  # [S, V, mh, mw] logits
        probs = _resize_sigmoid_resize(
            sel.reshape(s * v, mh, mw), (th, tw)
        ).reshape(s, v, th, tw)
        qc_mask = jnp.where(valid[:, None, None, None], probs, 0.0)
        qc_class = jnp.where(valid[:, None], class_probs_i[lift_q], 0.0)
        qscores = jnp.where(valid, scores_i[lift_q], 0.0)
        # empty fallback: single pseudo-query, no-object prob 1
        # (reference :1363-1374)
        none_kept = ~lifted_i.any()
        qc_class = jnp.where(
            none_kept,
            jnp.zeros_like(qc_class).at[0, num_labels].set(1.0),
            qc_class,
        )
        qc_mask = jnp.where(none_kept, jnp.ones_like(qc_mask).at[1:].set(0.0), qc_mask)
        return qc_class, qc_mask, qscores, valid

    qc_class, qc_mask, query_scores, qc_valid = jax.vmap(pack)(
        slot, lifted, class_probs, mask_logits, pred_scores
    )

    return {
        "segmentation": segmentation,  # [B, V, H, W] segment ids (0 = bg)
        "semantic": semantic,  # [B, V, H, W] label+1 (0 = bg)
        "keep": keep,
        "exists": exists,  # [B, Q] query got a segment
        "seg_ids": seg_ids,  # [B, Q]
        "pred_labels": pred_labels,
        "pred_scores": pred_scores,
        "lift_slot": slot,  # [B, Q]
        "lifted": lifted,
        "qc_class_probs": qc_class,  # [B, Q_lift, C+1]
        "qc_mask_probs": qc_mask,  # [B, Q_lift, V, H, W]
        "query_scores": query_scores,  # [B, Q_lift]
        "qc_valid": qc_valid,  # [B, Q_lift]
    }


@functools.partial(
    jax.jit,
    static_argnames=("target_size", "num_labels", "num_topk", "threshold"),
)
def instance_segmentation(
    class_logits: jax.Array,
    mask_logits: jax.Array,
    *,
    target_size: Tuple[int, int],
    num_labels: int,
    num_topk: int = 10,
    threshold: float = 0.5,
) -> Dict[str, jax.Array]:
    """Instance post-processing (reference
    image_processing_video_mask2former.py:1057-1237): top-10 (query, class)
    pairs by class score, masks binarized at logit 0, mask-quality-weighted
    scores, sequential instance ids; emits the factored per-query confidence
    (class_probs, mask_probs) instead of materializing the
    [V, Q, C+1, H, W] product the reference builds (:1220-1228).
    """
    b, q, v, mh, mw = mask_logits.shape
    th, tw = target_size

    ml = mask_logits.reshape(b * q * v, mh, mw, 1)
    ml = bilinear_resize_torch(ml, MASK_SIZE, align_corners=False)
    ml = ml.reshape(b, q, v, *MASK_SIZE)

    class_probs = jax.nn.softmax(class_logits, axis=-1)
    scores = class_probs[..., :-1]  # [B, Q, C]

    def per_item(scores_i, ml_i):
        flat = scores_i.reshape(-1)  # [Q*C]
        top_scores, top_idx = jax.lax.top_k(flat, num_topk)
        top_labels = top_idx % num_labels
        top_queries = top_idx // num_labels
        sel = ml_i[top_queries]  # [K, V, 256, 256]
        binarized = (sel > 0).astype(jnp.float32)
        mask_quality = (jax.nn.sigmoid(sel) * binarized).sum(axis=(1, 2, 3)) / (
            binarized.sum(axis=(1, 2, 3)) + 1e-6
        )
        pred_scores = top_scores * mask_quality
        resized = bilinear_resize_torch(
            binarized.reshape(num_topk * v, *MASK_SIZE, 1),
            (th, tw),
            align_corners=False,
        ).reshape(num_topk, v, th, tw)
        keep = (pred_scores >= threshold) & (binarized.sum(axis=(1, 2, 3)) > 0)
        # sequential ids in top-k order; later instances overwrite overlaps
        # (reference :1186-1201 loop semantics)
        seg = jnp.full((v, th, tw), -1, jnp.int32)
        seg_id = jnp.cumsum(keep) - 1
        for j in range(num_topk):
            write = keep[j] & (resized[j] == 1.0)
            seg = jnp.where(write, seg_id[j], seg)
        return top_labels, top_queries, pred_scores, keep, seg

    labels, queries, pred_scores, keep, seg = jax.vmap(per_item)(scores, ml)
    mask_probs = jax.nn.sigmoid(
        bilinear_resize_torch(
            ml.reshape(b * q * v, *MASK_SIZE, 1), (th, tw), align_corners=False
        )
    ).reshape(b, q, v, th, tw)
    return {
        "segmentation": seg,  # [B, V, H, W], -1 background
        "labels": labels,  # [B, K]
        "queries": queries,
        "scores": pred_scores,
        "valid": keep,
        "class_probs": class_probs,  # [B, Q, C+1] (confidence factor 1)
        "mask_probs": mask_probs,  # [B, Q, V, H, W] (confidence factor 2)
    }


def qc_logits_per_pixel(result: Dict[str, jax.Array]) -> jax.Array:
    """Per-Gaussian query-class confidence: class_probs x mask_probs
    (reference :1462-1467 then model.py:252-274 rearrange to (v*h*w, q, c)).

    Returns [B, V*H*W, Q_lift, C+1].
    """
    qc_class = result["qc_class_probs"]  # [B, S, C+1]
    qc_mask = result["qc_mask_probs"]  # [B, S, V, H, W]
    b, s, v, h, w = qc_mask.shape
    prod = qc_class[:, :, None, :] * qc_mask.reshape(b, s, v * h * w)[..., None]
    # [B, S, V*H*W, C+1] -> [B, V*H*W, S, C+1]
    return prod.transpose(0, 2, 1, 3)


def segments_info(result: Dict[str, jax.Array], fuse_ids: Sequence[int]) -> List[List[dict]]:
    """Host-side segments_info list (reference results[i]["segments_info"])."""
    exists = jax.device_get(result["exists"])
    seg_ids = jax.device_get(result["seg_ids"])
    labels = jax.device_get(result["pred_labels"])
    scores = jax.device_get(result["pred_scores"])
    fuse = set(int(x) for x in fuse_ids)
    out = []
    for bi in range(exists.shape[0]):
        infos = []
        for k in range(exists.shape[1]):
            if not exists[bi, k]:
                continue
            lbl = int(labels[bi, k])
            infos.append(
                {
                    "id": int(seg_ids[bi, k]),
                    "label_id": lbl,
                    "was_fused": lbl in fuse,
                    "score": round(float(scores[bi, k]), 6),
                }
            )
        out.append(infos)
    return out
