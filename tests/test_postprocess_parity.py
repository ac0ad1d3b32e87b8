"""Dense jit-able panoptic post-process vs the reference's ragged host
implementation (VideoMask2FormerImageProcessor.post_process_panoptic_segmentation,
loaded from /root/reference as the golden oracle)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_processor():
    sys.path.insert(0, str(REF))
    from src.models.mask2former.image_processing_video_mask2former import (
        VideoMask2FormerImageProcessor,
    )

    return VideoMask2FormerImageProcessor()


class _Out:
    def __init__(self, cls, masks):
        self.class_queries_logits = cls
        self.masks_queries_logits = masks


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_panoptic_parity(ref_processor, seed):
    import jax.numpy as jnp

    from siu3r_tpu.models.mask2former.postprocess import (
        panoptic_segmentation,
        segments_info,
    )

    rng = np.random.RandomState(seed)
    b, q, v, mh, mw = 2, 12, 2, 16, 16
    num_labels = 6
    h = w = 64
    cls = rng.randn(b, q, num_labels + 1).astype(np.float32) * 2
    masks = rng.randn(b, q, v, mh, mw).astype(np.float32) * 2
    fuse = (0, 1)

    ref = ref_processor.post_process_panoptic_segmentation(
        outputs=_Out(torch.from_numpy(cls), torch.from_numpy(masks)),
        threshold=0.5,
        target_sizes=[(h, w)] * b,
        label_ids_to_fuse=set(fuse),
    )

    ours = panoptic_segmentation(
        jnp.asarray(cls),
        jnp.asarray(masks),
        target_size=(h, w),
        label_ids_to_fuse=fuse,
        num_labels=num_labels,
        max_lift_queries=8,
        threshold=0.5,
    )
    infos = segments_info(ours, fuse)

    for bi in range(b):
        ref_seg = ref[bi]["segmentation"].numpy()
        our_seg = np.asarray(ours["segmentation"][bi])
        np.testing.assert_array_equal(our_seg, ref_seg.astype(np.int32))

        ref_info = ref[bi]["segments_info"]
        our_info = infos[bi]
        assert len(ref_info) == len(our_info)
        for r, o in zip(ref_info, our_info):
            assert r["id"] == o["id"]
            assert r["label_id"] == o["label_id"]
            assert r["was_fused"] == o["was_fused"]
            assert abs(r["score"] - o["score"]) < 1e-4

        # query-class confidence: compare the per-slot product tensors for
        # the kept queries (reference returns [V, K, C+1, H, W])
        ref_qc = ref[bi]["query_class_logits"].numpy()
        n_kept = int(np.asarray(ours["qc_valid"][bi]).sum())
        if ref_qc.shape[1] != 1 or len(ref_info) > 0:
            assert n_kept == ref_qc.shape[1]
            our_qc_mask = np.asarray(ours["qc_mask_probs"][bi])  # [S, V, H, W]
            our_qc_class = np.asarray(ours["qc_class_probs"][bi])  # [S, C+1]
            prod = our_qc_class[:n_kept, None, :, None, None] * our_qc_mask[
                :n_kept, :, None
            ]  # [K, V, C+1, H, W]
            np.testing.assert_allclose(
                prod.transpose(1, 0, 2, 3, 4), ref_qc, atol=1e-5
            )
        sc = np.asarray(ours["query_scores"][bi])[:n_kept]
        ref_sc = ref[bi]["query_scores"]
        if len(ref_info) > 0:
            np.testing.assert_allclose(sc, np.asarray(ref_sc), atol=1e-4)
