"""Instance post-process parity vs the reference
``post_process_instance_segmentation``
(/root/reference/src/models/mask2former/image_processing_video_mask2former.py:1057-1237)
— VERDICT round-1 item #7.

Scope notes (why the test is shaped this way):
  * The reference never calls this function anywhere in the repo, and it is
    shape-broken for num_queries != num_topk_queries: the confidence-map
    branch does ``mask_pred.view(num_frames * num_queries, ...)`` after
    top-k selection reduced the query axis to 10 (:1216-1220), and the
    ``P_class[None] * mask_probs[:, :, None]`` broadcast mixes the full-Q
    class axis with the top-k mask axis (:1228). The only runnable config is
    Q == num_topk_queries == 10 with target_sizes=None, which is what we
    test (target_size=(256,256) on our side — the mask-size resize is then
    the identity, matching the reference's no-resize path).
  * The reference uses ``topk(..., sorted=False)`` (:1152) — the processing
    order (and therefore segment ids and overlap overwrites) is an
    unspecified implementation detail of torch CPU topk. The test pins it to
    descending-score order by patching Tensor.topk to sorted=True, which is
    the order our lax.top_k implementation uses.
  * Even at Q == K the reference confidence map pairs class probs of query
    INDEX j with the mask of top-k RANK j (a misalignment); we reconstruct
    that exact pairing from our factored outputs to prove our pieces carry
    the same information.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_processor():
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from src.models.mask2former.image_processing_video_mask2former import (
        VideoMask2FormerImageProcessor,
    )

    return VideoMask2FormerImageProcessor()


class _Out:
    def __init__(self, cls, masks):
        self.class_queries_logits = cls
        self.masks_queries_logits = masks


@pytest.fixture()
def sorted_topk(monkeypatch):
    orig = torch.Tensor.topk

    def topk_sorted(self, k, dim=-1, largest=True, sorted=False):  # noqa: A002
        return orig(self, k, dim=dim, largest=largest, sorted=True)

    monkeypatch.setattr(torch.Tensor, "topk", topk_sorted)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_instance_parity(ref_processor, sorted_topk, seed):
    import jax.numpy as jnp

    from siu3r_tpu.models.mask2former.postprocess import instance_segmentation

    rng = np.random.RandomState(seed)
    b, q, v, mh, mw = 2, 10, 2, 16, 16
    num_labels = 6
    cls = rng.randn(b, q, num_labels + 1).astype(np.float32) * 2
    masks = rng.randn(b, q, v, mh, mw).astype(np.float32) * 2

    ref = ref_processor.post_process_instance_segmentation(
        outputs=_Out(torch.from_numpy(cls), torch.from_numpy(masks)),
        threshold=0.5,
        target_sizes=None,
    )

    ours = instance_segmentation(
        jnp.asarray(cls),
        jnp.asarray(masks),
        target_size=(256, 256),
        num_labels=num_labels,
        num_topk=q,
        threshold=0.5,
    )

    for bi in range(b):
        ref_seg = ref[bi]["segmentation"].numpy()  # [V, 256, 256], -1 bg
        our_seg = np.asarray(ours["segmentation"][bi])
        np.testing.assert_array_equal(our_seg, ref_seg.astype(np.int32))

        ref_info = ref[bi]["segments_info"]
        valid = np.asarray(ours["valid"][bi])
        labels = np.asarray(ours["labels"][bi])
        scores = np.asarray(ours["scores"][bi])
        kept = np.flatnonzero(valid)
        assert len(ref_info) == len(kept)
        for seg_id, j in enumerate(kept):
            r = ref_info[seg_id]
            assert r["id"] == seg_id
            assert r["label_id"] == int(labels[j])
            assert abs(r["score"] - float(scores[j])) < 1e-5

        # reference confidence map [V, K, C+1, 256, 256]: class probs of
        # query index j x sigmoid mask of top-k rank j — reconstruct the
        # same pairing from our factored outputs
        ref_qc = ref[bi]["query_class_logits"].numpy()
        queries = np.asarray(ours["queries"][bi])  # top-k rank -> query idx
        class_probs = np.asarray(ours["class_probs"][bi])  # [Q, C+1]
        mask_probs = np.asarray(ours["mask_probs"][bi])  # [Q, V, H, W]
        recon = (
            class_probs[None, :, :, None, None]
            * mask_probs[queries].transpose(1, 0, 2, 3)[:, :, None]
        )
        np.testing.assert_allclose(recon, ref_qc, atol=1e-5)
