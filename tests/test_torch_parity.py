"""End-to-end numerical parity against the reference PyTorch implementation.

Builds the reference SIU3RModel (random init, eval mode) from
/root/reference, converts its state_dict with siu3r_tpu.checkpoint, runs both
models on the same inputs, and compares intermediate + final tensors. This is
the strongest conversion-fidelity check available without the published
checkpoints (SURVEY.md §7.3.2)."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not REF.exists(), reason="reference not mounted")]


@pytest.fixture(scope="module")
def ref_setup():
    # shim the reference's logger dependency (lightning_utilities is not
    # installed; only rank-prefixed logging is used)
    lu = types.ModuleType("lightning_utilities")
    lu_core = types.ModuleType("lightning_utilities.core")
    lu_rz = types.ModuleType("lightning_utilities.core.rank_zero")
    lu_rz.rank_prefixed_message = lambda msg, rank: msg
    lu_rz.rank_zero_only = lambda fn: fn
    lu_rz.rank_zero_only.rank = 0
    sys.modules.setdefault("lightning_utilities", lu)
    sys.modules.setdefault("lightning_utilities.core", lu_core)
    sys.modules.setdefault("lightning_utilities.core.rank_zero", lu_rz)
    # shim src.config (it imports hydra/omegaconf/dacite, not installed)
    src_config = types.ModuleType("src.config")
    src_config.ModelCfg = object
    sys.path.insert(0, str(REF))
    import src  # noqa: F401

    sys.modules["src.config"] = src_config

    from src.models.model import SIU3RModel as RefModel

    class NS:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    h = w = 64
    ref_cfg = NS(
        image_size=[h, w],
        croco=NS(
            enc_depth=24,
            dec_depth=12,
            enc_embed_dim=1024,
            dec_embed_dim=768,
            enc_num_heads=16,
            dec_num_heads=12,
            pos_embed="RoPE100",
            patch_size=16,
            freeze="none",
        ),
        mask2former=NS(
            id2label={i: str(i) for i in range(1, 21)},
            num_queries=100,
            seg_threshold=0.5,
            label_ids_to_fuse=[0, 1],
        ),
        gaussian_head=NS(gaussian_scale_min=0.5, gaussian_scale_max=15.0, sh_degree=4),
        pretrained_weights_path=None,
    )
    torch.manual_seed(0)
    ref = RefModel(ref_cfg)
    ref.eval()
    return ref, (h, w)


@pytest.fixture(scope="module")
def inputs(ref_setup):
    _, (h, w) = ref_setup
    rng = np.random.RandomState(0)
    images = rng.rand(1, 2, 3, h, w).astype(np.float32)
    intr = np.array(
        [[[318 / 256, 0, 0.5], [0, 318 / 256, 0.5], [0, 0, 1]]] * 2,
        dtype=np.float32,
    )[None]
    return images, intr


@pytest.fixture(scope="module")
def our_model(ref_setup):
    import jax
    from siu3r_tpu.checkpoint import convert_siu3r_state_dict
    from siu3r_tpu.config import CrocoCfg, GaussianHeadCfg, Mask2formerCfg, ModelCfg
    from siu3r_tpu.models.model import SIU3RModel

    ref, (h, w) = ref_setup
    cfg = ModelCfg(
        croco=CrocoCfg(freeze="none"),
        mask2former=Mask2formerCfg(
            id2label={i: str(i) for i in range(1, 21)},
            label_ids_to_fuse=[0, 1],
            num_queries=100,
        ),
        gaussian_head=GaussianHeadCfg(sh_degree=4),
        image_size=(h, w),
    )
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_siu3r_state_dict(state, cfg)
    variables = jax.tree.map(lambda x: np.asarray(x), variables)
    model = SIU3RModel(cfg)
    return model, variables, cfg


def test_backbone_parity(ref_setup, inputs, our_model):
    import jax.numpy as jnp

    ref, (h, w) = ref_setup
    images_np, intr_np = inputs
    with torch.no_grad():
        croco_input = {
            "image": torch.from_numpy(images_np),
            "intrinsics": torch.from_numpy(intr_np),
        }
        (feat1, feat2, all1, all2, dec1, dec2, *_rest) = ref.backbone(
            croco_input, return_views=True
        )
    model, variables, cfg = our_model
    images = jnp.asarray(images_np).transpose(0, 1, 3, 4, 2)  # NHWC
    out = model.apply(
        variables,
        images,
        jnp.asarray(intr_np),
        method=lambda m, im, k: m.backbone(im, k),
    )
    np.testing.assert_allclose(
        np.asarray(out.feat1), feat1.numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.all_feat1[5]), all1[5].numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.dec1[-1]), dec1[-1].numpy(), atol=5e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.dec2[6]), dec2[6].numpy(), atol=5e-4, rtol=1e-4
    )


def test_full_model_parity(ref_setup, inputs, our_model):
    import jax.numpy as jnp

    ref, (h, w) = ref_setup
    images_np, intr_np = inputs
    timages = torch.from_numpy(images_np)
    tintr = torch.from_numpy(intr_np)

    with torch.no_grad():
        croco_input = {"image": timages, "intrinsics": tintr}
        (f1, f2, all1, all2, dec1, dec2, shape1, shape2, view1, view2) = ref.backbone(
            croco_input, return_views=True
        )
        ms1 = ref.adapter(timages[:, 0], all1)
        ms2 = ref.adapter(timages[:, 1], all2)
        multi_scale = [torch.stack([a, b], dim=1) for a, b in zip(ms1, ms2)]
        ref_gauss, ref_pts1, ref_pts2 = ref.gaussian(
            dec1, dec2, shape1, shape2, view1, view2
        )
        seg_out = ref.mask2former(multi_scale_feat=multi_scale)

    model, variables, cfg = our_model
    images = jnp.asarray(images_np).transpose(0, 1, 3, 4, 2)
    out = model.apply(variables, images, jnp.asarray(intr_np))

    # adapter multi-scale features (1/4 level, view 0)
    # (internal check via the seg logits below; direct check on pts3d:)
    np.testing.assert_allclose(
        np.asarray(out.pts3d[:, 0]), ref_pts1.numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.pts3d[:, 1]), ref_pts2.numpy(), atol=1e-3, rtol=1e-3
    )
    # gaussian params (ref.gaussian() returns [B, V, HW, ...]; ours are
    # flattened to [B, V*HW, ...])
    g = out.gaussians
    flat = lambda t: t.reshape((t.shape[0], t.shape[1] * t.shape[2]) + t.shape[3:])
    np.testing.assert_allclose(
        np.asarray(g.opacities), flat(ref_gauss.opacities.numpy()), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g.scales), flat(ref_gauss.scales.numpy()), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g.covariances), flat(ref_gauss.covariances.numpy()), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g.harmonics), flat(ref_gauss.harmonics.numpy()), atol=1e-4
    )
    # segmentation logits
    np.testing.assert_allclose(
        np.asarray(out.seg.class_queries_logits),
        seg_out.class_queries_logits.numpy(),
        atol=2e-3,
        rtol=1e-3,
    )
    ours_masks = np.asarray(out.seg.masks_queries_logits)
    ref_masks = seg_out.masks_queries_logits.numpy()  # [B, Q, V, h, w]
    np.testing.assert_allclose(ours_masks, ref_masks, atol=5e-3, rtol=1e-3)
