"""Multi-view backbone numerical parity against the reference PyTorch
implementation (VERDICT round-1 item #2).

The TPU design replaces the reference's ``generate_ctx_views`` O(V^2) context
materialization (/root/reference/src/models/backbone_croco.py:499-528) with a
shared KV bank + exclude-own-view mask (siu3r_tpu/models/backbone.py:99-156).
This test proves the two are numerically identical: build the reference
``AsymmetricCroCoMulti`` at full dims (random init), convert its state_dict,
run V=3 and V=4 forwards, and compare encoder + every decoder feature level.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not REF.exists(), reason="reference not mounted")]


@pytest.fixture(scope="module")
def ref_backbone():
    lu = types.ModuleType("lightning_utilities")
    lu_core = types.ModuleType("lightning_utilities.core")
    lu_rz = types.ModuleType("lightning_utilities.core.rank_zero")
    lu_rz.rank_prefixed_message = lambda msg, rank: msg
    lu_rz.rank_zero_only = lambda fn: fn
    lu_rz.rank_zero_only.rank = 0
    sys.modules.setdefault("lightning_utilities", lu)
    sys.modules.setdefault("lightning_utilities.core", lu_core)
    sys.modules.setdefault("lightning_utilities.core.rank_zero", lu_rz)
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))

    from src.models.backbone_croco import AsymmetricCroCoMulti as RefMulti

    torch.manual_seed(0)
    ref = RefMulti(
        enc_depth=24,
        dec_depth=12,
        enc_embed_dim=1024,
        dec_embed_dim=768,
        enc_num_heads=16,
        dec_num_heads=12,
        pos_embed="RoPE100",
        patch_size=16,
        freeze="none",
    )
    ref.eval()
    return ref


@pytest.fixture(scope="module")
def our_backbone(ref_backbone):
    import jax

    from siu3r_tpu.checkpoint import convert_backbone
    from siu3r_tpu.config import CrocoCfg, ModelCfg
    from siu3r_tpu.models.backbone import AsymmetricCroCoMulti

    cfg = ModelCfg(croco=CrocoCfg(freeze="none"))
    state = {
        f"backbone.{k}": v.detach().numpy()
        for k, v in ref_backbone.state_dict().items()
    }
    params = convert_backbone(state, cfg)
    params = jax.tree.map(np.asarray, params)
    model = AsymmetricCroCoMulti(cfg.croco)
    return model, {"params": params}


def _run_pair(ref, model, variables, v, seed):
    import jax.numpy as jnp

    h = w = 64
    rng = np.random.RandomState(seed)
    images_np = rng.rand(1, v, 3, h, w).astype(np.float32)
    intr_np = np.array(
        [[[318 / 256, 0, 0.5], [0, 318 / 256, 0.5], [0, 0, 1]]] * v,
        dtype=np.float32,
    )[None]

    with torch.no_grad():
        feat, all_feat, dec_feat, _shape, _images = ref(
            {
                "image": torch.from_numpy(images_np),
                "intrinsics": torch.from_numpy(intr_np),
            }
        )

    images = jnp.asarray(images_np).transpose(0, 1, 3, 4, 2)  # NHWC
    out = model.apply(variables, images, jnp.asarray(intr_np))
    return (feat, all_feat, dec_feat), out


@pytest.mark.parametrize("v", [3, 4])
def test_multi_backbone_parity(ref_backbone, our_backbone, v):
    model, variables = our_backbone
    (feat, all_feat, dec_feat), out = _run_pair(
        ref_backbone, model, variables, v, seed=v
    )

    # final encoder feature (intrinsic token stripped) [B, V, L, 1024]
    np.testing.assert_allclose(
        np.asarray(out.feat), feat.numpy(), atol=2e-4, rtol=1e-4
    )
    # a mid-stack raw encoder block output (adapter input)
    np.testing.assert_allclose(
        np.asarray(out.all_feat[11]), all_feat[11].numpy(), atol=2e-4, rtol=1e-4
    )
    # every decoder level: [enc 1024-dim, blk1..blk12 (last normed)]
    assert len(out.dec_feat) == len(dec_feat) == 13
    for i, (ours, theirs) in enumerate(zip(out.dec_feat, dec_feat)):
        np.testing.assert_allclose(
            np.asarray(ours),
            theirs.numpy(),
            atol=5e-4,
            rtol=1e-4,
            err_msg=f"decoder level {i} (V={v})",
        )


def test_multi_backbone_matches_two_view(ref_backbone, our_backbone):
    """At V=2 the shared-KV masked decoder must reduce exactly to the
    two-view cross-attention semantics (reference :231-255 vs :487-535)."""
    model, variables = our_backbone
    (feat, all_feat, dec_feat), out = _run_pair(
        ref_backbone, model, variables, v=2, seed=2
    )
    np.testing.assert_allclose(
        np.asarray(out.feat), feat.numpy(), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.dec_feat[-1]), dec_feat[-1].numpy(), atol=5e-4, rtol=1e-4
    )
