"""Alternative heads + seg_forward + encoder-only backbone + instance
post-process coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siu3r_tpu.config import CrocoCfg
from siu3r_tpu.models.backbone import CroCoEncoderOnly
from siu3r_tpu.models.heads import (
    LinearPts3d,
    MultiResDPTGSHead,
    head_factory,
)
from siu3r_tpu.models.heads.linear import pixel_shuffle
from siu3r_tpu.models.mask2former.postprocess import instance_segmentation


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 4, 2 * 2 * 5).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_linear_head():
    head = LinearPts3d(patch_size=16)
    tokens = [jax.random.normal(jax.random.PRNGKey(0), (2, 4, 48))]
    vs = head.init(jax.random.PRNGKey(1), tokens, (32, 32))
    out = head.apply(vs, tokens, (32, 32))
    assert out.shape == (2, 32, 32, 3)


def test_multi_res_gs_head():
    head = MultiResDPTGSHead(num_channels=11, layer_dims=(8, 12, 16, 24), feature_dim=16)
    h = w = 64
    nh = h // 16
    tokens = [
        jax.random.normal(jax.random.PRNGKey(i), (1, nh * nh, d))
        for i, d in enumerate((32, 24, 24, 24))
    ]
    img = jax.random.uniform(jax.random.PRNGKey(9), (1, h, w, 3))
    vs = head.init(jax.random.PRNGKey(1), tokens, img, (h, w))
    outs = head.apply(vs, tokens, img, (h, w))
    assert [o.shape for o in outs] == [
        (1, 16, 16, 11), (1, 8, 8, 11), (1, 4, 4, 11), (1, 2, 2, 11),
    ]


def test_head_factory():
    assert head_factory("linear", "pts3d") is not None
    assert head_factory("dpt", "pts3d") is not None
    assert head_factory("dpt_gs", "gs_params", out_nchan=83) is not None
    assert head_factory("multi_res_dpt_gs", "gs_params", out_nchan=83) is not None
    with pytest.raises(NotImplementedError):
        head_factory("nope", "pts3d")


def test_encoder_only_backbone():
    cfg = CrocoCfg(enc_depth=2, dec_depth=2, enc_embed_dim=32, enc_num_heads=4)
    model = CroCoEncoderOnly(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
    vs = model.init(jax.random.PRNGKey(1), images)
    out = model.apply(vs, images)
    assert out.feat1.shape == (1, 4, 32)
    assert len(out.all_feat1) == 2
    assert out.dec1 == []


def test_instance_segmentation():
    rng = np.random.RandomState(0)
    b, q, v, mh, mw = 1, 6, 2, 16, 16
    cl = jnp.asarray(rng.randn(b, q, 5 + 1).astype(np.float32) * 3)
    # one very confident query with a big mask
    ml = jnp.asarray(rng.randn(b, q, v, mh, mw).astype(np.float32) - 3)
    ml = ml.at[0, 2].set(5.0)
    cl = cl.at[0, 2, 1].set(10.0)
    out = instance_segmentation(
        cl, ml, target_size=(32, 32), num_labels=5, num_topk=4, threshold=0.3
    )
    assert out["segmentation"].shape == (b, v, 32, 32)
    assert bool(out["valid"].any())
    # the confident query's label appears among kept instances
    kept_labels = np.asarray(out["labels"])[np.asarray(out["valid"])]
    assert 1 in kept_labels
    # its mask pixels carry a nonnegative instance id
    assert int(out["segmentation"].max()) >= 0
