import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siu3r_tpu.config import CrocoCfg, GaussianHeadCfg, Mask2formerCfg, ModelCfg
from siu3r_tpu.models.model import SIU3RModel



pytestmark = pytest.mark.slow  # compiles the full model / train step
def tiny_model_cfg(num_views=2):
    return ModelCfg(
        croco=CrocoCfg(
            enc_depth=2,
            dec_depth=2,
            enc_embed_dim=64,
            dec_embed_dim=48,
            enc_num_heads=4,
            dec_num_heads=4,
        ),
        mask2former=Mask2formerCfg(
            id2label={i: str(i) for i in range(1, 6)},  # 5 labels
            label_ids_to_fuse=[0, 1],
            num_queries=8,
            hidden_dim=32,
            num_attention_heads=4,
            dim_feedforward=64,
            decoder_layers=4,
            encoder_layers=2,
            encoder_feedforward_dim=64,
            feature_size=32,
            mask_feature_size=32,
            max_lift_queries=4,
        ),
        gaussian_head=GaussianHeadCfg(sh_degree=1),
        image_size=(64, 64),
        num_views=num_views,
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_model_cfg()
    model = SIU3RModel(cfg)
    b, v, h, w = 1, 2, 64, 64
    images = jax.random.uniform(jax.random.PRNGKey(0), (b, v, h, w, 3))
    intr = jnp.eye(3)[None, None].repeat(b, 0).repeat(v, 1)
    variables = model.init(jax.random.PRNGKey(1), images, intr)
    return cfg, model, variables, images, intr


def test_full_forward(model_and_params):
    cfg, model, variables, images, intr = model_and_params
    out = model.apply(
        variables, images, intr, enable_query_class_logit_lift=True
    )
    b, v, h, w = 1, 2, 64, 64
    g = v * h * w
    assert out.gaussians.means.shape == (b, g, 3)
    assert out.gaussians.covariances.shape == (b, g, 3, 3)
    d_sh = cfg.gaussian_head.d_sh
    assert out.gaussians.harmonics.shape == (b, g, 3, d_sh)
    assert out.gaussians.opacities.shape == (b, g)
    assert out.gaussians.semantic_labels.shape == (b, g)
    assert out.gaussians.seg_query_class_logits.shape == (
        b, g, cfg.mask2former.max_lift_queries, cfg.mask2former.num_labels + 1,
    )
    assert out.seg.class_queries_logits.shape == (
        b, cfg.mask2former.num_queries, cfg.mask2former.num_labels + 1,
    )
    assert out.seg.masks_queries_logits.shape[:3] == (b, cfg.mask2former.num_queries, v)
    assert out.pts3d.shape == (b, v, h, w, 3)
    # opacities in (0, 1); scales positive <= 0.3
    assert float(out.gaussians.opacities.min()) > 0
    assert float(out.gaussians.opacities.max()) < 1
    assert float(out.gaussians.scales.min()) > 0
    assert float(out.gaussians.scales.max()) <= 0.3
    # semantic labels within range
    assert int(out.gaussians.semantic_labels.max()) <= cfg.mask2former.num_labels
    assert int(out.gaussians.semantic_labels.min()) >= 0
    for leaf in jax.tree.leaves(out):
        assert bool(jnp.isfinite(jnp.asarray(leaf, jnp.float32)).all())


def test_refer_seg_forward(model_and_params):
    cfg, model, _, images, intr = model_and_params
    words = jax.random.normal(jax.random.PRNGKey(3), (1, 6, cfg.mask2former.hidden_dim))
    # language layers materialize lazily: init with word embeddings present
    variables = model.init(jax.random.PRNGKey(2), images, intr, word_embeddings=words)
    out = model.apply(variables, images, intr, word_embeddings=words)
    assert out.seg.word_logits.shape == (1, 6, cfg.mask2former.num_queries)
    assert bool(jnp.isfinite(out.seg.word_logits).all())


def test_bfloat16_compute_path(model_and_params):
    """model.dtype='bfloat16' (fp32 params, bf16 matmuls — the MXU-native
    mode) stays finite and tracks the fp32 forward: gaussian means within
    bf16 tolerance and segmentation labels mostly identical."""
    import dataclasses

    cfg, model, variables, images, intr = model_and_params
    cfg16 = dataclasses.replace(tiny_model_cfg(), dtype="bfloat16")
    model16 = SIU3RModel(cfg16)
    out32 = jax.jit(model.apply)(variables, images, intr)
    out16 = jax.jit(model16.apply)(variables, images, intr)
    m32 = np.asarray(out32.gaussians.means)
    m16 = np.asarray(out16.gaussians.means)
    assert np.isfinite(m16).all()
    scale = np.abs(m32).mean() + 1e-6
    assert np.abs(m32 - m16).mean() / scale < 0.05, (
        np.abs(m32 - m16).mean() / scale
    )
    s32 = np.asarray(out32.post["segmentation"])
    s16 = np.asarray(out16.post["segmentation"])
    assert (s32 == s16).mean() > 0.9, (s32 == s16).mean()
