"""Pretrained-init surgery tests: MASt3R-format recon ckpt (no prefix, no
dec_blocks2, conf channel, different patch size) and seg-format ckpt
(model. prefix, fewer queries) overlayed onto random init."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from siu3r_tpu.checkpoint import (
    adapt_linear,
    filter_recon_state,
    filter_seg_state,
    resample_patch_embed_kernel,
)
from siu3r_tpu.config import CrocoCfg, Mask2formerCfg, ModelCfg


def test_resample_patch_embed_identity_roundtrip():
    rng = np.random.RandomState(0)
    k = rng.randn(4, 3, 16, 16).astype(np.float32)
    out = resample_patch_embed_kernel(k, (16, 16))
    np.testing.assert_array_equal(out, k)
    up = resample_patch_embed_kernel(k, (8, 8))
    assert up.shape == (4, 3, 8, 8)
    assert np.isfinite(up).all()


def test_adapt_linear_widens():
    w = np.random.RandomState(0).randn(8, 1024).astype(np.float32)
    out = adapt_linear(w)
    assert out.shape[1] > 1024
    np.testing.assert_allclose(out[:, :1024], w * 0.5)


def test_filter_recon_state():
    cfg = ModelCfg(croco=CrocoCfg(enc_depth=2, dec_depth=2, enc_embed_dim=32,
                                  dec_embed_dim=16, enc_num_heads=4, dec_num_heads=4))
    rng = np.random.RandomState(0)
    state = {
        "patch_embed.proj.weight": rng.randn(32, 3, 14, 14).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(32).astype(np.float32),
        "decoder_embed.weight": rng.randn(16, 32).astype(np.float32),
        "dec_blocks.0.norm1.weight": np.ones(16, np.float32),
        "downstream_head1.dpt.head.4.weight": rng.randn(4, 8, 1, 1).astype(np.float32),
        "downstream_head1.dpt.head.4.bias": rng.randn(4).astype(np.float32),
        "downstream_head2.dpt.head.4.weight": rng.randn(4, 8, 1, 1).astype(np.float32),
        "downstream_head2.dpt.head.4.bias": rng.randn(4).astype(np.float32),
    }
    out = filter_recon_state(state, cfg)
    assert out["backbone.patch_embed.proj.weight"].shape == (32, 3, 16, 16)
    # dec_blocks duplicated
    assert "backbone.dec_blocks2.0.norm1.weight" in out
    # conf channel stripped
    assert out["downstream_head1.dpt.head.4.weight"].shape[0] == 3
    assert out["downstream_head2.dpt.head.4.bias"].shape[0] == 3
    # heads not double-prefixed
    assert "backbone.downstream_head1.dpt.head.4.weight" not in out


def test_filter_seg_state_query_padding():
    cfg = ModelCfg(mask2former=Mask2formerCfg(
        id2label={1: "a", 2: "b"}, num_queries=10,
    ))
    rng = np.random.RandomState(0)
    state = {
        "model.mask2former.model.transformer_module.queries_embedder.weight":
            rng.randn(6, 8).astype(np.float32),
        "model.mask2former.class_predictor.weight": rng.randn(3, 8).astype(np.float32),
        "model.backbone.enc_norm.weight": np.ones(8, np.float32),
        "model.adapter.level_embed": rng.randn(3, 8).astype(np.float32),
        "model.criterion.empty_weight": np.ones(3, np.float32),
    }
    out = filter_seg_state(state, cfg)
    q = out["mask2former.model.transformer_module.queries_embedder.weight"]
    assert q.shape == (10, 8)
    np.testing.assert_array_equal(q[:6], state[
        "model.mask2former.model.transformer_module.queries_embedder.weight"])
    np.testing.assert_array_equal(q[6:], 0)
    assert not any("class_predictor" in k for k in out)
    assert not any("backbone" in k for k in out)
    assert not any("criterion" in k for k in out)
    assert "adapter.level_embed" in out
