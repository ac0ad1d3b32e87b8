import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siu3r_tpu.config import CrocoCfg
from siu3r_tpu.models.backbone import AsymmetricCroCo, AsymmetricCroCoMulti


def tiny_cfg():
    return CrocoCfg(
        enc_depth=2,
        dec_depth=2,
        enc_embed_dim=64,
        dec_embed_dim=48,
        enc_num_heads=4,
        dec_num_heads=4,
        patch_size=16,
    )


def test_two_view_forward_shapes():
    cfg = tiny_cfg()
    model = AsymmetricCroCo(cfg)
    b, h, w = 2, 32, 48
    images = jnp.ones((b, 2, h, w, 3))
    intr = jnp.eye(3)[None, None].repeat(b, 0).repeat(2, 1)
    params = model.init(jax.random.PRNGKey(0), images, intr)
    out = model.apply(params, images, intr)
    n_tok = (h // 16) * (w // 16)
    assert out.feat1.shape == (b, n_tok, cfg.enc_embed_dim)
    assert len(out.all_feat1) == cfg.enc_depth
    assert len(out.dec1) == cfg.dec_depth + 1
    assert out.dec1[0].shape == (b, n_tok, cfg.enc_embed_dim)
    assert out.dec1[-1].shape == (b, n_tok, cfg.dec_embed_dim)
    assert out.shape == (h, w)


def test_multi_view_matches_two_view_semantics():
    """For V=2, the masked shared-bank decoder must agree with running
    explicit per-view context (the reference's generate_ctx_views path)."""
    cfg = tiny_cfg()
    b, h, w, v = 1, 32, 32, 3
    images = jax.random.normal(jax.random.PRNGKey(1), (b, v, h, w, 3))
    intr = jnp.eye(3)[None, None].repeat(b, 0).repeat(v, 1)
    model = AsymmetricCroCoMulti(cfg)
    params = model.init(jax.random.PRNGKey(0), images, intr)
    out = model.apply(params, images, intr)
    n_tok = (h // 16) * (w // 16)
    assert out.feat.shape == (b, v, n_tok, cfg.enc_embed_dim)
    assert out.dec_feat[-1].shape == (b, v, n_tok, cfg.dec_embed_dim)
    # permuting the non-zero views permutes outputs identically (the bank
    # construction is symmetric in views 1..V-1)
    perm = jnp.array([0, 2, 1])
    out_p = model.apply(params, images[:, perm], intr[:, perm])
    np.testing.assert_allclose(
        np.asarray(out_p.dec_feat[-1][:, 1]),
        np.asarray(out.dec_feat[-1][:, 2]),
        atol=1e-5,
    )


def test_encoder_is_view_independent():
    """Encoder processes each view independently: swapping views swaps feats."""
    cfg = tiny_cfg()
    model = AsymmetricCroCo(cfg)
    b, h, w = 1, 32, 32
    images = jax.random.normal(jax.random.PRNGKey(2), (b, 2, h, w, 3))
    intr = jnp.eye(3)[None, None].repeat(b, 0).repeat(2, 1)
    params = model.init(jax.random.PRNGKey(0), images, intr)
    out = model.apply(params, images, intr)
    out_sw = model.apply(params, images[:, ::-1], intr[:, ::-1])
    np.testing.assert_allclose(
        np.asarray(out.feat1), np.asarray(out_sw.feat2), atol=1e-5
    )
