"""Multi-view (N>2) SIU3RModel smoke: fused gaussians from V views, shared
head2 for views 1..V-1 (reference model_multi.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_model import tiny_model_cfg



pytestmark = pytest.mark.slow  # compiles the full model / train step
def test_multi_view_model_forward():
    cfg = tiny_model_cfg(num_views=3)
    from siu3r_tpu.models.model import SIU3RModel

    model = SIU3RModel(cfg)
    b, v, h, w = 1, 3, 64, 64
    images = jax.random.uniform(jax.random.PRNGKey(0), (b, v, h, w, 3))
    intr = jnp.eye(3)[None, None].repeat(b, 0).repeat(v, 1)
    variables = model.init(jax.random.PRNGKey(1), images, intr)
    out = model.apply(variables, images, intr, enable_query_class_logit_lift=True)
    g = v * h * w
    assert out.gaussians.means.shape == (b, g, 3)
    assert out.pts3d.shape == (b, v, h, w, 3)
    assert out.seg.masks_queries_logits.shape[2] == v
    assert out.gaussians.seg_query_class_logits.shape[1] == g
    for leaf in jax.tree.leaves(out):
        assert bool(jnp.isfinite(jnp.asarray(leaf, jnp.float32)).all())
    # views 1..V-1 share head2: their param trees are identical modules, so
    # permuting those views permutes pts3d accordingly
    perm = jnp.array([0, 2, 1])
    out_p = model.apply(variables, images[:, perm], intr[:, perm])
    np.testing.assert_allclose(
        np.asarray(out_p.pts3d[:, 1]), np.asarray(out.pts3d[:, 2]), atol=1e-4
    )
