"""Parity of the jnp deformable-attention ops against the reference's
grid_sample-based torch implementation (loaded directly from /root/reference
as a golden oracle; skipped if unavailable)."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from siu3r_tpu.ops.deformable import (
    grid_sample_bilinear,
    multi_scale_deformable_attention,
)

torch = pytest.importorskip("torch")

REF = Path("/root/reference/src/models/mask2former/utils.py")


def _load_ref_utils():
    spec = importlib.util.spec_from_file_location("ref_m2f_utils", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
def test_grid_sample_matches_torch():
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 7, 9, 5
    img = rng.randn(b, h, w, c).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(b, 40, 2)).astype(np.float32)
    ours = grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid))
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tgrid = torch.from_numpy(grid).reshape(b, 40, 1, 2)
    ref = torch.nn.functional.grid_sample(
        timg, tgrid, mode="bilinear", padding_mode="zeros", align_corners=False
    )[..., 0].permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
def test_msda_matches_reference():
    ref_utils = _load_ref_utils()
    rng = np.random.RandomState(1)
    shapes = [(8, 8), (4, 4), (2, 2)]
    len_in = sum(h * w for h, w in shapes)
    b, lq, heads, hd, pts = 2, 10, 4, 8, 4
    value = rng.randn(b, len_in, heads, hd).astype(np.float32)
    loc = rng.uniform(0, 1, size=(b, lq, heads, len(shapes), pts, 2)).astype(np.float32)
    w = rng.rand(b, lq, heads, len(shapes), pts).astype(np.float32)
    w /= w.reshape(b, lq, heads, -1).sum(-1)[..., None, None]
    ours = multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)
    )
    ref = ref_utils.multi_scale_deformable_attention(
        torch.from_numpy(value),
        torch.tensor(shapes),
        torch.from_numpy(loc),
        torch.from_numpy(w),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_grid_sample_separable_matches_bilinear():
    """MXU separable sampling == gather-based bilinear (incl. OOB points)."""
    import jax.numpy as jnp

    from siu3r_tpu.ops.deformable import (
        grid_sample_bilinear,
        grid_sample_separable,
    )

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(3, 17, 23, 1), np.float32)
    grid = jnp.asarray(rng.rand(3, 500, 2) * 2.4 - 1.2, np.float32)  # some OOB
    a = grid_sample_bilinear(img, grid)
    b = grid_sample_separable(img, grid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
