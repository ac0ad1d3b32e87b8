"""Orthographic render variant + differentiable pose-delta inputs
(VERDICT round-1 missing #5; reference cuda_splatting.py:109-118, :125-216)."""

import jax
import jax.numpy as jnp
import numpy as np

from siu3r_tpu.gaussians import Gaussians
from siu3r_tpu.renderer import (
    apply_pose_delta,
    render_gaussians,
    render_gaussians_orthographic,
)


def _two_blob_scene():
    """Two identical gaussians straight ahead at different depths."""
    means = jnp.array([[-0.5, 0.0, 2.0], [0.5, 0.0, 8.0]])
    covs = jnp.broadcast_to(jnp.eye(3) * 0.01, (2, 3, 3))
    opac = jnp.array([0.9, 0.9])
    # SH shading adds +0.5; cancel it on the off channels so blob 0 is pure
    # red and blob 1 pure green (keeps the width measure channel-separable)
    z = -0.5 / 0.2820948
    harm = jnp.zeros((2, 3, 25)).at[:, :, 0].set(
        jnp.array([[2.0, z, z], [z, 2.0, z]])
    )
    return Gaussians(
        means=means[None], covariances=covs[None], harmonics=harm[None],
        opacities=opac[None], scales=jnp.ones((1, 2, 3)) * 0.1,
        rotations=jnp.zeros((1, 2, 4)).at[..., 0].set(1.0),
    )


def _blob_width(channel):
    """Horizontal extent of the half-peak region of one color channel."""
    c = np.asarray(channel)
    cols = np.where(c.max(axis=0) > 0.5 * c.max())[0]
    return (cols.max() - cols.min() + 1) if cols.size else 0


def test_orthographic_no_perspective_shrink():
    g = _two_blob_scene()
    ext = jnp.eye(4)[None, None]
    h = w = 64
    bv = (1, 1)
    out = render_gaussians_orthographic(
        ext,
        width=jnp.full(bv, 2.0), height=jnp.full(bv, 2.0),
        near=jnp.full(bv, 0.1), far=jnp.full(bv, 100.0),
        gaussians=g, image_shape=(h, w),
    )
    img = np.asarray(out.color[0, 0])
    w_near = _blob_width(img[..., 0])  # red blob at z=2
    w_far = _blob_width(img[..., 1])  # green blob at z=8
    assert w_near > 0 and w_far > 0
    # orthographic: 4x depth difference must NOT shrink the far blob
    assert abs(w_far - w_near) <= max(2, 0.2 * w_near), (w_near, w_far)
    # perspective control: the far blob is ~4x smaller
    intr = jnp.array([[[ [1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0] ]]])
    persp = render_gaussians(g, ext, intr, (h, w))
    pimg = np.asarray(persp.color[0, 0])
    p_near = _blob_width(pimg[..., 0])
    p_far = _blob_width(pimg[..., 1])
    assert p_far < 0.5 * p_near, (p_near, p_far)


def test_pose_delta_identity_and_shift():
    g = _two_blob_scene()
    ext = jnp.eye(4)[None, None]
    intr = jnp.array([[[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]]])
    base = render_gaussians(g, ext, intr, (64, 64))
    zero = jnp.zeros((1, 1, 3))
    same = render_gaussians(
        g, ext, intr, (64, 64), cam_rot_delta=zero, cam_trans_delta=zero
    )
    np.testing.assert_allclose(
        np.asarray(base.color), np.asarray(same.color), atol=1e-6
    )
    shifted = render_gaussians(
        g, ext, intr, (64, 64),
        cam_rot_delta=zero, cam_trans_delta=jnp.array([[[1.0, 0.0, 0.0]]]),
    )
    assert float(jnp.abs(shifted.color - base.color).max()) > 0.05


def test_pose_delta_gradients_flow():
    g = _two_blob_scene()
    ext = jnp.eye(4)[None, None]
    intr = jnp.array([[[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]]])
    target = render_gaussians(
        g, ext, intr, (32, 32),
        cam_trans_delta=jnp.array([[[0.2, 0.0, 0.0]]]),
    ).color

    def loss(deltas):
        rot, trans = deltas
        out = render_gaussians(
            g, ext, intr, (32, 32), cam_rot_delta=rot, cam_trans_delta=trans
        )
        return jnp.mean((out.color - target) ** 2)

    grads = jax.grad(loss)((jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3))))
    g_rot, g_trans = (np.asarray(x) for x in grads)
    assert np.isfinite(g_rot).all() and np.isfinite(g_trans).all()
    assert np.abs(g_trans).max() > 0, "translation gradient is zero"
    assert np.abs(g_rot).max() > 0, "rotation gradient is zero"


def test_apply_pose_delta_so3_roundtrip():
    rng = np.random.RandomState(0)
    vm = jnp.asarray(np.eye(4, dtype=np.float32))[None]
    theta = jnp.asarray(rng.randn(1, 3).astype(np.float32) * 0.3)
    out = apply_pose_delta(vm, theta, None)
    r = np.asarray(out[0, :3, :3])
    # exp([theta]x) is a rotation: orthonormal, det 1
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(r) - 1.0) < 1e-5
    # inverse delta undoes it
    back = apply_pose_delta(out, -theta, None)
    inner = np.asarray(back[0, :3, :3])
    np.testing.assert_allclose(inner, np.eye(3), atol=1e-4)


def test_fused_color_qc_matches_separate():
    """render_color_and_qc (shared projection/binning, VERDICT r2 #10) must
    reproduce render_gaussians + render_qc_factored exactly."""
    from siu3r_tpu.renderer import (
        render_color_and_qc,
        render_qc_factored,
    )

    g = _two_blob_scene()
    rng = np.random.RandomState(0)
    b, s, c1, v = 1, 3, 5, 2
    n_gauss = g.means.shape[1]
    class_probs = jnp.asarray(rng.rand(b, s, c1).astype(np.float32))
    mask_cols = jnp.asarray(rng.rand(b, n_gauss, s).astype(np.float32))
    ext = jnp.broadcast_to(jnp.eye(4), (b, v, 4, 4))
    ext = ext.at[:, 1, 0, 3].set(0.1)
    intr = jnp.broadcast_to(
        jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]), (b, v, 3, 3)
    )
    shape = (32, 32)

    ref_render = render_gaussians(g, ext, intr, shape)
    ref_qc = render_qc_factored(g, class_probs, mask_cols, ext, intr, shape)
    render, qc = render_color_and_qc(g, class_probs, mask_cols, ext, intr, shape)

    np.testing.assert_allclose(
        np.asarray(render.color), np.asarray(ref_render.color), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(render.depth), np.asarray(ref_render.depth), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(qc), np.asarray(ref_qc), atol=1e-6)
