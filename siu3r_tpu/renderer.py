"""Gaussian scene renderer — the SplattingCUDA equivalent
(reference src/models/gaussian_renderer.py:15-116).

Semantics parity:
  * the scene is rescaled by 1/near = 10 before rendering (translations,
    means, covariances; near becomes 1.0, far 1000) (:20-48);
  * ``render_color``: SH-shaded RGB + expected depth per target view,
    color clamped to [0, 1] (:49-74). Depth is returned in the scaled space,
    exactly like the reference (which never unscales it);
  * ``render_qc_logits``: novel-view segmentation by splatting per-Gaussian
    query-class confidences (:75-110). The reference rasterizes
    Q*(C+1)-channel colors through gsplat; here we exploit the
    factorization qc[g, s, c] = class_prob[s, c] * mask_prob[s, g] — the
    class term is constant per query slot, so we splat only the Q_lift mask
    channels and take the outer product with the class probabilities after
    rendering. Identical output, ~(C+1)x less rasterization work.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from siu3r_tpu.gaussians import Gaussians
from siu3r_tpu.ops.sh import eval_sh_colors
from siu3r_tpu.render.rasterizer import rasterize

NEAR = 0.1
FAR = 100.0
SCALE_FACTOR = 1.0 / NEAR


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderOutput:
    color: Optional[jax.Array] = None  # [B, V, H, W, 3]
    depth: Optional[jax.Array] = None  # [B, V, H, W] (scaled space)
    alpha: Optional[jax.Array] = None  # [B, V, H, W]
    qc_logits: Optional[jax.Array] = None  # [B, V, Q_lift, C+1, H, W]


def apply_pose_delta(
    viewmats: jax.Array,
    cam_rot_delta: Optional[jax.Array],
    cam_trans_delta: Optional[jax.Array],
) -> jax.Array:
    """Differentiable camera-pose perturbation — the TPU equivalent of the
    CUDA rasterizer's ``theta``/``rho`` inputs
    (reference cuda_splatting.py:109-118; diff-gaussian-rasterization-w-pose
    applies an SE(3) retraction to the view matrix inside the kernel so pose
    gradients flow). Functional JAX needs no in-kernel support: the retracted
    view matrix W2C' = [R exp([theta]x) | t + rho] feeds the jnp projection,
    and gradients w.r.t. theta/rho come from autodiff.

    viewmats [..., 4, 4] world-to-camera; deltas [..., 3]."""
    if cam_rot_delta is None and cam_trans_delta is None:
        return viewmats
    r = viewmats[..., :3, :3]
    t = viewmats[..., :3, 3]
    if cam_rot_delta is not None:
        th = cam_rot_delta
        zeros = jnp.zeros_like(th[..., 0])
        k = jnp.stack(
            [
                jnp.stack([zeros, -th[..., 2], th[..., 1]], axis=-1),
                jnp.stack([th[..., 2], zeros, -th[..., 0]], axis=-1),
                jnp.stack([-th[..., 1], th[..., 0], zeros], axis=-1),
            ],
            axis=-2,
        )
        # Rodrigues with Taylor guards so gradients stay finite at theta=0
        # (||theta|| is not differentiable at the origin)
        sq = jnp.sum(th * th, axis=-1)[..., None, None]
        small = sq < 1e-12
        a = jnp.sqrt(jnp.where(small, 1.0, sq))
        c1 = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(a) / a)
        c2 = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(a)) / (a * a))
        eye = jnp.broadcast_to(jnp.eye(3), k.shape)
        exp_k = eye + c1 * k + c2 * (k @ k)
        r = r @ exp_k
    if cam_trans_delta is not None:
        t = t + cam_trans_delta
    out = viewmats.at[..., :3, :3].set(r)
    return out.at[..., :3, 3].set(t)


def render_gaussians(
    gaussians: Gaussians,
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    image_shape: Tuple[int, int],
    background: Optional[jax.Array] = None,
    max_per_tile: int = 4096,
    cam_rot_delta: Optional[jax.Array] = None,  # [B, V, 3]
    cam_trans_delta: Optional[jax.Array] = None,  # [B, V, 3]
    bwd_mode: Optional[str] = None,
) -> RenderOutput:
    """gaussians: batched [B, G, ...] (labels/qc optional); extrinsics
    [B, V, 4, 4] camera-to-world; intrinsics [B, V, 3, 3] normalized.
    ``cam_rot_delta``/``cam_trans_delta`` perturb the poses differentiably
    (reference render_cuda theta/rho, cuda_splatting.py:109-118).
    ``bwd_mode`` selects the rasterizer backward ('pallas' | 'jnp' | None =
    trace-time default; see rasterizer.raster_bwd_mode)."""
    h, w = image_shape
    b, v = extrinsics.shape[0], extrinsics.shape[1]
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    # scene rescale (reference :42-48)
    ext = extrinsics.at[..., :3, 3].multiply(SCALE_FACTOR)
    means = gaussians.means * SCALE_FACTOR
    covs = gaussians.covariances * (SCALE_FACTOR**2)
    near, far = 1.0, FAR * SCALE_FACTOR

    intr_px = intrinsics.at[..., 0, :].multiply(w).at[..., 1, :].multiply(h)
    viewmats = jnp.linalg.inv(ext)
    # rho lives in the scaled scene space, like the reference's (which gets
    # the already-rescaled extrinsics, gaussian_renderer.py:42-48)
    viewmats = apply_pose_delta(viewmats, cam_rot_delta, cam_trans_delta)

    sh_degree = int(round(gaussians.harmonics.shape[-1] ** 0.5)) - 1

    def render_item(means_i, covs_i, opac_i, harm_i, viewmats_i, intr_i, ext_i):
        with jax.named_scope("sh_eval"):
            campos = ext_i[:, :3, 3]  # [V, 3]
            dirs = means_i[None] - campos[:, None]  # [V, G, 3]
            dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
            colors = eval_sh_colors(harm_i[None], dirs, sh_degree)  # [V, G, 3]
        return rasterize(
            means_i,
            covs_i,
            opac_i,
            colors,
            viewmats_i,
            intr_i,
            image_shape,
            near=near,
            far=far,
            background=background,
            max_per_tile=max_per_tile,
            bwd_mode=bwd_mode,
        )

    color, depth, alpha = jax.vmap(render_item)(
        means, covs, gaussians.opacities, gaussians.harmonics,
        viewmats, intr_px, ext,
    )
    color = jnp.clip(color, 0.0, 1.0)
    return RenderOutput(color=color, depth=depth, alpha=alpha, qc_logits=None)


def render_gaussians_orthographic(
    extrinsics: jax.Array,  # [B, V, 4, 4] camera-to-world
    width: jax.Array,  # [B, V] view width in world units
    height: jax.Array,  # [B, V]
    near: jax.Array,  # [B, V]
    far: jax.Array,  # [B, V]
    gaussians: Gaussians,
    image_shape: Tuple[int, int],
    background: Optional[jax.Array] = None,
    fov_degrees: float = 0.1,
    max_per_tile: int = 4096,
) -> RenderOutput:
    """Pseudo-orthographic rendering (reference render_cuda_orthographic,
    cuda_splatting.py:125-216): emulate an orthographic camera by pulling the
    camera back by d = (width/2) / tan(fov_x/2) with a tiny field of view, so
    perspective convergence is negligible across the view volume. No 1/near
    scene rescale (the reference variant is standalone, not wrapped by
    SplattingCUDA)."""
    h, w = image_shape
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    fov_x = jnp.deg2rad(jnp.float32(fov_degrees))
    tan_fov_x = jnp.tan(0.5 * fov_x)
    dist = (0.5 * width) / tan_fov_x  # [B, V]
    tan_fov_y = 0.5 * height / dist
    near = near + dist
    far = far + dist
    # move each camera back along its optical axis (reference :158-161)
    move = jnp.broadcast_to(jnp.eye(4), extrinsics.shape).at[..., 2, 3].set(-dist)
    ext = extrinsics @ move

    # pixel intrinsics from the tan-half-fovs (principal point centered)
    fx = 0.5 * w / tan_fov_x
    fy = 0.5 * h / tan_fov_y  # [B, V]
    zero = jnp.zeros_like(fy)
    one = jnp.ones_like(fy)
    intr_px = jnp.stack(
        [
            jnp.stack([jnp.broadcast_to(fx, fy.shape), zero, 0.5 * w * one], -1),
            jnp.stack([zero, fy, 0.5 * h * one], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        axis=-2,
    )  # [B, V, 3, 3]

    viewmats = jnp.linalg.inv(ext)
    sh_degree = int(round(gaussians.harmonics.shape[-1] ** 0.5)) - 1

    def render_view(means_i, covs_i, opac_i, harm_i, vm_v, ki_v, ext_v,
                    near_v, far_v):
        # one view per call: near/far are traced scalars (they vary per view
        # with the pull-back distance, unlike the perspective path)
        campos = ext_v[:3, 3]
        dirs = means_i - campos[None]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
        colors = eval_sh_colors(harm_i[None], dirs[None], sh_degree)
        c, dpt, a = rasterize(
            means_i, covs_i, opac_i, colors, vm_v[None], ki_v[None],
            image_shape, near=near_v, far=far_v, background=background,
            max_per_tile=max_per_tile,
        )
        return c[0], dpt[0], a[0]

    def render_item(means_i, covs_i, opac_i, harm_i, vm_i, ki_i, ext_i,
                    near_i, far_i):
        return jax.vmap(
            lambda vm_v, ki_v, ext_v, n_v, f_v: render_view(
                means_i, covs_i, opac_i, harm_i, vm_v, ki_v, ext_v, n_v, f_v
            )
        )(vm_i, ki_i, ext_i, near_i, far_i)

    color, depth, alpha = jax.vmap(render_item)(
        gaussians.means, gaussians.covariances, gaussians.opacities,
        gaussians.harmonics, viewmats, intr_px, ext, near, far,
    )
    return RenderOutput(color=jnp.clip(color, 0.0, 1.0), depth=depth, alpha=alpha)


def render_color_and_qc(
    gaussians: Gaussians,
    qc_class_probs: jax.Array,
    qc_mask_cols: jax.Array,
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    image_shape: Tuple[int, int],
    background: Optional[jax.Array] = None,
    max_per_tile: int = 4096,
) -> Tuple[RenderOutput, jax.Array]:
    """Fused eval-path render: SH color + depth + factored query-class
    channels composited over ONE shared projection/depth-sort/tile-binning
    per view (VERDICT r2 #10). The reference renders color and qc logits
    from the same gaussians and cameras (gaussian_renderer.py:49-110) but
    pays two full rasterizations; here the geometry work — the
    sort-binning that dominates the rasterizer (BASELINE.md) — runs once
    and only the per-channel-set compositing differs.

    Returns (RenderOutput(color, depth, alpha), qc [B, V, S, C+1, H, W]) —
    identical outputs to render_gaussians + render_qc_factored.
    """
    from siu3r_tpu.render.rasterizer import rasterize_multi

    h, w = image_shape
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    ext = extrinsics.at[..., :3, 3].multiply(SCALE_FACTOR)
    means = gaussians.means * SCALE_FACTOR
    covs = gaussians.covariances * (SCALE_FACTOR**2)
    near, far = 1.0, FAR * SCALE_FACTOR
    intr_px = intrinsics.at[..., 0, :].multiply(w).at[..., 1, :].multiply(h)
    viewmats = jnp.linalg.inv(ext)
    sh_degree = int(round(gaussians.harmonics.shape[-1] ** 0.5)) - 1
    s = qc_mask_cols.shape[-1]

    def item(means_i, covs_i, opac_i, harm_i, cols_i, class_i, vm_i, ki_i,
             ext_i):
        campos = ext_i[:, :3, 3]  # [V, 3]
        dirs = means_i[None] - campos[:, None]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
        sh_colors = eval_sh_colors(harm_i[None], dirs, sh_degree)  # [V, G, 3]
        (color, qc_ch), depth, alpha = rasterize_multi(
            means_i, covs_i, opac_i, [sh_colors, cols_i], vm_i, ki_i,
            image_shape, near=near, far=far, max_per_tile=max_per_tile,
            channel_chunk=max(64, s),
        )
        color = color + (1.0 - alpha)[..., None] * background[None, None, :]
        qc = jnp.einsum("vhws,sc->vschw", qc_ch, class_i)
        return color, depth, alpha, qc

    color, depth, alpha, qc = jax.vmap(item)(
        means, covs, gaussians.opacities, gaussians.harmonics, qc_mask_cols,
        qc_class_probs, viewmats, intr_px, ext,
    )
    render = RenderOutput(
        color=jnp.clip(color, 0.0, 1.0), depth=depth, alpha=alpha
    )
    return render, qc


def render_qc_factored(
    gaussians: Gaussians,
    qc_class_probs: jax.Array,
    qc_mask_cols: jax.Array,
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    image_shape: Tuple[int, int],
    max_per_tile: int = 4096,
) -> jax.Array:
    """Novel-view query-class-logit rendering from factorized inputs.

    qc_class_probs [B, S, C+1] (post['qc_class_probs']);
    qc_mask_cols [B, G, S] per-gaussian mask probabilities (the
    post['qc_mask_probs'] tensor flattened to gaussians).
    Returns [B, V, S, C+1, H, W] — identical to splatting the full
    Q*(C+1)-channel product like the reference (gaussian_renderer.py:75-110),
    since the class term is per-slot constant.
    """
    h, w = image_shape
    ext = extrinsics.at[..., :3, 3].multiply(SCALE_FACTOR)
    means = gaussians.means * SCALE_FACTOR
    covs = gaussians.covariances * (SCALE_FACTOR**2)
    near, far = 1.0, FAR * SCALE_FACTOR
    intr_px = intrinsics.at[..., 0, :].multiply(w).at[..., 1, :].multiply(h)
    viewmats = jnp.linalg.inv(ext)
    s = qc_mask_cols.shape[-1]

    def item(means_i, covs_i, opac_i, cols_i, class_i, vm_i, ki_i):
        rendered, _, _ = rasterize(
            means_i, covs_i, opac_i, cols_i, vm_i, ki_i, image_shape,
            near=near, far=far, max_per_tile=max_per_tile,
            channel_chunk=max(8, s),
        )  # [V, H, W, S]
        return jnp.einsum("vhws,sc->vschw", rendered, class_i)

    return jax.vmap(item)(
        means, covs, gaussians.opacities, qc_mask_cols,
        qc_class_probs, viewmats, intr_px,
    )
