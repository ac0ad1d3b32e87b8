"""EWA splat projection: 3D Gaussians -> screen-space 2D Gaussians.

Same math as the tile-based CUDA rasterizers the reference depends on
(diff-gaussian-rasterization / gsplat, consumed via
src/models/cuda_splatting.py:46-122): camera-space transform, perspective
Jacobian with the 1.3*tan_fov frustum clamp, 2D covariance + 0.3 low-pass,
conic + 3-sigma radius. Pure jnp — these are dense vectorized ops XLA maps
straight onto the VPU/MXU; the Pallas kernel only handles the per-tile
compositing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ProjectedGaussians(NamedTuple):
    mean2d: jax.Array  # [G, 2] pixel coords
    conic: jax.Array  # [G, 3] inverse 2D covariance (a, b, c)
    depth: jax.Array  # [G] camera-space z
    radius: jax.Array  # [G] pixel radius (0 = culled)


def project_gaussians(
    means: jax.Array,
    covariances: jax.Array,
    viewmat: jax.Array,
    intrinsics_px: jax.Array,
    image_size: tuple[int, int],
    near: float = 0.2,
    far: float = 1000.0,
) -> ProjectedGaussians:
    """means [G, 3] world; covariances [G, 3, 3]; viewmat [4, 4]
    world-to-camera; intrinsics_px [3, 3] in PIXELS; image_size (H, W)."""
    h, w = image_size
    fx, fy = intrinsics_px[0, 0], intrinsics_px[1, 1]
    cx, cy = intrinsics_px[0, 2], intrinsics_px[1, 2]
    rot = viewmat[:3, :3]
    trans = viewmat[:3, 3]

    t = means @ rot.T + trans  # [G, 3] camera space
    tz = t[..., 2]
    depth = tz

    tan_fovx = w / (2.0 * fx)
    tan_fovy = h / (2.0 * fy)
    # frustum clamp for the Jacobian (3DGS forward.cu computeCov2D)
    txz = jnp.clip(t[..., 0] / tz, -1.3 * tan_fovx, 1.3 * tan_fovx) * tz
    tyz = jnp.clip(t[..., 1] / tz, -1.3 * tan_fovy, 1.3 * tan_fovy) * tz

    z2 = tz * tz
    # cov2d = (J R) Sigma (J R)^T expanded to ELEMENTWISE [G] component
    # arithmetic: batched [G, 2, 3] matrix products put the tiny 2/3 dims
    # minor-most, which the TPU pads to (8, 128) tiles — the train-step
    # backward materialized a [B, V, G, 2, 3] cotangent at 42.7x padding
    # (36 MB -> 1.5 GB, round-3 OOM). Component form keeps every tensor
    # [G]-shaped and pad-free; same math, same autodiff.
    # Rows of M = J @ rot:  m0 = (fx/tz) r0 - (fx txz/z^2) r2,
    #                       m1 = (fy/tz) r1 - (fy tyz/z^2) r2.
    k0 = fx / tz
    k1 = -fx * txz / z2
    k2 = fy / tz
    k3 = -fy * tyz / z2
    m0 = [k0 * rot[0, j] + k1 * rot[2, j] for j in range(3)]  # 3 x [G]
    m1 = [k2 * rot[1, j] + k3 * rot[2, j] for j in range(3)]
    sig = [[covariances[..., i, j] for j in range(3)] for i in range(3)]
    # s0 = m0 Sigma, s1 = m1 Sigma  (3 x [G] each)
    s0 = [sum(m0[i] * sig[i][j] for i in range(3)) for j in range(3)]
    s1 = [sum(m1[i] * sig[i][j] for i in range(3)) for j in range(3)]
    a = sum(s0[j] * m0[j] for j in range(3)) + 0.3
    b = sum(s0[j] * m1[j] for j in range(3))
    c = sum(s1[j] * m1[j] for j in range(3)) + 0.3

    det = a * c - b * b
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    # ndc2Pix mapping: pix = ((ndc+1)*S - 1)/2 = f * t/z + c - 0.5
    u = fx * t[..., 0] / tz + cx - 0.5
    v = fy * t[..., 1] / tz + cy - 0.5
    mean2d = jnp.stack([u, v], axis=-1)

    valid = (depth > near) & (depth < far) & (det > 0)
    # off-screen cull
    valid &= (u + radius > 0) & (u - radius < w) & (v + radius > 0) & (v - radius < h)
    radius = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(mean2d=mean2d, conic=conic, depth=depth, radius=radius)
