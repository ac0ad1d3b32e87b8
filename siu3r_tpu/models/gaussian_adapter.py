"""Raw head outputs -> constrained Gaussian parameters.

Activation pipeline matches reference src/models/gaussian_adapter.py:50-110:
sigmoid opacity; scale = min(0.001*softplus(s), 0.3); quaternion normalized;
SH bands >=1 damped by 0.1*0.25^degree; covariance = R S S^T R^T; means are
the pts3d-head point map (Gaussian centers ARE the predicted points).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from siu3r_tpu.gaussians import Gaussians, build_covariance


def sh_degree_mask(sh_degree: int) -> jnp.ndarray:
    d_sh = (sh_degree + 1) ** 2
    mask = jnp.ones((d_sh,), jnp.float32)
    for degree in range(1, sh_degree + 1):
        mask = mask.at[degree**2 : (degree + 1) ** 2].set(0.1 * 0.25**degree)
    return mask


def adapt_gaussians(
    means: jax.Array,
    raw: jax.Array,
    sh_degree: int = 4,
    eps: float = 1e-8,
) -> Gaussians:
    """means [..., 3]; raw [..., 1+3+4+3*d_sh] (opacity, scale, rot, sh)."""
    d_sh = (sh_degree + 1) ** 2
    opacities = jax.nn.sigmoid(raw[..., 0])
    scales = 0.001 * jax.nn.softplus(raw[..., 1:4])
    scales = jnp.minimum(scales, 0.3)
    rotations = raw[..., 4:8]
    rot_norm = rotations / (jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps)
    sh = raw[..., 8 : 8 + 3 * d_sh]
    sh = sh.reshape(sh.shape[:-1] + (3, d_sh)) * sh_degree_mask(sh_degree)
    covariances = build_covariance(scales, rot_norm)
    return Gaussians(
        means=means,
        covariances=covariances,
        harmonics=sh,
        opacities=opacities,
        scales=scales,
        rotations=rotations,
    )
