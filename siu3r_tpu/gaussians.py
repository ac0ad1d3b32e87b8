"""Gaussians container: a JAX pytree holding pixel-aligned 3D Gaussian fields.

Mirrors the semantics of the reference container (reference:
src/utils/gaussians_types.py:4-38) but as a registered, immutable pytree so it
flows through jit/vmap/pjit. Dynamic attributes of the reference (e.g.
``semantic_labels`` attached by post-processing) are explicit optional fields
here: XLA needs static pytree structure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Gaussians:
    """Batched Gaussian fields.

    Shapes (after flattening views): ``means [B, G, 3]``,
    ``covariances [B, G, 3, 3]``, ``harmonics [B, G, 3, d_sh]``,
    ``opacities [B, G]``, ``scales [B, G, 3]``, ``rotations [B, G, 4]``
    (xyzw). Optional segmentation fields are attached by the panoptic
    post-process: ``semantic_labels``/``instance_labels`` ``[B, G]`` int32 and
    ``seg_query_class_logits`` ``[B, G, Q, C+1]`` (padded to a fixed query
    count ``Q`` for jit-ability; reference keeps a ragged list instead).
    ``seg_query_valid`` ``[B, Q]`` marks which query slots are live.
    """

    means: jax.Array
    covariances: jax.Array
    harmonics: jax.Array
    opacities: jax.Array
    scales: jax.Array
    rotations: jax.Array
    semantic_labels: Optional[jax.Array] = None
    instance_labels: Optional[jax.Array] = None
    seg_query_class_logits: Optional[jax.Array] = None
    seg_query_scores: Optional[jax.Array] = None
    seg_query_valid: Optional[jax.Array] = None

    def replace(self, **updates: Any) -> "Gaussians":
        return dataclasses.replace(self, **updates)

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[-2]

    def flatten_views(self) -> "Gaussians":
        """[B, V, R, ...] -> [B, V*R, ...] for the per-pixel fields."""

        def flat(x):
            if x is None:
                return None
            b, v, r = x.shape[:3]
            return x.reshape((b, v * r) + x.shape[3:])

        return Gaussians(
            means=flat(self.means),
            covariances=flat(self.covariances),
            harmonics=flat(self.harmonics),
            opacities=flat(self.opacities),
            scales=flat(self.scales),
            rotations=flat(self.rotations),
            semantic_labels=self.semantic_labels,
            instance_labels=self.instance_labels,
            seg_query_class_logits=self.seg_query_class_logits,
            seg_query_scores=self.seg_query_scores,
            seg_query_valid=self.seg_query_valid,
        )

    def to_host(self) -> "Gaussians":
        """Device -> host copy of every array field (reference
        detach_cpu_copy, src/utils/gaussians_types.py:25-38)."""
        return jax.tree.map(lambda x: jax.device_get(x), self)

    def __getitem__(self, idx) -> "Gaussians":
        return jax.tree.map(lambda x: x[idx], self)


def quaternion_to_matrix(quat_xyzw: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Unit-quaternion (scipy xyzw order) -> rotation matrix [*, 3, 3].

    Matches reference src/models/gaussian_adapter.py:11-33 (which normalizes
    by the squared norm inside, so non-unit quaternions are handled).
    """
    i, j, k, r = jnp.moveaxis(quat_xyzw, -1, 0)
    two_s = 2.0 / (jnp.sum(quat_xyzw * quat_xyzw, axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(o.shape[:-1] + (3, 3))


def build_covariance(scale: jax.Array, rotation_xyzw: jax.Array) -> jax.Array:
    """Cov = R diag(s) diag(s)^T R^T (reference gaussian_adapter.py:36-47)."""
    rot = quaternion_to_matrix(rotation_xyzw)
    # R @ diag(s^2) @ R^T  ==  (R * s^2[None,:]) @ R^T
    return jnp.einsum("...ik,...k,...jk->...ij", rot, scale * scale, rot)
