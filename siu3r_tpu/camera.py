"""Camera / projection math (pure jnp).

Same conventions as the reference (src/utils/projection.py): normalized
intrinsics (pixel coords divided by image size), OpenCV-style camera (x right,
y down, z forward), extrinsics are camera-to-world 4x4.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def homogenize_points(points: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz1 (reference projection.py:9-13)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogenize_vectors(vectors: jnp.ndarray) -> jnp.ndarray:
    """(..., d) xyz -> (..., d+1) xyz0 (reference projection.py:16-20)."""
    return jnp.concatenate([vectors, jnp.zeros_like(vectors[..., :1])], axis=-1)


def transform_rigid(homogeneous: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", transformation, homogeneous)


def transform_cam2world(homogeneous: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(homogeneous, extrinsics)


def transform_world2cam(homogeneous: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    return transform_rigid(homogeneous, jnp.linalg.inv(extrinsics))


def project_camera_space(
    points: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = float(np.finfo(np.float32).eps),
    infinity: float = 1e8,
) -> jnp.ndarray:
    """Perspective division + intrinsics (reference projection.py:47-56)."""
    points = points / (points[..., -1:] + epsilon)
    points = jnp.nan_to_num(points, posinf=infinity, neginf=-infinity)
    points = jnp.einsum("...ij,...j->...i", intrinsics, points)
    return points[..., :-1]


def project(
    points: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    epsilon: float = float(np.finfo(np.float32).eps),
):
    """World points -> normalized image xy + in-front mask
    (reference projection.py:59-71)."""
    points = homogenize_points(points)
    points = transform_world2cam(points, extrinsics)[..., :-1]
    in_front = points[..., -1] >= 0
    return project_camera_space(points, intrinsics, epsilon=epsilon), in_front


def unproject(coordinates: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Normalized xy + depth -> camera-space xyz (reference projection.py:74-88)."""
    coordinates = homogenize_points(coordinates)
    ray_directions = jnp.einsum(
        "...ij,...j->...i", jnp.linalg.inv(intrinsics), coordinates
    )
    return ray_directions * z[..., None]


def get_world_rays(coordinates: jnp.ndarray, extrinsics: jnp.ndarray, intrinsics: jnp.ndarray):
    """Normalized xy -> world-space ray origins+directions
    (reference projection.py:91-114)."""
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = homogenize_vectors(directions)
    directions = transform_cam2world(directions, extrinsics)[..., :-1]
    origins = jnp.broadcast_to(extrinsics[..., :-1, -1], directions.shape)
    return origins, directions


def sample_image_grid(shape: tuple[int, ...]):
    """Normalized (0..1) xy coordinates + integer ij indices
    (reference projection.py:131-151)."""
    indices = [jnp.arange(length) for length in shape]
    stacked_indices = jnp.stack(jnp.meshgrid(*indices, indexing="ij"), axis=-1)
    coordinates = [(idx + 0.5) / length for idx, length in zip(indices, shape)]
    coordinates = list(reversed(coordinates))
    coordinates = jnp.stack(jnp.meshgrid(*coordinates, indexing="xy"), axis=-1)
    return coordinates, stacked_indices


def get_local_rays(coordinates: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Camera-space unit ray directions (reference projection.py:117-128)."""
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    return directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)


def intersect_rays(
    origins_x: jnp.ndarray,
    directions_x: jnp.ndarray,
    origins_y: jnp.ndarray,
    directions_y: jnp.ndarray,
    eps: float = 1e-5,
    inf: float = 1e10,
) -> jnp.ndarray:
    """Least-squares intersection of ray pairs (reference
    projection.py:190-244). Parallel pairs return ``inf`` (kept dense under
    jit instead of the reference's boolean-mask compaction)."""
    shape = jnp.broadcast_shapes(
        origins_x.shape, directions_x.shape, origins_y.shape, directions_y.shape
    )
    ox = jnp.broadcast_to(origins_x, shape)
    dx = jnp.broadcast_to(directions_x, shape)
    oy = jnp.broadcast_to(origins_y, shape)
    dy = jnp.broadcast_to(directions_y, shape)
    parallel = jnp.sum(dx * dy, axis=-1) > 1 - eps

    def n_mat(d):
        return jnp.einsum("...i,...j->...ij", d, d) - jnp.eye(3)

    nx, ny = n_mat(dx), n_mat(dy)
    lhs = nx + ny
    rhs = jnp.einsum("...ij,...j->...i", nx, ox) + jnp.einsum(
        "...ij,...j->...i", ny, oy
    )
    sol = jnp.linalg.lstsq(lhs, rhs)[0]
    return jnp.where(parallel[..., None], inf, sol)


def sample_training_rays(
    image: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsics: jnp.ndarray,
    num_rays: int,
    rng,
):
    """Random ray/pixel sampling for ray-supervised training (reference
    projection.py:154-187). image [B, V, H, W, C] (NHWC here)."""
    import jax

    b, v, h, w, _ = image.shape
    xy, _ = sample_image_grid((h, w))
    origins, directions = get_world_rays(
        xy[..., None, None, :], extrinsics, intrinsics
    )
    origins = origins.transpose(2, 3, 0, 1, 4).reshape(b, v * h * w, 3)
    directions = directions.transpose(2, 3, 0, 1, 4).reshape(b, v * h * w, 3)
    pixels = image.reshape(b, v * h * w, -1)
    idx = jax.random.randint(rng, (b, num_rays), 0, v * h * w)
    take = lambda t: jnp.take_along_axis(t, idx[..., None], axis=1)
    return take(origins), take(directions), take(pixels)


def get_fov(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Horizontal/vertical FoV from normalized intrinsics
    (reference projection.py:247-261)."""
    intrinsics_inv = jnp.linalg.inv(intrinsics)

    def process(vector):
        v = jnp.einsum("...ij,j->...i", intrinsics_inv, jnp.asarray(vector, jnp.float32))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    left = process([0.0, 0.5, 1.0])
    right = process([1.0, 0.5, 1.0])
    top = process([0.5, 0.0, 1.0])
    bottom = process([0.5, 1.0, 1.0])
    fov_x = jnp.arccos(jnp.sum(left * right, axis=-1))
    fov_y = jnp.arccos(jnp.sum(top * bottom, axis=-1))
    return jnp.stack((fov_x, fov_y), axis=-1)


def get_projection_matrix(
    near: jnp.ndarray, far: jnp.ndarray, fov_x: jnp.ndarray, fov_y: jnp.ndarray
) -> jnp.ndarray:
    """OpenCV-style frustum projection: X/Y -> (-1,1), Z -> (0,1), Z flipped
    (reference src/models/cuda_splatting.py:16-43)."""
    tan_fov_x = jnp.tan(0.5 * fov_x)
    tan_fov_y = jnp.tan(0.5 * fov_y)
    top = tan_fov_y * near
    right = tan_fov_x * near
    b = near.shape[0]
    result = jnp.zeros((b, 4, 4), dtype=jnp.float32)
    result = result.at[:, 0, 0].set(2 * near / (2 * right))
    result = result.at[:, 1, 1].set(2 * near / (2 * top))
    result = result.at[:, 3, 2].set(1.0)
    result = result.at[:, 2, 2].set(far / (far - near))
    result = result.at[:, 2, 3].set(-(far * near) / (far - near))
    return result


def relative_pose(poses: jnp.ndarray) -> jnp.ndarray:
    """Make all poses relative to the first one: world frame = first camera
    (reference src/data/components/scannet_dataset.py:90-114 semantics)."""
    inv0 = jnp.linalg.inv(poses[..., 0, :, :])
    return jnp.einsum("...ij,...vjk->...vik", inv0, poses)
