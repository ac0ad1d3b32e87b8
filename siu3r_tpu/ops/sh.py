"""Real spherical-harmonics color evaluation (degrees 0-4).

Same convention as the 3DGS CUDA rasterizers (gsplat sh.cu /
diff-gaussian-rasterization computeColorFromSH): view direction normalized,
result = sum_l sum_m c_lm * Y_lm(dir), then +0.5 and clamp at 0.
Constants validated against scipy's complex SH in tests/test_sh.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def sh_basis(dirs: jax.Array, degree: int) -> jax.Array:
    """dirs [..., 3] (normalized) -> basis [..., (degree+1)**2]."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [C0 * one]
    if degree >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        out += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3.0 * xx - yy),
            C4[2] * xy * (7.0 * zz - 1.0),
            C4[3] * yz * (7.0 * zz - 3.0),
            C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            C4[5] * xz * (7.0 * zz - 3.0),
            C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            C4[7] * xz * (xx - 3.0 * yy),
            C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh_colors(harmonics: jax.Array, dirs: jax.Array, degree: int) -> jax.Array:
    """harmonics [..., 3, d_sh]; dirs [..., 3] -> rgb [..., 3]
    (with the 3DGS +0.5 offset and clamp-to-positive)."""
    d_sh = (degree + 1) ** 2
    basis = sh_basis(dirs, degree)  # [..., d_sh]
    # per-channel multiply-reduce instead of einsum: the [..., 3, d_sh]
    # contraction puts (3, d_sh) minor-most, padded to (8, 128) tiles on
    # TPU (a 768 MB train-step backward allocation at G=131k, round 3);
    # three [..., d_sh] elementwise reductions tile cleanly
    rgb = jnp.stack(
        [
            jnp.sum(harmonics[..., ci, :d_sh] * basis, axis=-1)
            for ci in range(3)
        ],
        axis=-1,
    )
    return jnp.maximum(rgb + 0.5, 0.0)
