"""msda Pallas kernel vs the jnp/XLA reference (interpret mode on CPU)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import siu3r_tpu.ops.deformable as D
import siu3r_tpu.ops.msda_pallas as M


_ORIG = M.pl.pallas_call


@pytest.fixture()
def interpret_mode(monkeypatch):
    def patched(*a, **k):
        k["interpret"] = True
        return _ORIG(*a, **k)

    monkeypatch.setattr(M.pl, "pallas_call", patched)


@pytest.mark.parametrize(
    "shapes,lq,h,d,p",
    [
        (((16, 16),), 100, 4, 8, 4),  # adapter-like, single level
        (((16, 16), (8, 8)), 123, 4, 8, 4),  # multi-level, ragged Lq
    ],
)
def test_msda_pallas_matches_reference(interpret_mode, shapes, lq, h, d, p):
    n = 2
    nl = len(shapes)
    hw = sum(a * b for a, b in shapes)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    val = jax.random.normal(k1, (n, hw, h, d))
    # sampling locations slightly outside [0, 1] to exercise OOB corner taps
    loc = jax.random.uniform(k2, (n, lq, h, nl, p, 2)) * 1.2 - 0.1
    aw = jax.nn.softmax(
        jax.random.normal(k3, (n, lq, h, nl * p)), axis=-1
    ).reshape(n, lq, h, nl, p)

    ours = M.msda_pallas(val, shapes, loc, aw)
    ref = D._msda_matmul(val, shapes, loc, aw)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-6)


def test_msda_pallas_grad_matches(interpret_mode):
    """custom_vjp backward (jnp twin) agrees with differentiating the
    reference directly."""
    n, lq, h, d, p = 1, 32, 2, 4, 4
    shapes = ((8, 8),)
    hw = 64
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    val = jax.random.normal(k1, (n, hw, h, d))
    loc = jax.random.uniform(k2, (n, lq, h, 1, p, 2))
    aw = jax.nn.softmax(jax.random.normal(k3, (n, lq, h, 1, p)), axis=-1)

    g1 = jax.grad(lambda v, l, a: M.msda_pallas(v, shapes, l, a).sum(), (0, 1, 2))(
        val, loc, aw
    )
    g2 = jax.grad(lambda v, l, a: D._msda_matmul(v, shapes, l, a).sum(), (0, 1, 2))(
        val, loc, aw
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
