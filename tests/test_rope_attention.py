"""rope_attention consistency: the XLA fallback path must equal explicit
rope2d + attention (the fused TPU kernel is validated bit-exact against this
on hardware; see BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from siu3r_tpu.ops.attention import rope_attention, xla_attention
from siu3r_tpu.ops.rope import rope2d


def test_rope_attention_matches_unfused():
    key = jax.random.PRNGKey(0)
    b, h, nq, nk, d = 1, 4, 17, 17, 16
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, nq, d))
    k = jax.random.normal(ks[1], (b, h, nk, d))
    v = jax.random.normal(ks[2], (b, h, nk, d))
    pos = jnp.asarray(np.random.RandomState(0).randint(0, 5, (b, nq, 2)))
    fused = rope_attention(q, k, v, pos, pos, rope_base=100.0)
    ref = xla_attention(
        rope2d(q, pos), rope2d(k, pos), v, d**-0.5
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)
