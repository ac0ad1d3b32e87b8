"""Rasterizer backward A/B: Pallas analytic kernel vs jnp-twin VJP.

Times rasterize fwd and fwd+grad at the training render shape
(G=131072 gaussians, 4 target views, 256^2) and cross-checks the two
backward implementations' gradients on-chip.

Usage:
    python tools/mb_raster_bwd.py           # Pallas backward (default)
    SIU3R_RASTER_BWD=jnp python tools/mb_raster_bwd.py   # old jnp twin
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# the custom VJP reads SIU3R_RASTER_BWD at TRACE time with default 'jnp'
# (rasterizer._rtd_bwd) — pin the documented default HERE, before any
# tracing, so the label below matches what actually runs and --check
# compares pallas-vs-jnp rather than jnp-vs-itself (ADVICE r4 #1)
_os.environ.setdefault("SIU3R_RASTER_BWD", "pallas")
import time, sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from siu3r_tpu.render.rasterizer import rasterize

G, V, H, W = 131072, 4, 256, 256
rng = np.random.RandomState(0)
# scene statistics approximating the model's output after the 1/near
# rescale: means a few units in front of the cameras, small covariances
means = rng.uniform(-3, 3, (G, 3)).astype(np.float32)
means[:, 2] = rng.uniform(2.0, 20.0, G)
scales = rng.uniform(0.005, 0.05, (G, 3)).astype(np.float32)
covs = np.einsum("gi,gj->gij", scales, scales) * 0.3
covs += np.eye(3, dtype=np.float32)[None] * (scales[:, :1, None] ** 2)
opac = rng.uniform(0.05, 0.95, G).astype(np.float32)
colors = rng.rand(G, 3).astype(np.float32)

exts = np.stack([np.eye(4, dtype=np.float32)] * V)
for i in range(V):
    exts[i, 0, 3] = 0.2 * i
viewmats = np.linalg.inv(exts)
intr = np.array([[318.0, 0, 128.0], [0, 318.0, 128.0], [0, 0, 1]], np.float32)
intr_v = np.broadcast_to(intr, (V, 3, 3)).copy()

args = tuple(
    jnp.asarray(x) for x in (means, covs, opac, colors, viewmats, intr_v)
)


def loss(means_, covs_, opac_, colors_):
    c, d, a = rasterize(
        means_, covs_, opac_, colors_, args[4], args[5], (H, W),
        near=1.0, far=1000.0,
    )
    return c.sum() + d.sum() + a.sum()


f = jax.jit(loss)
g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
# scalarized grad for TIMING: block_until_ready does not reliably
# synchronize through the axon tunnel (round-5 finding) — the only
# dependable sync is a device->host read, so every timed function must
# return a scalar we can float()
g_scalar = jax.jit(
    lambda *a: sum(x.sum() for x in jax.grad(loss, argnums=(0, 1, 2, 3))(*a))
)


def timeit(name, fn, *a):
    t0 = time.time()
    float(fn(*a))  # host read = reliable sync (axon tunnel)
    print(f"{name} compile+run {time.time()-t0:.1f}s", file=sys.stderr)
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(fn(*a))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms (incl ~29 ms tunnel sync)",
          file=sys.stderr)
    return min(ts)


mode = _os.environ.get("SIU3R_RASTER_BWD", "pallas")
timeit(f"[{mode}] raster fwd (4 views)", f, *args[:4])
timeit(f"[{mode}] raster fwd+grad (4 views)", g_scalar, *args[:4])

if mode != "jnp" and "--check" in sys.argv:
    # cross-check vs the jnp twin ON CHIP: rebuild the grad with the env
    # flipped (the flag is read at trace time inside the custom VJP)
    _os.environ["SIU3R_RASTER_BWD"] = "jnp"
    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    ref = g_ref(*args[:4])
    _os.environ["SIU3R_RASTER_BWD"] = "pallas"
    got = g(*args[:4])
    for name, a, b in zip(("means", "covs", "opac", "colors"), got, ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        print(f"grad {name}: max rel-to-peak err {err:.2e}", file=sys.stderr)
        assert err < 5e-3, (name, err)
    print("gradcheck OK", file=sys.stderr)
