"""A/B bench: counting vs key-sort rasterizer binning on the TPU.

Throughput-timed (N dispatches, one sync — per-call sync measures the axon
tunnel). Also times the full rasterize() with each binning to capture the
end-to-end effect."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from siu3r_tpu.render import rasterizer as R
from siu3r_tpu.render.projection import ProjectedGaussians

G, H, W = 131072, 256, 256
k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 3)
proj = ProjectedGaussians(
    mean2d=jax.random.uniform(ks[0], (G, 2), minval=-20, maxval=276),
    conic=jnp.ones((G, 3)) * 0.05,
    depth=jax.random.uniform(ks[1], (G,), minval=0.5, maxval=10),
    radius=jax.random.uniform(ks[2], (G,), minval=0.0, maxval=30),
)

for name, fn in [
    ("sort", R.bin_gaussians_sort),
    ("count", R.bin_gaussians_count),
    ("pallas", R.bin_gaussians_pallas),
]:
    f = jax.jit(lambda p, fn=fn: fn(p, (H, W), 4096, 4, 2))
    t, c = f(proj)
    jax.block_until_ready((t, c))
    outs = []
    t0 = time.time()
    for _ in range(20):
        outs.append(f(proj))
    jax.block_until_ready(outs)
    # host transfer to defeat the tunnel's async reporting
    float(outs[-1][1].sum())
    dt = (time.time() - t0) / 20
    print(f"bin[{name}]: {dt * 1000:.2f} ms/view", file=sys.stderr)

# end-to-end rasterize() with each binning (6 views, like the eval step)
import numpy as np

rng = np.random.RandomState(0)
means = jnp.asarray(rng.rand(G, 3) * 4 - 2 + np.array([0, 0, 4]), jnp.float32)
covs = jnp.broadcast_to(jnp.eye(3) * 1e-4, (G, 3, 3))
opac = jnp.asarray(rng.rand(G) * 0.7 + 0.2, jnp.float32)
colors = jnp.asarray(rng.rand(G, 3), jnp.float32)
viewmats = jnp.broadcast_to(jnp.eye(4), (6, 4, 4))
intr = jnp.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])
intrs = jnp.broadcast_to(intr, (6, 3, 3))

for name, fn in [
    ("sort", R.bin_gaussians_sort),
    ("count", R.bin_gaussians_count),
    ("pallas", R.bin_gaussians_pallas),
]:
    R.bin_gaussians = fn

    @jax.jit
    def render(m, cv, o, c, vm, kk):
        cols, depth, alpha = R.rasterize_multi(m, cv, o, [c], vm, kk, (H, W))
        return cols[0].sum() + depth.sum() + alpha.sum()

    float(render(means, covs, opac, colors, viewmats, intrs))
    t0 = time.time()
    for _ in range(5):
        float(render(means, covs, opac, colors, viewmats, intrs))
    dt = (time.time() - t0) / 5
    print(f"rasterize_multi[{name}] 6 views: {dt * 1000:.1f} ms", file=sys.stderr)
