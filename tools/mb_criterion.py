"""Microbench: criterion fwd + grad standalone on TPU at B=3 real shapes."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, sys
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from siu3r_tpu.train.losses import segmentation_loss

B, O, V, H, W, Q, C = 3, 48, 2, 256, 256, 100, 20
hh, ww = H // 4, W // 4
L = 10
rng = jax.random.PRNGKey(0)
ks = jax.random.split(rng, 4)
cls = [jax.random.normal(jax.random.fold_in(ks[0], i), (B, Q, C + 1)) for i in range(L)]
msk = [jax.random.normal(jax.random.fold_in(ks[1], i), (B, Q, V, hh, ww)) for i in range(L)]
gt_masks = (jax.random.uniform(ks[2], (B, O, V, H, W)) > 0.8).astype(jnp.float32)
gt_classes = jax.random.randint(ks[3], (B, O), 0, C)
gt_valid = jnp.broadcast_to(jnp.arange(O)[None] < 15, (B, O))


def crit(params_msk, params_cls, r):
    out = segmentation_loss(params_cls, params_msk, gt_masks, gt_classes,
                            gt_valid, r, num_labels=C)
    return out["seg_total"]


fwd = jax.jit(crit)
# scalarized grad: timing syncs via a device->host read (block_until_ready
# does not reliably synchronize through the axon tunnel — round-5 finding)
grad = jax.jit(
    lambda m, c, r_: sum(
        x.sum()
        for x in jax.tree_util.tree_leaves(
            jax.grad(crit, argnums=(0, 1))(m, c, r_)
        )
    )
)
r = jax.random.PRNGKey(7)

t0 = time.time(); float(fwd(msk, cls, r)); print(f"fwd compile+run {time.time()-t0:.1f}s", file=sys.stderr)
ts = []
for _ in range(4):
    t0 = time.time(); float(fwd(msk, cls, r)); ts.append(time.time() - t0)
print(f"criterion fwd: {min(ts)*1000:.1f} ms (incl ~29 ms tunnel sync)", file=sys.stderr)

t0 = time.time(); float(grad(msk, cls, r)); print(f"grad compile+run {time.time()-t0:.1f}s", file=sys.stderr)
ts = []
for _ in range(4):
    t0 = time.time(); float(grad(msk, cls, r)); ts.append(time.time() - t0)
print(f"criterion grad: {min(ts)*1000:.1f} ms (incl ~29 ms tunnel sync)", file=sys.stderr)
