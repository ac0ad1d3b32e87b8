"""Decompose the B=3 train step: model fwd+bwd vs render losses vs criterion.

Same shapes as bench.py --train 3 (reference config: 2 context views,
4 target views = context + num_extra_target_views 2, O=48, 15 valid).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from siu3r_tpu.config import RootCfg, bind_scannet_classes
from siu3r_tpu.pipeline import Pipeline
from siu3r_tpu.renderer import render_gaussians
from siu3r_tpu.train.losses import (
    depth_smoothness_loss, mse_render_loss,
)
from siu3r_tpu.train import lpips as lpips_mod
from siu3r_tpu.models.layers import bilinear_resize_torch

root = bind_scannet_classes(RootCfg())
B, V, H, W = 3, 2, 256, 256
NT = V + 2
O = 48
pipe = Pipeline(root, steps_per_epoch=1000)
rng = np.random.RandomState(0)
intr = np.array([[318/256.0, 0, 0.5], [0, 318/256.0, 0.5], [0, 0, 1]], np.float32)  # NORMALIZED (pixelSplat convention, renderer multiplies by W/H)
exts = np.stack([np.eye(4, dtype=np.float32)] * NT)
for i in range(NT):
    exts[i, 0, 3] = 0.1 * i
tgt_ids = np.arange(NT, dtype=np.int32) * 10
ctx_ids = tgt_ids[np.round(np.linspace(0, NT - 1, V)).astype(np.int32)]
batch = {
    "context_views_id": jnp.asarray(np.broadcast_to(ctx_ids, (B, V)).copy()),
    "target_views_id": jnp.asarray(np.broadcast_to(tgt_ids, (B, NT)).copy()),
    "context_views_images": jnp.asarray(rng.rand(B, V, H, W, 3), jnp.float32),
    "context_views_intrinsics": jnp.asarray(np.broadcast_to(intr, (B, V, 3, 3)).copy()),
    "target_views_images": jnp.asarray(rng.rand(B, NT, H, W, 3), jnp.float32),
    "target_views_intrinsics": jnp.asarray(np.broadcast_to(intr, (B, NT, 3, 3)).copy()),
    "target_views_extrinsics": jnp.asarray(np.broadcast_to(exts, (B, NT, 4, 4)).copy()),
    "gt_masks": jnp.asarray((rng.rand(B, O, V, H, W) > 0.8).astype(np.float32)),
    "gt_classes": jnp.asarray(rng.randint(0, 20, (B, O)), jnp.int32),
    "gt_valid": jnp.asarray(np.broadcast_to(np.arange(O)[None] < 15, (B, O)).copy()),
}
state = pipe.init_state(jax.random.PRNGKey(0), batch)


def _scalarize(fn):
    """Reduce a pytree-returning fn to one scalar so the timing loop can
    sync via a device->host read — block_until_ready does not reliably
    synchronize through the axon tunnel (round-5 finding)."""
    def wrapped(*a):
        out = fn(*a)
        return sum(x.sum().astype(jnp.float32)
                   for x in jax.tree_util.tree_leaves(out))
    return wrapped


def timeit(name, fn, *args):
    t0 = time.time()
    float(fn(*args))  # host read = reliable sync
    print(f"{name} compile+run {time.time()-t0:.1f}s", file=sys.stderr)
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms (incl ~29 ms tunnel sync)",
          file=sys.stderr)


# ---- 1. model fwd + bwd (no losses): pull the whole graph via sums ----
def model_loss(params, bs, b):
    out, mut = pipe.model.apply(
        {"params": params, "batch_stats": bs},
        b["context_views_images"], b["context_views_intrinsics"],
        train=True, mutable=["batch_stats"],
    )
    g = out.gaussians
    s = (g.means.sum() + g.covariances.sum() + g.harmonics.sum()
         + g.opacities.sum())
    for c_, m_ in zip(out.seg.aux_class_logits, out.seg.aux_mask_logits):
        s = s + c_.sum() * 0 + m_.sum() * 0  # keep criterion inputs out of cost
    s = s + out.seg.aux_class_logits[-1].sum() + out.seg.aux_mask_logits[-1].sum()
    s = s + out.post["segmentation"].sum()
    return s.astype(jnp.float32)


mf = jax.jit(lambda p, bs: model_loss(p, bs, batch))
mg = jax.jit(_scalarize(
    jax.grad(lambda p: model_loss(p, state.batch_stats, batch))))
timeit("model fwd", mf, state.params, state.batch_stats)
timeit("model fwd+bwd", mg, state.params)

# ---- 2. render losses from FIXED gaussians ----
out0, _ = pipe.model.apply(
    {"params": state.params, "batch_stats": state.batch_stats},
    batch["context_views_images"], batch["context_views_intrinsics"],
    train=True, mutable=["batch_stats"],
)
g0 = out0.gaussians
seg_mask0 = jax.lax.stop_gradient(out0.post["segmentation"])
gtuple = (g0.means, g0.covariances, g0.harmonics, g0.opacities)


def render_losses(gt):
    import dataclasses as dc
    g = dc.replace(g0, means=gt[0], covariances=gt[1], harmonics=gt[2],
                   opacities=gt[3])
    render = render_gaussians(
        g, batch["target_views_extrinsics"], batch["target_views_intrinsics"],
        (H, W),
    )
    loss = mse_render_loss(render.color, batch["target_views_images"])
    loss = loss + 0.05 * depth_smoothness_loss(render.depth[:, :V], seg_mask0)
    pred_half = bilinear_resize_torch(
        render.color.reshape(B * NT, H, W, 3), (H // 2, W // 2),
        align_corners=True)
    tgt_half = bilinear_resize_torch(
        batch["target_views_images"].reshape(B * NT, H, W, 3),
        (H // 2, W // 2), align_corners=True)
    loss = loss + 0.5 * lpips_mod.lpips(pipe.lpips_params, pred_half, tgt_half)
    return loss


rf = jax.jit(render_losses)
rg = jax.jit(_scalarize(jax.grad(render_losses)))
timeit("render losses fwd", rf, gtuple)
timeit("render losses fwd+bwd", rg, gtuple)
