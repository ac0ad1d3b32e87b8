"""Sub-attribute the render-loss share of the train step (VERDICT r4 #3).

Builds the SAME render-losses fwd+bwd graph as tools/mb_train_decomp.py
(fixed gaussians from one model forward; MSE + 0.5*LPIPS@half + depth
smoothness over B=3 x 4 target views x 131k gaussians), captures a device
trace of 3 grad steps, and aggregates device time by the named scopes
inside the renderer/rasterizer (sh_eval / raster_project / raster_binning /
raster_gather / raster_composite / lpips / ...), forward and backward
(transpose) separately.

Usage: python tools/trace_render.py [/tmp/r5_render_trace]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from siu3r_tpu.config import RootCfg, bind_scannet_classes
from siu3r_tpu.pipeline import Pipeline
from siu3r_tpu.renderer import render_gaussians
from siu3r_tpu.train.losses import depth_smoothness_loss, mse_render_loss
from siu3r_tpu.train import lpips as lpips_mod
from siu3r_tpu.models.layers import bilinear_resize_torch

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5_render_trace"

root = bind_scannet_classes(RootCfg())
B, V, H, W = 3, 2, 256, 256
NT = V + 2
pipe = Pipeline(root, steps_per_epoch=1000)
rng = np.random.RandomState(0)
intr = np.array([[318 / 256.0, 0, 0.5], [0, 318 / 256.0, 0.5], [0, 0, 1]],
                np.float32)
exts = np.stack([np.eye(4, dtype=np.float32)] * NT)
for i in range(NT):
    exts[i, 0, 3] = 0.1 * i
batch = {
    "context_views_images": jnp.asarray(rng.rand(B, V, H, W, 3), jnp.float32),
    "context_views_intrinsics": jnp.asarray(
        np.broadcast_to(intr, (B, V, 3, 3)).copy()),
    "target_views_images": jnp.asarray(rng.rand(B, NT, H, W, 3), jnp.float32),
    "target_views_intrinsics": jnp.asarray(
        np.broadcast_to(intr, (B, NT, 3, 3)).copy()),
    "target_views_extrinsics": jnp.asarray(
        np.broadcast_to(exts, (B, NT, 4, 4)).copy()),
}
state = pipe.init_state(jax.random.PRNGKey(0), batch)
out0, _ = pipe.model.apply(
    {"params": state.params, "batch_stats": state.batch_stats},
    batch["context_views_images"], batch["context_views_intrinsics"],
    train=True, mutable=["batch_stats"],
)
g0 = out0.gaussians
seg_mask0 = jax.lax.stop_gradient(out0.post["segmentation"])
gtuple = tuple(
    jax.lax.stop_gradient(x)
    for x in (g0.means, g0.covariances, g0.harmonics, g0.opacities)
)


def render_losses(gt):
    import dataclasses as dc
    g = dc.replace(g0, means=gt[0], covariances=gt[1], harmonics=gt[2],
                   opacities=gt[3])
    with jax.named_scope("render_block"):
        render = render_gaussians(
            g, batch["target_views_extrinsics"],
            batch["target_views_intrinsics"], (H, W),
        )
    with jax.named_scope("loss_mse"):
        loss = mse_render_loss(render.color, batch["target_views_images"])
    with jax.named_scope("loss_smooth"):
        loss = loss + 0.05 * depth_smoothness_loss(render.depth[:, :V],
                                                   seg_mask0)
    with jax.named_scope("loss_lpips"):
        pred_half = bilinear_resize_torch(
            render.color.reshape(B * NT, H, W, 3), (H // 2, W // 2),
            align_corners=True)
        tgt_half = bilinear_resize_torch(
            batch["target_views_images"].reshape(B * NT, H, W, 3),
            (H // 2, W // 2), align_corners=True)
        loss = loss + 0.5 * lpips_mod.lpips(pipe.lpips_params, pred_half,
                                            tgt_half)
    return loss


# scalarize the grad so the timing loop syncs via a device->host read —
# block_until_ready does not reliably synchronize through the axon tunnel
rg = jax.jit(
    lambda gt: sum(
        x.sum() for x in jax.tree_util.tree_leaves(jax.grad(render_losses)(gt))
    )
)
rf = jax.jit(render_losses)

t0 = time.time()
float(rg(gtuple))
print(f"compile+run {time.time() - t0:.1f}s", file=sys.stderr)
for name, fn in (("fwd", rf), ("fwd+bwd", rg)):
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(fn(gtuple))
        ts.append(time.time() - t0)
    print(f"render losses {name}: {min(ts) * 1000:.1f} ms "
          "(incl ~29 ms tunnel sync)", file=sys.stderr)

jax.profiler.start_trace(TRACE_DIR)
for _ in range(3):
    float(rg(gtuple))
jax.profiler.stop_trace()
print(f"trace -> {TRACE_DIR}", file=sys.stderr)

sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from trace_attr import attribute

# two cuts: coarse loss blocks, then rasterizer internals fwd vs transpose
attribute(TRACE_DIR, top=30, depth=1)
attribute(TRACE_DIR, top=40, depth=1, anchor="raster")
