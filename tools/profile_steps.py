"""Profile the train step / forward pass on the TPU with jax.profiler and
attribute device time to named scopes (tools/trace_attr.py).

Modes:
    python tools/profile_steps.py train   [B]   # full train step (default B=3)
    python tools/profile_steps.py fwd     [B]   # inference forward+lift
    python tools/profile_steps.py eval    [B]   # full eval step

Writes the trace under /tmp/siu3r_trace_<mode>/ and prints the attribution
tables. Shapes match bench.py exactly (reference configs/main.yaml).
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    bb = int(sys.argv[2]) if len(sys.argv) > 2 else (3 if mode == "train" else 1)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from siu3r_tpu.config import RootCfg, bind_scannet_classes

    root = bind_scannet_classes(RootCfg())
    v, h, w = 2, 256, 256
    intr = np.array(
        [[318 / 256.0, 0, 0.5], [0, 318 / 256.0, 0.5], [0, 0, 1]], np.float32
    )
    rng = np.random.RandomState(0)

    trace_dir = f"/tmp/siu3r_trace_{mode}_b{bb}"

    if mode == "fwd":
        from siu3r_tpu.models.model import SIU3RModel

        model = SIU3RModel(root.pipeline.model)
        images = jnp.asarray(rng.rand(bb, v, h, w, 3), jnp.float32)
        intrb = jnp.asarray(np.broadcast_to(intr, (bb, v, 3, 3)).copy())
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, intrb)

        @jax.jit
        def f(var, im, k):
            out = model.apply(var, im, k, enable_query_class_logit_lift=True)
            return out.post["segmentation"].sum() + out.gaussians.means.sum()

        float(f(variables, images, intrb))  # compile
        jax.profiler.start_trace(trace_dir)
        for _ in range(5):
            float(f(variables, images, intrb))
        jax.profiler.stop_trace()
    else:
        from siu3r_tpu.pipeline import Pipeline, lift_rendered_qc

        n_tgt = v + (4 if mode == "eval" else 2)
        exts = np.stack([np.eye(4, dtype=np.float32)] * n_tgt)
        for i in range(n_tgt):
            exts[i, 0, 3] = 0.1 * i
        o = 48
        tgt_ids = np.arange(n_tgt, dtype=np.int32) * 10
        ctx_ids = tgt_ids[np.round(np.linspace(0, n_tgt - 1, v)).astype(np.int32)]
        batch = {
            "context_views_id": jnp.asarray(
                np.broadcast_to(ctx_ids, (bb, v)).copy()
            ),
            "target_views_id": jnp.asarray(
                np.broadcast_to(tgt_ids, (bb, n_tgt)).copy()
            ),
            "context_views_images": jnp.asarray(
                rng.rand(bb, v, h, w, 3), jnp.float32
            ),
            "context_views_intrinsics": jnp.asarray(
                np.broadcast_to(intr, (bb, v, 3, 3)).copy()
            ),
            "target_views_images": jnp.asarray(
                rng.rand(bb, n_tgt, h, w, 3), jnp.float32
            ),
            "target_views_intrinsics": jnp.asarray(
                np.broadcast_to(intr, (bb, n_tgt, 3, 3)).copy()
            ),
            "target_views_extrinsics": jnp.asarray(
                np.broadcast_to(exts, (bb, n_tgt, 4, 4)).copy()
            ),
            "gt_masks": jnp.asarray(
                (rng.rand(bb, o, v, h, w) > 0.8).astype(np.float32)
            ),
            "gt_classes": jnp.asarray(rng.randint(0, 20, (bb, o)), jnp.int32),
            "gt_valid": jnp.asarray(
                np.broadcast_to(np.arange(o)[None] < 15, (bb, o)).copy()
            ),
        }
        pipe = Pipeline(root, steps_per_epoch=1000)
        state = pipe.init_state(jax.random.PRNGKey(0), batch)
        if mode == "train":
            step = pipe.make_train_step()
            state, losses = step(state, batch, jax.random.PRNGKey(1))
            print({k: float(v) for k, v in losses.items()}, file=sys.stderr)
            jax.profiler.start_trace(trace_dir)
            for i in range(3):
                state, losses = step(state, batch, jax.random.PRNGKey(2 + i))
                # host read: the only reliable sync through the axon tunnel
                float(jax.tree_util.tree_leaves(losses)[0])
            jax.profiler.stop_trace()
        else:
            m2f = root.pipeline.model.mask2former

            @jax.jit
            def eval_full(st, b):
                out, render, qc = pipe.eval_step(st, b)
                sem, ins = lift_rendered_qc(
                    qc, out.post["query_scores"],
                    num_queries=m2f.num_queries,
                    stuff_ids=tuple(m2f.label_ids_to_fuse),
                )
                return (render.color.sum() + render.depth.sum()
                        + sem.sum() + ins.sum())

            float(eval_full(state, batch))
            jax.profiler.start_trace(trace_dir)
            for _ in range(3):
                float(eval_full(state, batch))
            jax.profiler.stop_trace()

    time.sleep(1)
    sys.path.insert(0, "/root/repo/tools")
    from trace_attr import attribute

    attribute(trace_dir)


if __name__ == "__main__":
    main()
