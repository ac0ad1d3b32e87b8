"""Trace the single-pass forward at B=1 vs B=4 and attribute per-item time
(VERDICT r4 Next #5 and #8).

Captures device traces of the full two-view forward (recon+seg+lift) at the
given batch sizes/dtype and prints, per run: per-item device time by named
scope and by HLO category — the per-stage data for either a single-chip
roofline verdict or a batched-regression mechanism.

Usage:
    python tools/trace_fwd.py               # B=1 and B=4, fp32
    python tools/trace_fwd.py --dtype bfloat16
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

ap = argparse.ArgumentParser()
ap.add_argument("--batches", type=int, nargs="+", default=[1, 4])
ap.add_argument("--dtype", default="float32")
ap.add_argument("--trace-root", default="/tmp/r5_fwd_trace")
args = ap.parse_args()

from siu3r_tpu.config import RootCfg, bind_scannet_classes
from siu3r_tpu.models.model import SIU3RModel

root = bind_scannet_classes(RootCfg())
if args.dtype != "float32":
    import dataclasses as _dc
    root = _dc.replace(
        root, pipeline=_dc.replace(
            root.pipeline,
            model=_dc.replace(root.pipeline.model, dtype=args.dtype)))
cfg = root.pipeline.model
model = SIU3RModel(cfg)

v, h, w = 2, 256, 256
intr1 = jnp.array([[[318 / 256, 0, 0.5], [0, 318 / 256, 0.5], [0, 0, 1]]] * v)[None]
images1 = jax.random.uniform(jax.random.PRNGKey(0), (1, v, h, w, 3))
variables = jax.jit(model.init)(jax.random.PRNGKey(1), images1, intr1)

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from trace_attr import attribute

for b in args.batches:
    images = jax.random.uniform(jax.random.PRNGKey(2), (b, v, h, w, 3))
    intr = jnp.broadcast_to(intr1, (b, v, 3, 3))

    @jax.jit
    def fwd(vs, im, k):
        out = model.apply(vs, im, k, enable_query_class_logit_lift=True)
        return (
            out.gaussians.means.sum()
            + out.gaussians.seg_query_class_logits.sum()
            + out.seg.class_queries_logits.sum()
        )

    float(fwd(variables, images, intr))  # compile
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(fwd(variables, images, intr))
        ts.append(time.time() - t0)
    print(f"\n##### B={b} {args.dtype}: {min(ts)/b*1000:.2f} ms/item "
          f"(per-call sync incl ~29ms tunnel)", file=sys.stderr)

    tdir = f"{args.trace_root}_b{b}_{args.dtype}"
    jax.profiler.start_trace(tdir)
    for _ in range(3):
        float(fwd(variables, images, intr))
    jax.profiler.stop_trace()
    print(f"===== trace B={b} {args.dtype} -> {tdir} =====")
    attribute(tdir, top=30, depth=2)
