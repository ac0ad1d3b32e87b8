"""Driver benchmark: two-view recon+seg forward passes/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
10 passes/sec per chip (the reference repo publishes no numbers to compare
against directly — BASELINE.md).
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from siu3r_tpu.config import RootCfg, bind_scannet_classes
    from siu3r_tpu.models.model import SIU3RModel

    root = bind_scannet_classes(RootCfg())
    cfg = root.pipeline.model
    model = SIU3RModel(cfg)

    b, v, h, w = 1, 2, 256, 256
    images = jax.random.uniform(jax.random.PRNGKey(0), (b, v, h, w, 3))
    intr = jnp.array(
        [[[318 / 256, 0, 0.5], [0, 318 / 256, 0.5], [0, 0, 1]]] * v
    )[None]
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), images, intr)

    @jax.jit
    def fwd(vs, im, k):
        out = model.apply(vs, im, k, enable_query_class_logit_lift=True)
        # reduce to a scalar to force full materialization through the
        # device tunnel (block_until_ready alone does not synchronize here)
        return (
            out.gaussians.means.sum()
            + out.gaussians.seg_query_class_logits.sum()
            + out.seg.class_queries_logits.sum()
        )

    float(fwd(variables, images, intr))  # compile + warm

    iters = 20
    imgs = [
        jax.random.uniform(jax.random.PRNGKey(100 + i), (b, v, h, w, 3))
        for i in range(iters)
    ]
    jax.block_until_ready(imgs)
    # throughput measurement: enqueue all passes (pipelined dispatch), then
    # force every result to host. Per-call host syncs would measure the
    # ~30 ms axon-tunnel round-trip instead of the model.
    t0 = time.time()
    vals = [fwd(variables, im, intr) for im in imgs]
    for vv in vals:
        float(vv)
    dt = (time.time() - t0) / iters
    passes_per_sec = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "two_view_recon_seg_passes_per_sec",
                "value": round(passes_per_sec, 3),
                "unit": "passes/sec",
                "vs_baseline": round(passes_per_sec / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
