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

    # throughput measurement: K passes per dispatch via lax.scan so the
    # per-execution host<->device round-trip (~30 ms through the axon
    # tunnel) amortizes away; reduces each pass to a scalar to keep every
    # stage live. This measures device-side throughput, which is what a
    # batched serving deployment sees.
    K = 10

    @jax.jit
    def fwd_scan(vs, ims, k):
        def step(carry, im):
            out = model.apply(vs, im, k, enable_query_class_logit_lift=True)
            s = (
                out.gaussians.means.sum()
                + out.gaussians.seg_query_class_logits.sum()
                + out.seg.class_queries_logits.sum()
            )
            return carry + s, None

        total, _ = jax.lax.scan(step, 0.0, ims)
        return total

    batch_imgs = jax.random.uniform(
        jax.random.PRNGKey(5), (K, b, v, h, w, 3)
    )
    jax.block_until_ready(batch_imgs)
    float(fwd_scan(variables, batch_imgs, intr))  # compile + warm

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        float(fwd_scan(variables, batch_imgs, intr))
    dt = (time.time() - t0) / (reps * K)
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
