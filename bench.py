"""Driver benchmark: two-view recon+seg forward passes/sec on one chip.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "mfu": F, ...}

vs_baseline is measured against the BASELINE.json north-star target of
10 passes/sec per chip (the reference repo publishes no numbers to compare
against directly — BASELINE.md).

Extra modes (numbers recorded in BASELINE.md):
  --batch N     also time batched throughput at batch N
  --multiview V also time the multi-view model at V views
  --breakdown   per-stage device timing (backbone / +adapter / +m2f / full)
  --train N       full train step (fwd+losses+bwd+AdamW) at batch N
  --train-views V multi-view train step at V views, batch 1 (ref main_multi)
  --evalstep N    full EVAL step (fwd + fused color+qc render + lift) at
                  batch N with 4 extra target views (the val-sweep workload)
"""

import argparse
import json
import os
import subprocess
import sys
import time

V5E_BF16_PEAK = 197e12  # bf16 MXU peak FLOP/s, TPU v5e (1 chip)

# Per-attempt wall-clock cap for the retry orchestrator. Cold-cache full-model
# compiles through the axon remote-compile tunnel take minutes; a hang past
# this is treated as a failed attempt (the driver runs bench.py exactly once
# per round — BENCH_r0*.json `cmd` — so a hang would otherwise eat the round).
_ATTEMPT_TIMEOUT_S = 3600


def _orchestrate(argv):
    """Run the actual measurement in a child process, retrying on failure.

    Round-4 post-mortem (VERDICT r4 Weak #1): the driver's one-shot
    `python bench.py` died at the FIRST warmup with a transient
    "TPU backend error (Aborted)" and the round lost its perf record —
    the same code ran green twice on re-run. Defense in depth:
      attempt 1: child process as-is;
      attempt 2: fresh child process (fresh TPU client = backend re-init);
      attempt 3: fresh child process with the persistent compile cache
                 DISABLED (a stale .jax_cache entry against a changed
                 runtime is the other abort suspect).
    The child prints the result JSON as its last stdout line; stderr passes
    through. On total failure an {"error": ...} JSON is still emitted so the
    driver's `parsed` field is never null.
    """
    attempts = [
        {},
        {},
        {"SIU3R_BENCH_NO_CACHE": "1"},
    ]
    last_err = "unknown"
    for i, extra_env in enumerate(attempts, 1):
        env = dict(os.environ, **extra_env)
        cmd = [sys.executable, os.path.abspath(__file__), "--no-retry"] + argv
        try:
            proc = subprocess.run(
                cmd, env=env, stdout=subprocess.PIPE,
                timeout=_ATTEMPT_TIMEOUT_S,
            )
            out = proc.stdout.decode(errors="replace")
        except subprocess.TimeoutExpired:
            last_err = f"attempt {i}: timed out after {_ATTEMPT_TIMEOUT_S}s"
            print(f"[bench] {last_err}", file=sys.stderr)
            continue
        parsed = None
        for line in reversed(out.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    pass
                break
        # accept any run that produced a result JSON: the inner process
        # emits the headline measurement BEFORE optional modes, so a crash
        # in an optional mode (rc != 0) cannot zero the headline record
        if parsed is not None:
            if i > 1:
                parsed["retries"] = i - 1
            if proc.returncode != 0:
                parsed["partial_rc"] = proc.returncode
                print(
                    f"[bench] attempt {i}: headline ok but a later mode "
                    f"failed (rc={proc.returncode})",
                    file=sys.stderr,
                )
            print(json.dumps(parsed))
            return 0
        last_err = (
            f"attempt {i}: rc={proc.returncode}, "
            f"json={'ok' if parsed is not None else 'missing'}; "
            f"tail: {out.strip().splitlines()[-1][:200] if out.strip() else ''}"
        )
        print(f"[bench] {last_err}", file=sys.stderr)
    # all attempts failed: still emit a parseable record (never parsed=null)
    print(
        json.dumps(
            {
                "metric": "two_view_recon_seg_passes_per_sec",
                "value": 0.0,
                "unit": "passes/sec",
                "vs_baseline": 0.0,
                "error": last_err,
            }
        )
    )
    return 0


def _maybe_inject_fault():
    """Test hook: SIU3R_BENCH_FAULT_ONCE=<path> makes the FIRST child attempt
    die (simulating the round-4 transient TPU abort); the sentinel file it
    leaves behind lets the retry succeed. Exercised by
    tests/test_bench_retry.py."""
    sentinel = os.environ.get("SIU3R_BENCH_FAULT_ONCE")
    if sentinel and not os.path.exists(sentinel):
        with open(sentinel, "w"):
            pass
        print("[bench] injected fault (SIU3R_BENCH_FAULT_ONCE)", file=sys.stderr)
        raise RuntimeError("injected TPU backend fault (test hook)")


def _timed_scan(fn, args, K, reps=3):
    """Device-side throughput: K passes per dispatch via lax.scan; host-sync
    per dispatch (the axon tunnel adds ~30 ms per synced call, amortized)."""
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    return min(ts) / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--no-retry", action="store_true",
        help="run the measurement in-process (no retry orchestration); "
        "the default invocation wraps this in a retrying child process",
    )
    ap.add_argument(
        "--selftest", action="store_true",
        help="skip all measurement; emit a trivial JSON (exercises the "
        "retry wrapper without a TPU)",
    )
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--multiview", type=int, default=0)
    ap.add_argument("--breakdown", action="store_true")
    ap.add_argument("--train", type=int, default=0)
    ap.add_argument("--train-views", type=int, default=0)
    ap.add_argument("--evalstep", type=int, default=0)
    ap.add_argument(
        "--no-donate", action="store_true",
        help="with --train: do NOT donate the train state (isolates "
        "donation/aliasing effects; needs HBM headroom — small batch only)",
    )
    ap.add_argument(
        "--memcheck", action="store_true",
        help="with --train/--train-views: AOT-compile and print XLA memory "
        "analysis instead of executing",
    )
    ap.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="model compute dtype (params stay fp32)",
    )
    opts = ap.parse_args()

    if not opts.no_retry:
        argv = [a for a in sys.argv[1:] if a != "--no-retry"]
        sys.exit(_orchestrate(argv))

    _maybe_inject_fault()

    if opts.selftest:
        print(
            json.dumps(
                {
                    "metric": "bench_selftest",
                    "value": 1.0,
                    "unit": "ok",
                    "vs_baseline": 1.0,
                }
            )
        )
        return

    import jax
    import jax.numpy as jnp

    # persistent compile cache: full-model/train-step compiles are minutes
    # through the axon remote-compile tunnel; warm reruns start in seconds.
    # SIU3R_BENCH_NO_CACHE (set by the retry orchestrator's last attempt)
    # skips it — a stale cache entry against a changed runtime is one
    # suspect for the round-4 transient abort.
    if not os.environ.get("SIU3R_BENCH_NO_CACHE"):
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        except Exception:
            pass

    from siu3r_tpu.config import RootCfg, bind_scannet_classes
    from siu3r_tpu.models.model import SIU3RModel

    root = bind_scannet_classes(RootCfg())
    if opts.dtype != "float32":
        import dataclasses as _dc

        root = _dc.replace(
            root,
            pipeline=_dc.replace(
                root.pipeline,
                model=_dc.replace(root.pipeline.model, dtype=opts.dtype),
            ),
        )
    cfg = root.pipeline.model
    model = SIU3RModel(cfg)

    b, v, h, w = 1, 2, 256, 256
    images = jax.random.uniform(jax.random.PRNGKey(0), (b, v, h, w, 3))
    intr1 = jnp.array(
        [[[318 / 256, 0, 0.5], [0, 318 / 256, 0.5], [0, 0, 1]]] * v
    )[None]
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), images, intr1)

    K = 10

    def make_fwd_scan():
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

        return fwd_scan

    fwd_scan = make_fwd_scan()
    batch_imgs = jax.random.uniform(jax.random.PRNGKey(5), (K, b, v, h, w, 3))
    jax.block_until_ready(batch_imgs)
    dt = _timed_scan(fwd_scan, (variables, batch_imgs, intr1), K)
    passes_per_sec = 1.0 / dt

    # FLOP-based MFU from the compiled single-pass cost analysis
    mfu = None
    flops = None
    try:
        single = jax.jit(
            lambda vs, im, k: model.apply(
                vs, im, k, enable_query_class_logit_lift=True
            ).gaussians.means.sum()
        )
        ca = single.lower(variables, batch_imgs[0], intr1).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = flops * passes_per_sec / V5E_BF16_PEAK
    except Exception as e:  # noqa: BLE001 - cost analysis is best-effort
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

    result = {
        "metric": "two_view_recon_seg_passes_per_sec",
        "value": round(passes_per_sec, 3),
        "unit": "passes/sec",
        "vs_baseline": round(passes_per_sec / 10.0, 3),
    }
    if opts.dtype != "float32":
        result["dtype"] = opts.dtype
    if mfu is not None:
        result["mfu"] = round(mfu, 4)
        result["gflops_per_pass"] = round(flops / 1e9, 1)

    # emit the headline record NOW: if any optional mode below crashes the
    # process, the retry orchestrator still finds and reports this line
    print(json.dumps(result))
    sys.stdout.flush()

    if opts.batch:
        bb = opts.batch
        intr_b = jnp.broadcast_to(intr1, (bb, v, 3, 3))
        imgs_b = jax.random.uniform(jax.random.PRNGKey(6), (K, bb, v, h, w, 3))
        jax.block_until_ready(imgs_b)
        dt_b = _timed_scan(fwd_scan, (variables, imgs_b, intr_b), K)
        print(
            f"[bench] batch={bb}: {dt_b / bb * 1000:.2f} ms/item "
            f"({bb / dt_b:.1f} items/sec)",
            file=sys.stderr,
        )
        result[f"batch{bb}_items_per_sec"] = round(bb / dt_b, 3)

    if opts.multiview:
        import dataclasses

        vv = opts.multiview
        cfg_mv = dataclasses.replace(cfg, num_views=vv)
        model_mv = SIU3RModel(cfg_mv)
        imgs_mv = jax.random.uniform(jax.random.PRNGKey(7), (1, vv, h, w, 3))
        intr_mv = jnp.broadcast_to(intr1[:, :1], (1, vv, 3, 3))
        vars_mv = jax.jit(model_mv.init)(jax.random.PRNGKey(8), imgs_mv, intr_mv)

        @jax.jit
        def mv_scan(vs, ims, k):
            def step(carry, im):
                out = model_mv.apply(vs, im, k, enable_query_class_logit_lift=True)
                return carry + out.gaussians.means.sum(), None

            return jax.lax.scan(step, 0.0, ims)[0]

        imgs_mv_k = jax.random.uniform(jax.random.PRNGKey(9), (K, 1, vv, h, w, 3))
        jax.block_until_ready(imgs_mv_k)
        dt_mv = _timed_scan(mv_scan, (vars_mv, imgs_mv_k, intr_mv), K)
        print(
            f"[bench] multiview V={vv}: {dt_mv * 1000:.2f} ms/pass "
            f"({1 / dt_mv:.2f} passes/sec)",
            file=sys.stderr,
        )
        result[f"multiview_v{vv}_passes_per_sec"] = round(1 / dt_mv, 3)

    if opts.breakdown:
        def bb_only(m, im, k):
            out = m.backbone(im, k)
            return out.dec1[-1].sum()

        def bb_adapter(m, im, k):
            bsz = im.shape[0]
            out = m.backbone(im, k)
            stacked = [
                jnp.concatenate([f1, f2], axis=0)
                for f1, f2 in zip(out.all_feat1, out.all_feat2)
            ]
            flat = jnp.concatenate([im[:, 0], im[:, 1]], axis=0)
            feats = m.adapter(flat, stacked)
            return sum(f.sum() for f in feats) + out.dec1[-1].sum()

        def bb_adapter_m2f(m, im, k):
            bsz = im.shape[0]
            out = m.backbone(im, k)
            stacked = [
                jnp.concatenate([f1, f2], axis=0)
                for f1, f2 in zip(out.all_feat1, out.all_feat2)
            ]
            flat = jnp.concatenate([im[:, 0], im[:, 1]], axis=0)
            feats = m.adapter(flat, stacked)
            ms = [
                jnp.stack([f[:bsz], f[bsz:]], axis=1).astype(jnp.float32)
                for f in feats
            ]
            seg = m.mask2former(ms)
            return (
                seg.class_queries_logits.sum()
                + seg.masks_queries_logits.sum()
                + out.dec1[-1].sum()
            )

        stages = [
            ("backbone", bb_only),
            ("+adapter", bb_adapter),
            ("+mask2former", bb_adapter_m2f),
        ]
        prev = 0.0
        for name, meth in stages:
            @jax.jit
            def scan_fn(vs, ims, k, meth=meth):
                def step(c, im):
                    return c + model.apply(vs, im, k, method=meth), None

                return jax.lax.scan(step, 0.0, ims)[0]

            dt_s = _timed_scan(scan_fn, (variables, batch_imgs, intr1), K)
            print(
                f"[bench] {name:14s}: {dt_s * 1000:7.2f} ms "
                f"(+{(dt_s - prev) * 1000:6.2f})",
                file=sys.stderr,
            )
            prev = dt_s
        print(
            f"[bench] {'full+post+lift':14s}: {dt * 1000:7.2f} ms "
            f"(+{(dt - prev) * 1000:6.2f})",
            file=sys.stderr,
        )

    if opts.evalstep:
        import numpy as np

        from siu3r_tpu.pipeline import Pipeline, TrainState, lift_rendered_qc

        bb = opts.evalstep
        pipe = Pipeline(root, lpips_enabled=False)
        n_tgt = v + 4  # reference val: context + 4 extra target views
        exts = np.stack([np.eye(4, dtype=np.float32)] * n_tgt)
        for i in range(n_tgt):
            exts[i, 0, 3] = 0.1 * i
        ebatch = {
            "context_views_images": jax.random.uniform(
                jax.random.PRNGKey(10), (bb, v, h, w, 3)
            ),
            "context_views_intrinsics": jnp.broadcast_to(intr1, (bb, v, 3, 3)),
            "target_views_extrinsics": jnp.broadcast_to(
                jnp.asarray(exts), (bb, n_tgt, 4, 4)
            ),
            "target_views_intrinsics": jnp.broadcast_to(
                intr1[:, :1], (bb, n_tgt, 3, 3)
            ),
        }
        estate = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=None, step=0,
        )
        m2f = root.pipeline.model.mask2former

        @jax.jit
        def eval_full(state, batch):
            out, render, qc = pipe.eval_step(state, batch)
            sem, ins = lift_rendered_qc(
                qc, out.post["query_scores"],
                num_queries=m2f.num_queries,
                stuff_ids=tuple(m2f.label_ids_to_fuse),
            )
            return (
                render.color.sum() + render.depth.sum()
                + sem.sum() + ins.sum()
            )

        float(eval_full(estate, ebatch))  # compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(eval_full(estate, ebatch))
            ts.append(time.time() - t0)
        dt_e = min(ts) / bb
        print(
            f"[bench] evalstep batch={bb}: {dt_e * 1000:.1f} ms/scene "
            f"({1 / dt_e:.2f} scenes/sec) incl fused color+qc render + lift",
            file=sys.stderr,
        )
        result[f"evalstep_b{bb}_scenes_per_sec"] = round(1 / dt_e, 3)

    if opts.train or opts.train_views:
        import dataclasses

        import numpy as np

        from siu3r_tpu.pipeline import Pipeline

        # free the inference-model buffers before building the train state
        # (params + Adam moments are ~7.4 GB fp32)
        del variables
        bb = opts.train or 1
        vv = opts.train_views or 2
        troot = root
        if vv != 2:
            troot = dataclasses.replace(
                root,
                pipeline=dataclasses.replace(
                    root.pipeline,
                    model=dataclasses.replace(root.pipeline.model, num_views=vv),
                ),
            )
        pipe = Pipeline(troot, steps_per_epoch=1000)
        rng = np.random.RandomState(0)
        n_tgt = vv + 2
        intr = np.asarray(intr1[0, 0])
        exts = np.stack([np.eye(4, dtype=np.float32)] * n_tgt)
        for i in range(n_tgt):
            exts[i, 0, 3] = 0.1 * i
        o = 48
        # view ids follow the datamodule convention (datasets.py:145-152):
        # extra target views sorted BETWEEN the context ids — so the step
        # compiles the real per-item context-depth gather, not the
        # synthetic-batch fallback
        tgt_ids = np.arange(n_tgt, dtype=np.int32) * 10
        ctx_pos = np.round(np.linspace(0, n_tgt - 1, vv)).astype(np.int32)
        ctx_ids = tgt_ids[ctx_pos]
        tbatch = {
            "context_views_id": jnp.asarray(
                np.broadcast_to(ctx_ids, (bb, vv)).copy()
            ),
            "target_views_id": jnp.asarray(
                np.broadcast_to(tgt_ids, (bb, n_tgt)).copy()
            ),
            "context_views_images": jnp.asarray(
                rng.rand(bb, vv, h, w, 3), jnp.float32
            ),
            "context_views_intrinsics": jnp.asarray(
                np.broadcast_to(intr, (bb, vv, 3, 3)).copy()
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
                (rng.rand(bb, o, vv, h, w) > 0.8).astype(np.float32)
            ),
            "gt_classes": jnp.asarray(rng.randint(0, 20, (bb, o)), jnp.int32),
            "gt_valid": jnp.asarray(
                np.broadcast_to(np.arange(o)[None] < 15, (bb, o)).copy()
            ),
        }
        state = pipe.init_state(jax.random.PRNGKey(0), tbatch)
        step = pipe.make_train_step(donate=not opts.no_donate)
        if opts.memcheck:
            # AOT-compile only: report XLA's planned HBM footprint without
            # executing (diagnoses runtime OOMs; compare backward variants
            # via SIU3R_RASTER_BWD=jnp|pallas)
            compiled = step.lower(state, tbatch, jax.random.PRNGKey(1)).compile()
            ma = compiled.memory_analysis()
            for k in (
                "argument_size_in_bytes",
                "output_size_in_bytes",
                "temp_size_in_bytes",
                "generated_code_size_in_bytes",
            ):
                vb = getattr(ma, k, None)
                if vb is not None:
                    print(f"[memcheck] {k}: {vb / 2**30:.3f} GiB", file=sys.stderr)
                    result[f"memcheck_{k}"] = round(vb / 2**30, 3)
            print(json.dumps(result))
            return
        state, losses = step(state, tbatch, jax.random.PRNGKey(1))
        # sync via host transfer of a loss scalar: block_until_ready does NOT
        # reliably synchronize through the axon tunnel (it can return before
        # the step finishes, turning the loop into an enqueue-rate measure —
        # the only dependable sync is a device->host read)
        float(jax.tree_util.tree_leaves(losses)[0])
        t0 = time.time()
        n_it = 5
        for i in range(n_it):
            state, losses = step(state, tbatch, jax.random.PRNGKey(2 + i))
            float(jax.tree_util.tree_leaves(losses)[0])
        dt_t = (time.time() - t0) / n_it
        label = f"train b={bb} v={vv}"
        print(
            f"[bench] {label}: {dt_t * 1000:.1f} ms/step "
            f"({bb / dt_t:.2f} items/sec)",
            file=sys.stderr,
        )
        result[f"train_b{bb}_v{vv}_ms_per_step"] = round(dt_t * 1000, 1)
        try:
            ms = jax.local_devices()[0].memory_stats()
            peak = ms.get("peak_bytes_in_use")
            if peak:
                print(
                    f"[bench] {label}: peak HBM {peak / 2**30:.2f} GiB",
                    file=sys.stderr,
                )
                result[f"train_b{bb}_v{vv}_peak_hbm_gib"] = round(peak / 2**30, 2)
        except Exception:
            pass

    print(json.dumps(result))


if __name__ == "__main__":
    main()
