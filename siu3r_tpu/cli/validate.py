"""Validation sweep CLI (reference ``mode=val`` path: pipeline.py:289-326).

Runs the lift forward + novel-view render over the val split, writes the
per-scene prediction protocol via the Visualizer, then evaluates
(PSNR/SSIM/LPIPS + mIoU/PQ/mAP + depth) and prints results.json.

Distributed protocol parity (reference src/pipeline.py:315-326 +
src/run.py:84-97): the reference validates with ALL ranks running
``validation_step`` under DDP, each rank writing disjoint per-scene dirs,
then rank 0 evaluates behind barriers. Here the batch is sharded over the
device mesh's ``data`` axis (``Pipeline.make_dp_eval_step``), outputs are
gathered host-side (device->host gather stands in for the shared-FS round
trip), every batch's scenes are written by the thread-pooled Visualizer,
and a single evaluator pass runs at the end; under multi-process
``jax.distributed`` runs only process 0 evaluates.

Usage:
    python -m siu3r_tpu.cli.validate --config configs/scannet.yaml \
        --ckpt checkpoints/epoch099 [--batch_size 8] [--limit 10]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def _pad_batch(batch, full: int):
    """Edge-pad every array's leading dim to ``full`` (DistributedSampler
    wrap-around equivalent); returns (batch, n_real)."""
    n_real = len(batch["scene_names"])
    if n_real == full:
        return batch, n_real
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            pad = np.repeat(v[-1:], full - n_real, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
        elif isinstance(v, list):
            out[k] = v + [v[-1]] * (full - n_real)
        else:
            out[k] = v
    return out, n_real


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--output_path", type=str, default=None)
    parser.add_argument("--limit", type=int, default=-1,
                        help="max number of eval batches")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="global eval batch (default: one per device)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax

    from siu3r_tpu.checkpoint_io import restore_checkpoint
    from siu3r_tpu.cli.train import build_dataset
    from siu3r_tpu.config import bind_scannet_classes, load_config
    from siu3r_tpu.data import Loader
    from siu3r_tpu.eval import Evaluator
    from siu3r_tpu.parallel import create_mesh, replicate, shard_batch
    from siu3r_tpu.pipeline import Pipeline, TrainState, lift_rendered_qc
    from siu3r_tpu.utils.logging import RankedLogger
    from siu3r_tpu.visualizer import Visualizer

    log = RankedLogger(__name__)
    cfg = bind_scannet_classes(load_config(args.config, args.overrides))
    cfg.mode = "val"
    cfg.datamodule.dataset_cfg.num_extra_target_views = 4  # config.py:180-181
    out_dir = Path(args.output_path or "outputs/val/run")
    out_dir.mkdir(parents=True, exist_ok=True)

    n_dev = min(cfg.trainer.devices, len(jax.devices()))
    mesh = create_mesh(n_dev)
    batch_size = args.batch_size or n_dev
    if batch_size % n_dev:
        raise SystemExit(f"--batch_size {batch_size} not divisible by {n_dev} devices")

    dataset = build_dataset(cfg, train=False)
    loader = Loader(
        dataset, batch_size=batch_size, shuffle=False, num_workers=2,
        drop_last=False,
    )
    pipe = Pipeline(cfg)
    first = next(iter(loader))
    first, _ = _pad_batch(first, batch_size)
    if args.ckpt:
        variables = restore_checkpoint(args.ckpt)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=None,
            step=0,
        )
    else:
        log.warning("no --ckpt: random init (smoke mode)")
        state = pipe.init_state(jax.random.PRNGKey(0), _numeric(first))
    state = replicate(state, mesh)

    viz = Visualizer(cfg.pipeline.visualizer)
    eval_step = (
        pipe.make_dp_eval_step(mesh) if mesh.size > 1 else pipe.make_eval_step()
    )
    m2f = cfg.pipeline.model.mask2former
    n_batches = 0
    n_scenes = 0
    step_seconds = []
    for batch in loader:
        if args.limit > 0 and n_batches >= args.limit:
            break
        batch, n_real = _pad_batch(batch, batch_size)
        numeric = shard_batch(_numeric(batch), mesh)
        t0 = time.time()
        out, render, qc = eval_step(state, numeric)
        jax.block_until_ready(qc)
        step_seconds.append(time.time() - t0)
        from siu3r_tpu.models.mask2former.postprocess import segments_info

        infos_all = segments_info(jax.device_get(out.post), m2f.label_ids_to_fuse)
        sem_ids, ins_ids = lift_rendered_qc(
            qc,
            out.post["query_scores"],
            threshold=0.3,
            num_queries=m2f.num_queries,
            stuff_ids=tuple(m2f.label_ids_to_fuse),
        )
        for bi in range(n_real):
            ctx_ids = batch["context_views_id"][bi]
            tgt_ids = batch["target_views_id"][bi]
            ctx_pos = [int(np.where(tgt_ids == c)[0][0]) for c in ctx_ids]
            # GT seg maps from padded gt masks: argmax over objects
            tgt_sem_gt, tgt_ins_gt = _gt_maps(
                batch["target_gt_masks"][bi],
                batch["target_gt_classes"][bi],
                batch["target_gt_valid"][bi],
            )
            sem = np.asarray(sem_ids[bi])
            ins = np.asarray(ins_ids[bi])
            viz.add_scene(
                str(out_dir),
                batch["scene_names"][bi],
                list(map(int, ctx_ids)),
                list(map(int, tgt_ids)),
                np.asarray(render.color[bi]),
                np.asarray(batch["target_views_images"][bi]),
                np.asarray(render.depth[bi]),
                np.asarray(batch["target_views_depths"][bi]),
                context_sem_pred=sem[ctx_pos],
                context_ins_pred=ins[ctx_pos],
                context_sem_gt=tgt_sem_gt[ctx_pos],
                context_ins_gt=tgt_ins_gt[ctx_pos],
                target_sem_pred=sem,
                target_ins_pred=ins,
                target_sem_gt=tgt_sem_gt,
                target_ins_gt=tgt_ins_gt,
                seg_infos=infos_all[bi],
                context_images=np.asarray(batch["context_views_images"][bi]),
                context_seg_map=np.asarray(out.post["segmentation"][bi]),
                gt_masks=np.asarray(batch["gt_masks"][bi]),
                gt_classes=np.asarray(batch["gt_classes"][bi]),
                gt_valid=np.asarray(batch["gt_valid"][bi]),
            )
            n_scenes += 1
        viz.write_files()
        n_batches += 1
        log.info(
            f"batch {n_batches} ({n_real} scenes): {step_seconds[-1]:.2f}s "
            f"step + {time.time() - t0 - step_seconds[-1]:.2f}s host"
        )

    sweep = {"n_scenes": n_scenes, "batch_size": batch_size,
             "devices": mesh.size, "step_seconds": step_seconds}
    if len(step_seconds) > 1:  # skip the compile batch
        per_item = sum(step_seconds[1:]) / (len(step_seconds) - 1) / batch_size
        sweep["ms_per_scene"] = per_item * 1000
        sweep["scenes_per_sec"] = 1.0 / per_item
        log.info(
            f"eval step: {per_item * 1000:.1f} ms/scene "
            f"({1.0 / per_item:.2f} scenes/sec) at batch {batch_size} "
            f"over {mesh.size} device(s)"
        )

    # rank-0 evaluation behind a barrier (reference pipeline.py:315-326)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("siu3r_val_write_done")
        if jax.process_index() != 0:
            return sweep
    ev = Evaluator(cfg.pipeline.evaluator)
    result = ev.evaluate(str(out_dir))
    print(json.dumps({k: v for k, v in result.items() if not k.endswith("per_class")}, indent=2))
    sweep["results"] = result
    return sweep


def _numeric(batch):
    return {
        k: v
        for k, v in batch.items()
        if isinstance(v, np.ndarray) and v.dtype != object
    }


def _gt_maps(gt_masks, gt_classes, gt_valid):
    """Padded object masks -> (semantic 1-based, instance) id maps [V, H, W]."""
    gm = np.asarray(gt_masks)  # [O, V, H, W]
    gc = np.asarray(gt_classes)
    gv = np.asarray(gt_valid)
    o, v, h, w = gm.shape
    sem = np.zeros((v, h, w), np.int32)
    ins = np.zeros((v, h, w), np.int32)
    for oi in range(o):
        if not gv[oi]:
            continue
        m = gm[oi] > 0.5
        sem[m] = int(gc[oi]) + 1
        ins[m] = oi + 1
    return sem, ins


if __name__ == "__main__":
    main()
