"""Validation sweep CLI (reference ``mode=val`` path: pipeline.py:289-326).

Runs the lift forward + novel-view render over the val split, writes the
per-scene prediction protocol via the Visualizer, then evaluates
(PSNR/SSIM/LPIPS + mIoU/PQ/mAP + depth) and prints results.json.

Usage:
    python -m siu3r_tpu.cli.validate --config configs/scannet.yaml \
        --ckpt checkpoints/epoch099 [--limit 10]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--output_path", type=str, default=None)
    parser.add_argument("--limit", type=int, default=-1)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax

    from siu3r_tpu.checkpoint_io import restore_checkpoint
    from siu3r_tpu.cli.train import build_dataset
    from siu3r_tpu.config import bind_scannet_classes, load_config
    from siu3r_tpu.data import Loader
    from siu3r_tpu.eval import Evaluator
    from siu3r_tpu.pipeline import Pipeline, TrainState, lift_rendered_qc
    from siu3r_tpu.utils.logging import RankedLogger
    from siu3r_tpu.visualizer import Visualizer

    log = RankedLogger(__name__)
    cfg = bind_scannet_classes(load_config(args.config, args.overrides))
    cfg.mode = "val"
    cfg.datamodule.dataset_cfg.num_extra_target_views = 4  # config.py:180-181
    out_dir = Path(args.output_path or "outputs/val/run")
    out_dir.mkdir(parents=True, exist_ok=True)

    dataset = build_dataset(cfg, train=False)
    loader = Loader(
        dataset, batch_size=1, shuffle=False, num_workers=2, drop_last=False
    )
    pipe = Pipeline(cfg)
    first = next(iter(loader))
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
        state = pipe.init_state(jax.random.PRNGKey(0), first)

    viz = Visualizer(cfg.pipeline.visualizer)
    eval_step = pipe.make_eval_step()
    m2f = cfg.pipeline.model.mask2former
    n_done = 0
    for batch in loader:
        if args.limit > 0 and n_done >= args.limit:
            break
        t0 = time.time()
        numeric = {
            k: v
            for k, v in batch.items()
            if isinstance(v, np.ndarray) and v.dtype != object
        }
        out, render, qc = eval_step(state, numeric)
        from siu3r_tpu.models.mask2former.postprocess import segments_info

        infos_all = segments_info(out.post, m2f.label_ids_to_fuse)
        sem_ids, ins_ids = lift_rendered_qc(
            qc,
            out.post["query_scores"],
            threshold=0.3,
            num_queries=m2f.num_queries,
            stuff_ids=tuple(m2f.label_ids_to_fuse),
        )
        b = batch["context_views_images"].shape[0]
        v = batch["context_views_images"].shape[1]
        for bi in range(b):
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
        viz.write_files()
        n_done += 1
        log.info(f"scene {n_done}: {time.time() - t0:.2f}s")

    ev = Evaluator(cfg.pipeline.evaluator)
    result = ev.evaluate(str(out_dir))
    print(json.dumps({k: v for k, v in result.items() if not k.endswith("per_class")}, indent=2))


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
