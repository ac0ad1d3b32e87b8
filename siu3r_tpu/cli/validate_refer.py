"""Referring-expression validation sweep.

Runs the seg-only refer forward (text tokens -> word/query similarity via
the 6 lang cross-attn layers) over the ScanRefer val split and reports the
mean referred-mask IoU. The reference ships no refer evaluator (its refer
path stops at the training loss, video_seg_decoder.py:573-594); mask IoU
over the referred objects is the standard ScanRefer protocol.

Usage:
    python -m siu3r_tpu.cli.validate_refer --config configs/scanrefer.yaml \
        --ckpt checkpoints/epochNNN [--limit 10]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--limit", type=int, default=-1)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax

    from siu3r_tpu.checkpoint_io import restore_checkpoint
    from siu3r_tpu.cli.train import build_dataset
    from siu3r_tpu.config import bind_scannet_classes, load_config
    from siu3r_tpu.data import Loader
    from siu3r_tpu.eval.metrics import referred_mask_iou
    from siu3r_tpu.pipeline import Pipeline, TrainState
    from siu3r_tpu.utils.logging import RankedLogger

    log = RankedLogger(__name__)
    cfg = bind_scannet_classes(load_config(args.config, args.overrides))
    cfg.mode = "val"
    cfg.datamodule.dataset_cfg.name = "scanrefer"
    cfg.pipeline.model.mask2former.train_refer_segmentation = True

    dataset = build_dataset(cfg, train=False)
    loader = Loader(
        dataset, batch_size=1, shuffle=False, num_workers=2, drop_last=False
    )
    pipe = Pipeline(cfg, lpips_enabled=False)
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
        numeric = {
            k: v for k, v in first.items()
            if isinstance(v, np.ndarray) and v.dtype != object
        }
        state = pipe.init_state(jax.random.PRNGKey(0), numeric)

    step = pipe.make_refer_eval_step()
    all_ious = []
    n = 0
    for batch in loader:
        if args.limit > 0 and n >= args.limit:
            break
        numeric = {
            k: v for k, v in batch.items()
            if isinstance(v, np.ndarray) and v.dtype != object
        }
        pred_masks, _word_logits = step(state, numeric)
        for bi in range(len(batch["scene_names"])):
            _, per_word = referred_mask_iou(
                np.asarray(pred_masks[bi]),
                np.asarray(batch["gt_masks"][bi]),
                np.asarray(batch["gt_valid"][bi]),
            )
            all_ious.extend(per_word.tolist())
        n += 1

    result = {
        "refer_miou": float(np.mean(all_ious)) if all_ious else 0.0,
        "num_referred": len(all_ious),
        "acc@0.5": float(np.mean(np.asarray(all_ious) > 0.5)) if all_ious else 0.0,
        "acc@0.25": float(np.mean(np.asarray(all_ious) > 0.25)) if all_ious else 0.0,
    }
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
