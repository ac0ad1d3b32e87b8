"""Training CLI (reference src/run.py / src/run_multi.py equivalent).

Usage:
    python -m siu3r_tpu.cli.train --config configs/scannet.yaml \
        [key.path=value ...]

Builds the dataset + loader, creates the device mesh, jits the train step
with the batch sharded over the ``data`` axis, logs losses, checkpoints via
orbax every ``check_val_every_n_epoch`` epochs, and runs the validation
sweep + evaluator at the end (reference trainer wiring run.py:61-110).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def build_dataset(cfg, train: bool):
    """Dataset dispatch (reference get_datamodule.py:4-77): scannet /
    scannetpp / replica / concat (joint multi-dataset training) /
    scanrefer (referring-expression segmentation)."""
    from siu3r_tpu.data import (
        ConcatSceneDataset,
        ReplicaDataset,
        ScanNetDataset,
        ScanNetPPDataset,
        ScanReferDataset,
    )

    dcfg = cfg.datamodule.dataset_cfg
    cls = {
        "scannet": ScanNetDataset,
        "scannetpp": ScanNetPPDataset,
        "replica": ReplicaDataset,
        "concat": ConcatSceneDataset,
        "scanrefer": ScanReferDataset,
    }[dcfg.name]
    return cls(
        dcfg.root,
        num_extra_context_views=dcfg.num_extra_context_views,
        num_extra_target_views=dcfg.num_extra_target_views,
        train=train,
        seg_task=dcfg.seg_task,
        image_size=dcfg.image_width,
        max_objects=dcfg.max_objects,
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument(
        "--resume", type=str, default=None,
        help="checkpoint dir to resume from (params + optimizer + counters)",
    )
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from siu3r_tpu.config import bind_scannet_classes, load_config
    from siu3r_tpu.data import Loader
    from siu3r_tpu.parallel import create_mesh, replicate, shard_batch
    from siu3r_tpu.pipeline import Pipeline, TrainState
    from siu3r_tpu.checkpoint_io import restore_train_state, save_train_state
    from siu3r_tpu.train.optimizer import make_lr_schedule
    from siu3r_tpu.utils.logging import MetricsHistory, RankedLogger

    log = RankedLogger(__name__)
    cfg = bind_scannet_classes(load_config(args.config, args.overrides))
    out_dir = Path(cfg.output_path or f"outputs/{cfg.mode}/{cfg.experiment}")
    out_dir.mkdir(parents=True, exist_ok=True)
    history = MetricsHistory(out_dir)

    dataset = build_dataset(cfg, train=cfg.mode == "train")
    loader = Loader(
        dataset,
        batch_size=cfg.datamodule.train_loader_cfg.batch_size,
        num_workers=cfg.datamodule.train_loader_cfg.num_workers,
        shuffle=cfg.mode == "train",
        seed=cfg.seed,
    )
    steps_per_epoch = max(len(loader), 1)
    pipe = Pipeline(cfg, steps_per_epoch=steps_per_epoch)
    mesh = create_mesh(min(cfg.trainer.devices, len(jax.devices())))
    log.info(f"mesh: {mesh}; steps/epoch: {steps_per_epoch}")

    first = next(iter(loader))
    use_zero1 = cfg.trainer.zero1 and mesh.size > 1
    state = pipe.init_state(
        jax.random.PRNGKey(cfg.seed), first,
        zero1_mesh=mesh if use_zero1 else None,
    )
    start_epoch, global_step = 0, 0
    if args.resume:
        state, start_epoch, global_step = restore_train_state(args.resume, state)
        start_epoch += 1
        log.info(f"resumed {args.resume}: epoch {start_epoch}, step {global_step}")
    if use_zero1:
        # params/stats replicate; the sharded opt_state already carries its
        # mesh layout from init_zero1_opt_state (or the checkpoint template)
        state = TrainState(
            params=replicate(state.params, mesh),
            batch_stats=replicate(state.batch_stats, mesh),
            opt_state=state.opt_state,
            step=state.step,
        )
        step_fn = pipe.make_zero1_dp_train_step(mesh)
        log.info("ZeRO-1: optimizer state sharded over the data axis")
    else:
        state = replicate(state, mesh)
        step_fn = (
            pipe.make_dp_train_step(mesh)
            if mesh.size > 1
            else pipe.make_train_step()
        )

    def numeric(batch):
        import numpy as np

        return {
            k: v
            for k, v in batch.items()
            if isinstance(v, np.ndarray) and v.dtype != object
        }

    # LearningRateMonitor equivalent: evaluate the base-group schedule
    lr_of = make_lr_schedule(
        cfg.optimizer.lr, cfg.optimizer.warm_up_epochs,
        cfg.trainer.max_epochs, steps_per_epoch,
    )

    # training-time periodic visualization (reference src/pipeline.py:271-280
    # writes visualizer outputs every log_training_result_interval steps):
    # rerun the jitted eval step on the current train batch and write
    # rendered-vs-GT rgb/depth + seg overlays under out_dir/train_viz/.
    # The eval step is built lazily — one extra compile, paid only if the
    # interval is enabled and training reaches it.
    viz_interval = cfg.pipeline.log_training_result_interval
    _viz_ctx = {}

    def write_train_viz(batch, num_batch, step):
        from siu3r_tpu.visualizer import Visualizer

        if "viz" not in _viz_ctx:
            _viz_ctx["viz"] = Visualizer(cfg.pipeline.visualizer)
            _viz_ctx["eval_step"] = (
                pipe.make_dp_eval_step(mesh)
                if mesh.size > 1
                else pipe.make_eval_step()
            )
        viz, eval_step = _viz_ctx["viz"], _viz_ctx["eval_step"]
        eval_state = TrainState(
            params=state.params, batch_stats=state.batch_stats,
            opt_state=None, step=state.step,
        )
        out, render, _ = eval_step(eval_state, num_batch)
        save_dir = out_dir / "train_viz" / f"step{step:07d}"
        scenes = batch.get("scene_names")
        bsz = batch["context_views_images"].shape[0]
        for bi in range(bsz):
            viz.add_scene(
                str(save_dir),
                scenes[bi] if scenes is not None else f"item{bi}",
                list(map(int, batch["context_views_id"][bi])),
                list(map(int, batch["target_views_id"][bi])),
                np.asarray(render.color[bi]),
                np.asarray(batch["target_views_images"][bi]),
                render_depth=np.asarray(render.depth[bi]),
                context_images=np.asarray(batch["context_views_images"][bi]),
                context_seg_map=np.asarray(out.post["segmentation"][bi]),
                gt_masks=np.asarray(batch["gt_masks"][bi]),
                gt_classes=np.asarray(batch["gt_classes"][bi]),
                gt_valid=np.asarray(batch["gt_valid"][bi]),
            )
        viz.write_files()
        log.info(f"wrote training visualization: {save_dir}")

    # per-step rng = fold_in(base, global_step): a resumed run continues the
    # random stream (matcher/point-sampling draws) instead of replaying the
    # draws already consumed before the checkpoint
    base_rng = jax.random.PRNGKey(cfg.seed + 1)
    max_steps = cfg.trainer.max_steps
    for epoch in range(start_epoch, cfg.trainer.max_epochs):
        t_epoch = time.time()
        loader.set_epoch(epoch)
        for batch in loader:
            if max_steps >= 0 and global_step >= max_steps:
                break
            step_rng = jax.random.fold_in(base_rng, global_step)
            num_batch = shard_batch(numeric(batch), mesh)
            state, losses = step_fn(state, num_batch, step_rng)
            if viz_interval > 0 and global_step % viz_interval == 0:
                try:
                    write_train_viz(batch, num_batch, global_step)
                except Exception as e:  # noqa: BLE001 - viz must never kill training
                    log.warning(f"train viz failed at step {global_step}: {e}")
            if global_step % cfg.trainer.log_every_n_steps == 0:
                vals = {k: float(v) for k, v in losses.items() if "_" not in k or k in ("render_mse", "depth_smoothness", "seg", "lpips", "total", "word_match")}
                log.info(f"epoch {epoch} step {global_step}: " + json.dumps(vals))
                history.log(
                    global_step, epoch=epoch, lr=float(lr_of(global_step)),
                    **{f"train/{k}": v for k, v in vals.items()},
                )
            global_step += 1
        log.info(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s")
        history.log(
            global_step, epoch=epoch, epoch_seconds=time.time() - t_epoch
        )
        hit_max_steps = max_steps >= 0 and global_step >= max_steps
        if (
            (epoch + 1) % cfg.trainer.check_val_every_n_epoch == 0
            or epoch == cfg.trainer.max_epochs - 1
            or hit_max_steps
        ):
            ckpt_dir = out_dir / "checkpoints" / f"epoch{epoch:03d}-{global_step}"
            save_train_state(ckpt_dir, state, epoch, global_step)
            log.info(f"saved checkpoint {ckpt_dir}")
        if hit_max_steps:
            break


if __name__ == "__main__":
    main()
