"""Optimizer: 3-group AdamW with warmup->cosine schedule and encoder freeze.

Mirrors reference Pipeline.configure_optimizers (pipeline.py:366-423):
  * gaussian_param_head* / intrinsic_encoder -> 5x lr
  * mask2former / adapter -> 3x lr (10x in the multi-view pipeline,
    pipeline_multi.py:397)
  * everything else -> 0.1x lr
  * AdamW wd 0.05, betas (0.9, 0.95); linear warmup over ``warm_up_epochs``
    then cosine to 0.05x lr
  * frozen encoder params (patch_embed, enc_blocks, enc_norm when
    freeze == 'encoder') receive zero updates (reference model.py:51-60)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from siu3r_tpu.config import OptimizerCfg, TrainerCfg


def _group_of(path: tuple, freeze_encoder: bool) -> str:
    keys = [str(getattr(p, "key", p)) for p in path]
    joined = "/".join(keys)
    if freeze_encoder and (
        "backbone/patch_embed" in joined
        or "backbone/enc_blocks" in joined
        or "backbone/enc_norm" in joined
    ):
        return "frozen"
    if "gaussian_param_head" in joined or "intrinsic_encoder" in joined:
        return "normal"  # 5x
    if "mask2former" in joined or "adapter" in joined:
        return "high"  # 3x
    return "low"  # 0.1x


def make_lr_schedule(
    base_lr: float, warm_up_epochs: int, max_epochs: int, steps_per_epoch: int
):
    """LinearLR(1/warmup -> 1) over warmup epochs, then cosine annealing to
    eta_min = 0.05 * base_lr (reference pipeline.py:402-416). The torch
    schedulers step per epoch; we interpolate per step."""
    warm = optax.linear_schedule(
        base_lr / max(warm_up_epochs, 1),
        base_lr,
        warm_up_epochs * steps_per_epoch,
    )
    cosine = optax.cosine_decay_schedule(
        base_lr,
        max(max_epochs - warm_up_epochs, 1) * steps_per_epoch,
        alpha=0.05,
    )
    return optax.join_schedules([warm, cosine], [warm_up_epochs * steps_per_epoch])


def make_optimizer(
    params: Any,
    opt_cfg: OptimizerCfg,
    trainer_cfg: TrainerCfg,
    steps_per_epoch: int = 1000,
    freeze_encoder: bool = True,
    seg_lr_mult: float | None = None,
    include_clip: bool = True,
):
    """``include_clip=False`` returns the chain WITHOUT the global-norm clip
    stage — used by the ZeRO-1 sharded train step, which must compute the
    clip factor on the full (replicated) gradients before slicing per-device
    shards (a shard-local global_norm would be wrong)."""
    lr = opt_cfg.lr
    seg_mult = seg_lr_mult if seg_lr_mult is not None else opt_cfg.seg_lr_mult

    def sched(mult):
        return make_lr_schedule(
            lr * mult,
            opt_cfg.warm_up_epochs,
            trainer_cfg.max_epochs,
            steps_per_epoch,
        )

    def adamw(mult):
        return optax.adamw(
            learning_rate=sched(mult),
            b1=opt_cfg.betas[0],
            b2=opt_cfg.betas[1],
            weight_decay=opt_cfg.weight_decay,
        )

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _group_of(path, freeze_encoder), params
    )
    tx = optax.multi_transform(
        {
            "normal": adamw(opt_cfg.gaussian_head_lr_mult),
            "high": adamw(seg_mult),
            "low": adamw(opt_cfg.base_lr_mult),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if (
        include_clip
        and trainer_cfg.gradient_clip_val
        and trainer_cfg.gradient_clip_val > 0
    ):
        tx = optax.chain(
            optax.clip_by_global_norm(trainer_cfg.gradient_clip_val), tx
        )
    return tx
