"""Training/validation pipeline (the reference's Lightning Pipeline
equivalent, src/pipeline.py — as pure jitted step functions over a device
mesh instead of a Trainer/DDP runtime).

Loss recipe parity (pipeline.py:216-281, :337-364):
  total = 0.05 * seg + 0.05 * instance-masked depth smoothness
        + MSE(render, gt) + 0.5 * LPIPS(half-res)

Distributed: data-parallel via jit + NamedSharding over the mesh's ``data``
axis — batch sharded, params replicated, gradient all-reduce inserted by XLA
(the reference's Lightning DDP/NCCL equivalent, SURVEY.md §2.3/§5.8).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from siu3r_tpu.config import RootCfg
from siu3r_tpu.models.layers import bilinear_resize_torch
from siu3r_tpu.models.model import SIU3RModel
from siu3r_tpu.renderer import render_gaussians
from siu3r_tpu.train import lpips as lpips_mod
from siu3r_tpu.train.losses import (
    depth_smoothness_loss,
    mse_render_loss,
    segmentation_loss,
)
from siu3r_tpu.train.optimizer import make_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def _shard_global_clip(max_norm: float, axis: str):
    """optax clip-by-global-norm over ZeRO-1 gradient SHARDS: the shards
    partition the full gradient (padding contributes zeros), so the global
    square-norm is the psum of per-device shard square-norms. Must run
    inside shard_map with ``axis`` bound."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        sq = sum(
            jnp.sum(jnp.square(u.astype(jnp.float32)))
            for u in jax.tree.leaves(updates)
        )
        gnorm = jnp.sqrt(jax.lax.psum(sq, axis))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
        return jax.tree.map(lambda u: u * scale.astype(u.dtype), updates), state

    return optax.GradientTransformation(init, update)


class Pipeline:
    """Owns the model + optimizer + loss config; produces jittable steps."""

    def __init__(self, cfg: RootCfg, steps_per_epoch: int = 1000,
                 lpips_weights: Optional[str] = None,
                 lpips_enabled: bool = True):
        self.cfg = cfg
        self.model = SIU3RModel(cfg.pipeline.model)
        self.lpips_enabled = lpips_enabled
        self.lpips_params = (
            lpips_mod.init_lpips_params(lpips_weights) if lpips_enabled else None
        )
        self.steps_per_epoch = steps_per_epoch
        self._tx = None

    def init_state(
        self, rng: jax.Array, batch: Dict[str, jax.Array],
        zero1_mesh=None,
    ) -> TrainState:
        images = jnp.asarray(batch["context_views_images"])
        intr = jnp.asarray(batch["context_views_intrinsics"])
        kw = {}
        if "text_token" in batch:
            # refer mode: trace the text embedder + lang cross-attn layers so
            # their params exist in the state
            kw["text_tokens"] = jnp.asarray(batch["text_token"])
        # jit the init: unjitted init dispatches per-op (~270 s for the full
        # model through the device tunnel)
        variables = jax.jit(functools.partial(self.model.init, **kw))(
            rng, images, intr
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_kw = dict(
            steps_per_epoch=self.steps_per_epoch,
            freeze_encoder=self.cfg.pipeline.model.croco.freeze == "encoder",
        )
        self._tx = make_optimizer(
            params, self.cfg.optimizer, self.cfg.trainer, **opt_kw
        )
        # ZeRO-1 twin: global-norm clip as a psum-over-shards stage (the
        # shards partition the gradient exactly — padding is zeros — so
        # psum of shard square-norms IS the global square-norm), chained
        # before the clip-free optimizer. Runs inside shard_map only.
        self._tx_inner = make_optimizer(
            params, self.cfg.optimizer, self.cfg.trainer,
            include_clip=False, **opt_kw,
        )
        clip = self.cfg.trainer.gradient_clip_val
        if clip and clip > 0:
            self._tx_inner = optax.chain(
                _shard_global_clip(clip, "data"), self._tx_inner
            )
        # gradient accumulation (reference Trainer(accumulate_grad_batches),
        # src/run.py:89): average grads over k micro-batches, update every
        # k-th step; the clip then sees the AVERAGED gradient, matching
        # Lightning. MultiSteps is elementwise so it wraps the ZeRO-1 twin
        # too (the accumulator then lives sharded, 1/N per device).
        k_accum = self.cfg.trainer.accumulate_grad_batches
        if k_accum and k_accum > 1:
            self._tx = optax.MultiSteps(self._tx, k_accum)
            self._tx_inner = optax.MultiSteps(self._tx_inner, k_accum)
        if zero1_mesh is not None:
            opt_state = self.init_zero1_opt_state(zero1_mesh, params)
        else:
            opt_state = self._tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )

    @property
    def tx(self):
        assert self._tx is not None, "call init_state first"
        return self._tx

    def loss_fn(self, params, batch_stats, batch, rng):
        m2f = self.cfg.pipeline.model.mask2former
        pcfg = self.cfg.pipeline
        images = batch["context_views_images"]
        intr = batch["context_views_intrinsics"]
        h, w = images.shape[2], images.shape[3]

        out, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            intr,
            train=True,
            mutable=["batch_stats"],
        )

        with jax.named_scope("render_losses"):
            # rasterizer backward: the analytic Pallas kernel inside the
            # validated shape envelope (round-5 fault battery — green at
            # B=1, crashes at B=3; raster_bwd_mode docstring has the
            # record), the differentiated jnp twin outside it. Shapes are
            # static at trace time, so the gate is too.
            from siu3r_tpu.render.rasterizer import raster_bwd_mode

            n_frames = (
                batch["target_views_extrinsics"].shape[0]
                * batch["target_views_extrinsics"].shape[1]
            )
            render = render_gaussians(
                out.gaussians,
                batch["target_views_extrinsics"],
                batch["target_views_intrinsics"],
                (h, w),
                bwd_mode=raster_bwd_mode(view_frames=n_frames),
            )

        losses: Dict[str, jax.Array] = {}
        with jax.named_scope("criterion"):
            seg_losses = segmentation_loss(
                out.seg.aux_class_logits,
                out.seg.aux_mask_logits,
                batch["gt_masks"],
                batch["gt_classes"],
                batch["gt_valid"],
                rng,
                num_labels=m2f.num_labels,
                class_weight=m2f.class_weight,
                mask_weight=m2f.mask_weight,
                dice_weight=m2f.dice_weight,
                no_object_weight=m2f.no_object_weight,
                num_points=m2f.train_num_points,
                oversample=m2f.oversample_ratio,
                importance=m2f.importance_sample_ratio,
            )
        losses["seg"] = seg_losses["seg_total"]
        loss = pcfg.weight_seg_loss * losses["seg"]

        # depth smoothness on the CONTEXT views' rendered depths. The
        # datamodule sorts extra target views BETWEEN the context pair
        # (datasets.py:145-152), so the context views are NOT the first V
        # targets — per batch item we locate each context id inside the
        # target list and gather exactly those rendered depths (the
        # reference's context_in_target_ids, src/pipeline.py:223-245),
        # computed on-device from the id arrays (static shapes, jit-safe).
        v = images.shape[1]
        if "context_views_id" in batch and "target_views_id" in batch:
            ctx_ids = jnp.asarray(batch["context_views_id"])  # [B, V]
            tgt_ids = jnp.asarray(batch["target_views_id"])  # [B, N]
            ctx_pos = jnp.argmax(
                ctx_ids[:, :, None] == tgt_ids[:, None, :], axis=-1
            )  # [B, V]
            ctx_depth = jnp.take_along_axis(
                render.depth, ctx_pos[:, :, None, None], axis=1
            )
        else:
            # synthetic batches without view ids (tests/bench/dryrun): fall
            # back to the first V targets
            ctx_depth = render.depth[:, :v]
        seg_mask = out.post["segmentation"]
        losses["depth_smoothness"] = depth_smoothness_loss(
            ctx_depth, seg_mask,
            instance_masked=pcfg.enable_instance_depth_smoothness,
        )
        loss = loss + pcfg.weight_depth_smoothness * losses["depth_smoothness"]

        target_images = batch["target_views_images"]
        losses["render_mse"] = mse_render_loss(render.color, target_images)
        loss = loss + losses["render_mse"]

        if self.lpips_enabled:
            b, n = target_images.shape[0], target_images.shape[1]
            half = (h // 2, w // 2)
            with jax.named_scope("lpips"):
                pred_half = bilinear_resize_torch(
                    render.color.reshape(b * n, h, w, 3), half,
                    align_corners=True
                )
                tgt_half = bilinear_resize_torch(
                    target_images.reshape(b * n, h, w, 3), half,
                    align_corners=True
                )
                losses["lpips"] = lpips_mod.lpips(
                    self.lpips_params, pred_half, tgt_half
                )
            loss = loss + 0.5 * losses["lpips"]
        else:
            losses["lpips"] = jnp.zeros(())

        losses["total"] = loss
        return loss, (mutated["batch_stats"], losses)

    def refer_loss_fn(self, params, batch_stats, batch, rng):
        """Referring-expression training loss (reference get_loss_dict refer
        branch, video_seg_decoder.py:2308-2320 + refer_seg_forward :573-594):
        seg-only forward (no gaussian heads — ScanRefer batches carry no
        target views), final-layer Hungarian assignment, word-match CE. The
        word/query similarity logits flow through the 6 lang cross-attn
        layers inside VideoMask2Former (:2400-2443)."""
        m2f = self.cfg.pipeline.model.mask2former
        images = batch["context_views_images"]
        intr = batch["context_views_intrinsics"]
        (seg, post), mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            intr,
            text_tokens=batch["text_token"],
            train=True,
            mutable=["batch_stats"],
            method=SIU3RModel.seg_forward,
        )
        from siu3r_tpu.train.losses import refer_word_match_loss
        from siu3r_tpu.train.matcher import hungarian_match

        b = images.shape[0]
        match_rngs = jax.random.split(rng, b)
        assignment = jax.vmap(
            functools.partial(
                hungarian_match,
                num_points=m2f.train_num_points,
                cost_class=1.0,
                cost_mask=m2f.mask_weight,
                cost_dice=m2f.dice_weight,
            )
        )(
            seg.class_queries_logits,
            seg.masks_queries_logits,
            batch["gt_masks"],
            batch["gt_classes"],
            batch["gt_valid"],
            match_rngs,
        )
        losses: Dict[str, jax.Array] = {}
        losses["word_match"] = refer_word_match_loss(
            seg.word_logits, assignment, batch["gt_valid"]
        )
        loss = self.cfg.pipeline.weight_seg_loss * losses["word_match"]
        losses["total"] = loss
        return loss, (mutated["batch_stats"], losses)

    def _pick_loss_fn(self, batch):
        """Static dispatch: ScanRefer batches (text_token present) train the
        refer path; everything else the full recon+seg recipe."""
        return self.refer_loss_fn if "text_token" in batch else self.loss_fn

    def train_step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        (loss, (new_stats, losses)), grads = jax.value_and_grad(
            self._pick_loss_fn(batch), has_aux=True
        )(state.params, state.batch_stats, batch, rng)
        with jax.named_scope("optimizer"):
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, losses

    def make_dp_train_step(self, mesh, axis: str = "data"):
        """Data-parallel train step via shard_map with EXPLICIT collectives
        (pmean of grads/losses/batch-stats over the ``axis``) — the
        reference's DDP gradient all-reduce (SURVEY.md §2.3), expressed as
        first-class XLA collectives rather than GSPMD auto-partitioning.
        State replicated; batch sharded on its leading dim; per-shard loss
        RNG decorrelated by axis index."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        def per_shard(state: TrainState, batch, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            (loss, (new_stats, losses)), grads = jax.value_and_grad(
                self._pick_loss_fn(batch), has_aux=True
            )(state.params, state.batch_stats, batch, rng)
            grads = jax.lax.pmean(grads, axis)
            losses = jax.lax.pmean(losses, axis)
            new_stats = jax.lax.pmean(new_stats, axis)
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            return (
                TrainState(
                    params=new_params,
                    batch_stats=new_stats,
                    opt_state=new_opt,
                    step=state.step + 1,
                ),
                losses,
            )

        mapped = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        # donate the state: params + Adam moments are ~7.4 GB fp32 for the
        # full model — without donation old+new state coexist and the loop
        # OOMs a 16 GB v5e chip (round-2 finding)
        return jax.jit(mapped, donate_argnums=(0,))

    def make_train_step(self, donate: bool = True):
        """Single-device jitted train step with the state donated (see
        make_dp_train_step note). ``donate=False`` keeps old+new state alive
        — only viable at small batch; used to isolate donation effects
        (bench.py --no-donate)."""
        return jax.jit(
            self.train_step, donate_argnums=(0,) if donate else ()
        )

    # ---- ZeRO-1: optimizer-state sharding over the data axis ----
    #
    # TPU-native extension beyond the reference's plain DDP: the Adam
    # moments (~4.9 GB fp32 for the full model) are the largest replicated
    # buffer in the train state. Each device stores and updates only a
    # 1/N slice of every leaf (flattened, zero-padded to a multiple of N),
    # then all-gathers the updated params over ICI. Numerically identical
    # to the replicated path: grads are pmean'd and global-norm-clipped on
    # the FULL (replicated) tensors first, and AdamW is elementwise, so
    # slicing commutes with the update. This is what frees the HBM needed
    # for V=8 multi-view training (reference configs/main_multi.yaml) on
    # 16 GB chips.

    @staticmethod
    def _zero1_spec(opt_state, axis: str = "data"):
        """Per-leaf PartitionSpec tree for a sharded opt_state: vector
        (per-param) leaves concatenate over the data axis; scalar leaves
        (schedule/Adam counts) are replicated."""
        from jax.sharding import PartitionSpec as P

        return jax.tree.map(
            lambda s: P(axis) if getattr(s, "ndim", 0) >= 1 else P(),
            opt_state,
        )

    @staticmethod
    def _shard_leaf(x, idx, n):
        flat = x.reshape(-1)
        pad = (-flat.size) % n
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad,), flat.dtype)]
            )
        per = flat.size // n
        return jax.lax.dynamic_slice(flat, (idx * per,), (per,))

    @staticmethod
    def _unshard_leaf(x_s, like, axis):
        full = jax.lax.all_gather(x_s, axis_name=axis, tiled=True)
        return full[: like.size].reshape(like.shape).astype(like.dtype)

    def init_zero1_opt_state(self, mesh, params, axis: str = "data"):
        """Sharded optimizer init: each device materializes only its slice
        of the Adam moments (never the full 2x-params state)."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        n = mesh.shape[axis]

        def per_shard(p):
            idx = jax.lax.axis_index(axis)
            p_s = jax.tree.map(lambda x: self._shard_leaf(x, idx, n), p)
            return self._tx_inner.init(p_s)

        shard_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                ((x.size + (-x.size) % n) // n,), x.dtype
            ),
            params,
        )
        out_spec = self._zero1_spec(
            jax.eval_shape(self._tx_inner.init, shard_shapes), axis
        )
        mapped = shard_map(
            per_shard, mesh=mesh, in_specs=(P(),), out_specs=out_spec,
            check_vma=False,
        )
        return jax.jit(mapped)(params)

    def make_zero1_dp_train_step(self, mesh, axis: str = "data"):
        """Data-parallel train step with ZeRO-1 sharded optimizer state.
        Same contract as make_dp_train_step except ``state.opt_state`` must
        come from ``init_zero1_opt_state`` (leaves are flat per-device
        shards)."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        assert axis == "data", "ZeRO-1 clip stage is bound to the data axis"
        n = mesh.shape[axis]

        def per_shard(state: TrainState, batch, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            (loss, (new_stats, losses)), grads = jax.value_and_grad(
                self._pick_loss_fn(batch), has_aux=True
            )(state.params, state.batch_stats, batch, rng)
            grads = jax.lax.pmean(grads, axis)
            losses = jax.lax.pmean(losses, axis)
            new_stats = jax.lax.pmean(new_stats, axis)
            # global-norm clip happens inside self._tx_inner as a
            # psum-over-shards stage (_shard_global_clip)
            idx = jax.lax.axis_index(axis)
            grads_s = jax.tree.map(
                lambda g: self._shard_leaf(g, idx, n), grads
            )
            params_s = jax.tree.map(
                lambda p: self._shard_leaf(p, idx, n), state.params
            )
            updates_s, new_opt = self._tx_inner.update(
                grads_s, state.opt_state, params_s
            )
            new_params_s = optax.apply_updates(params_s, updates_s)
            new_params = jax.tree.map(
                lambda s, p: self._unshard_leaf(s, p, axis),
                new_params_s,
                state.params,
            )
            return (
                TrainState(
                    params=new_params,
                    batch_stats=new_stats,
                    opt_state=new_opt,
                    step=state.step + 1,
                ),
                losses,
            )

        def step(state, batch, rng):
            # spec tree derived from the (traced) opt_state structure —
            # vectors shard over the axis, scalars replicate
            opt_spec = self._zero1_spec(state.opt_state, axis)
            st_spec = TrainState(
                params=P(), batch_stats=P(), opt_state=opt_spec, step=P()
            )
            mapped = shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(st_spec, P(axis), P()),
                out_specs=(st_spec, P()),
                check_vma=False,
            )
            return mapped(state, batch, rng)

        return jax.jit(step, donate_argnums=(0,))

    def make_eval_step(self):
        return jax.jit(self.eval_step)

    def refer_eval_step(self, state: TrainState, batch):
        """Referring-expression eval forward: seg-only model pass with text
        tokens; per word, the argmax-similarity query's mask is upsampled to
        the input resolution (bilinear, like the reference's post-process
        interpolate) and thresholded at 0.5.

        Returns (pred_masks [B, W, V, H, W] bool, word_logits [B, W, Q])."""
        images = batch["context_views_images"]
        intr = batch["context_views_intrinsics"]
        h, w = images.shape[2], images.shape[3]
        seg, _post = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            intr,
            text_tokens=batch["text_token"],
            method=SIU3RModel.seg_forward,
        )
        pred_q = jnp.argmax(seg.word_logits, axis=-1)  # [B, W]
        # gather each word's query mask logits [B, W, V, h/4, w/4]
        masks = jnp.take_along_axis(
            seg.masks_queries_logits,
            pred_q[:, :, None, None, None],
            axis=1,
        )
        b, nw, v = masks.shape[0], masks.shape[1], masks.shape[2]
        up = jax.image.resize(
            masks.reshape(b * nw * v, *masks.shape[3:]),
            (b * nw * v, h, w),
            method="bilinear",
        ).reshape(b, nw, v, h, w)
        return up > 0.0, seg.word_logits  # sigmoid(x) > 0.5  <=>  x > 0

    def make_refer_eval_step(self):
        return jax.jit(self.refer_eval_step)

    def make_dp_eval_step(self, mesh, axis: str = "data"):
        """Data-parallel validation step: batch sharded over ``axis``, params
        replicated, per-shard forward + novel-view render + factored qc
        render — the reference's all-ranks ``validation_step``
        (src/pipeline.py:289-326, 8-GPU DDP val). Output batch dims come
        back sharded over the mesh; the caller gathers host-side and runs
        the single-process evaluator — the reference's
        rank-0-behind-barriers protocol (pipeline.py:315-326), with the
        device->host gather standing in for the shared-filesystem round
        trip."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        mapped = shard_map(
            lambda state, batch: self.eval_step(state, batch),
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
        return jax.jit(mapped)

    def eval_step(self, state: TrainState, batch):
        """Validation forward: lift + novel-view render (reference
        step_w_query_class_logit_lift, pipeline.py:89-214). Color and the
        factored qc channels composite over ONE shared projection/binning
        per view (renderer.render_color_and_qc)."""
        from siu3r_tpu.renderer import render_color_and_qc

        images = batch["context_views_images"]
        intr = batch["context_views_intrinsics"]
        h, w = images.shape[2], images.shape[3]
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            intr,
            enable_query_class_logit_lift=True,
        )
        b, v = images.shape[0], images.shape[1]
        s = out.post["qc_mask_probs"].shape[1]
        qc_mask_cols = (
            out.post["qc_mask_probs"].reshape(b, s, v * h * w).transpose(0, 2, 1)
        )
        render, qc = render_color_and_qc(
            out.gaussians,
            out.post["qc_class_probs"],
            qc_mask_cols,
            batch["target_views_extrinsics"],
            batch["target_views_intrinsics"],
            (h, w),
        )
        return out, render, qc


def lift_rendered_qc(
    qc: jax.Array, query_scores: jax.Array, threshold: float = 0.3,
    num_queries: int = 100, stuff_ids: Tuple[int, ...] = (0, 1),
):
    """Novel-view semantic/instance maps from rendered query-class logits
    (reference pipeline.py:137-202).

    qc [B, V, S, C+1, H, W]; returns (sem_id [B, V, H, W],
    ins_id [B, V, H, W]) with the no-object channel rolled to index 0,
    threshold 0.3, and stuff instance ids remapped to num_queries+stuff+1."""
    c_logit = qc.max(axis=2)  # [B, V, C+1, H, W]
    q_index = qc.argmax(axis=2)
    # roll no-object channel (last) to position 0
    c_logit = jnp.concatenate([c_logit[:, :, -1:], c_logit[:, :, :-1]], axis=2)
    q_index = jnp.concatenate([q_index[:, :, -1:], q_index[:, :, :-1]], axis=2)
    sem_logits = c_logit.max(axis=2)  # [B, V, H, W]
    sem_id = c_logit.argmax(axis=2)
    q_at_sem = jnp.take_along_axis(q_index, sem_id[:, :, None], axis=2)[:, :, 0]
    ins_id = q_at_sem + 1
    sem_id = jnp.where(sem_logits < threshold, 0, sem_id)
    ins_id = jnp.where(sem_id == 0, 0, ins_id)
    for stuff in stuff_ids:
        stuff_mask = sem_id == (stuff + 1)
        ins_id = jnp.where(stuff_mask, num_queries + stuff + 1, ins_id)
    return sem_id, ins_id
