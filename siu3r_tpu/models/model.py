"""SIU3RModel: backbone + ViT-Adapter + DPT heads + Mask2Former composition.

Mirrors reference src/models/model.py:31-467 (two-view) and
src/models/model_multi.py (multi-view): one forward pass produces
pixel-aligned 3D Gaussians (centers = pts3d head point map) and
view-consistent panoptic segmentation lifted onto those Gaussians.

TPU-first notes: both views run through the (shared) adapter in one batched
call; heads run fp32 regardless of the backbone compute dtype (the reference
casts decoder tokens to .float() at model.py:191-208); the panoptic lift is
the dense jit-able redesign in mask2former/postprocess.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from siu3r_tpu.config import ModelCfg
from siu3r_tpu.gaussians import Gaussians
from siu3r_tpu.models.adapter import CroCoViTAdapter
from siu3r_tpu.models.backbone import AsymmetricCroCo, AsymmetricCroCoMulti
from siu3r_tpu.models.gaussian_adapter import adapt_gaussians
from siu3r_tpu.models.heads.dpt import DPTHead, dpt_hooks, postprocess_pts3d
from siu3r_tpu.models.mask2former import VideoMask2Former
from siu3r_tpu.models.mask2former.model import SegOutput
from siu3r_tpu.models.mask2former.postprocess import (
    panoptic_segmentation,
    qc_logits_per_pixel,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelOutput:
    gaussians: Gaussians  # flattened [B, V*H*W, ...] w/ labels attached
    seg: SegOutput
    post: Dict[str, jax.Array]  # dense panoptic post-process outputs
    pts3d: jax.Array  # [B, V, H, W, 3]


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class SIU3RModel(nn.Module):
    cfg: ModelCfg

    def setup(self):
        c = self.cfg
        dt = _dtype(c.dtype)
        if c.num_views == 2:
            self.backbone = AsymmetricCroCo(c.croco, dtype=dt)
        else:
            self.backbone = AsymmetricCroCoMulti(c.croco, dtype=dt)
        d = c.croco.enc_depth
        # [5, 11, 17, 23] for depth 24 (reference vit_adapter.py:317)
        interaction_indexes = tuple(d * k // 4 - 1 for k in (1, 2, 3, 4))
        self.adapter = CroCoViTAdapter(
            num_block=c.croco.enc_depth,
            embed_dim=c.croco.enc_embed_dim,
            patch_size=c.croco.patch_size,
            interaction_indexes=interaction_indexes,
            dtype=dt,
        )
        self.mask2former = VideoMask2Former(c.mask2former, dtype=jnp.float32)
        # pts3d heads: view-0 head and shared other-view head
        # (reference model.py:81-89 / model_multi.py:175-207)
        self.downstream_head1 = DPTHead(num_channels=3, head_type="regression")
        self.downstream_head2 = DPTHead(num_channels=3, head_type="regression")
        self.gaussian_param_head1 = DPTHead(
            num_channels=c.gaussian_head.raw_dim, head_type="gs_params"
        )
        self.gaussian_param_head2 = DPTHead(
            num_channels=c.gaussian_head.raw_dim, head_type="gs_params"
        )
        if c.mask2former.train_refer_segmentation:
            # learned per-expression text encoder (embed + masked mean-pool).
            # The reference ships NO text encoder: ScanRefer provides
            # pre-tokenized ``text_token`` ids (scanrefer_dataset.py:152-170)
            # and VideoMask2Former consumes ready word_embeddings
            # (video_seg_decoder.py:2400-2443) — this closes that gap;
            # swap for frozen CLIP text features when available.
            self.text_embed = nn.Embed(
                c.mask2former.text_vocab_size, c.mask2former.hidden_dim
            )

    def _embed_text(self, text_tokens: jax.Array) -> jax.Array:
        """text_tokens [B, O, T] int (0 = pad) -> one embedding per referred
        expression [B, O, hidden] (masked mean-pool over tokens)."""
        emb = self.text_embed(text_tokens)  # [B, O, T, C]
        m = (text_tokens > 0)[..., None].astype(emb.dtype)
        return (emb * m).sum(axis=2) / jnp.maximum(m.sum(axis=2), 1.0)

    def _hooked(self, dec: List[jax.Array]) -> List[jax.Array]:
        hooks = dpt_hooks(self.cfg.croco.dec_depth)
        return [dec[h].astype(jnp.float32) for h in hooks]

    def _gaussians_for_views(
        self,
        dec_per_view: List[List[jax.Array]],
        images: jax.Array,
        image_size: Tuple[int, int],
    ) -> Tuple[Gaussians, jax.Array]:
        """dec_per_view: per view the 13-entry decoder list. images
        [B, V, H, W, 3]. Returns (gaussians [B, V, H*W, ...], pts3d
        [B, V, H, W, 3])."""
        h, w = image_size
        b, v = images.shape[0], images.shape[1]
        pts_list, raw_list = [], []
        for vi, dec in enumerate(dec_per_view):
            center_head = self.downstream_head1 if vi == 0 else self.downstream_head2
            param_head = (
                self.gaussian_param_head1 if vi == 0 else self.gaussian_param_head2
            )
            tokens = self._hooked(dec)
            raw_pts = center_head(tokens, None, image_size)
            pts = postprocess_pts3d(raw_pts)  # [B, H, W, 3]
            raw_gs = param_head(
                tokens, images[:, vi].astype(jnp.float32), image_size
            )  # [B, H, W, 83]
            pts_list.append(pts)
            raw_list.append(raw_gs)
        pts3d = jnp.stack(pts_list, axis=1)  # [B, V, H, W, 3]
        raw = jnp.stack(raw_list, axis=1)
        means = pts3d.reshape(b, v, h * w, 3)
        raw = raw.reshape(b, v, h * w, -1)
        gaussians = adapt_gaussians(means, raw, self.cfg.gaussian_head.sh_degree)
        return gaussians, pts3d

    def __call__(
        self,
        images: jax.Array,
        intrinsics: jax.Array,
        word_embeddings: Optional[jax.Array] = None,
        text_tokens: Optional[jax.Array] = None,
        enable_query_class_logit_lift: bool = False,
        train: bool = False,
    ) -> ModelOutput:
        """images [B, V, H, W, 3] in [0, 1]; intrinsics [B, V, 3, 3]
        normalized. ``text_tokens`` [B, O, T] int: referring-expression
        inputs, encoded to word_embeddings in-model (refer path).
        Returns ModelOutput with labels lifted onto Gaussians."""
        c = self.cfg
        b, v, h, w, _ = images.shape
        if text_tokens is not None and word_embeddings is None:
            word_embeddings = self._embed_text(text_tokens)

        # named scopes label every fusion in device traces so profiler time
        # attributes to model stages (bench.py --breakdown / BASELINE.md
        # "where the time goes")
        with jax.named_scope("backbone"):
            if c.num_views == 2:
                out = self.backbone(images, intrinsics)
                all_feat_stacked = [
                    jnp.concatenate([f1, f2], axis=0)
                    for f1, f2 in zip(out.all_feat1, out.all_feat2)
                ]
                imgs_flat = jnp.concatenate(
                    [images[:, 0], images[:, 1]], axis=0
                )
                dec_per_view = [out.dec1, out.dec2]
            else:
                mout = self.backbone(images, intrinsics)
                all_feat_stacked = [
                    f.reshape((b * v,) + f.shape[2:]) for f in mout.all_feat
                ]
                imgs_flat = images.reshape(b * v, h, w, 3)
                dec_per_view = [
                    [d[:, vi] for d in mout.dec_feat] for vi in range(v)
                ]
                out = mout

        # one batched adapter call over all views (shared weights; the
        # reference loops views through the same module, model.py:342-345)
        with jax.named_scope("adapter"):
            feats = self.adapter(imgs_flat, all_feat_stacked, train=train)
            multi_scale_feat = []
            for f in feats:
                if c.num_views == 2:
                    f = jnp.stack([f[:b], f[b:]], axis=1)
                else:
                    f = f.reshape((b, v) + f.shape[1:])
                multi_scale_feat.append(f.astype(jnp.float32))

        with jax.named_scope("gaussian_heads"):
            gaussians, pts3d = self._gaussians_for_views(
                dec_per_view, images, (h, w)
            )

        with jax.named_scope("mask2former"):
            seg: SegOutput = self.mask2former(
                multi_scale_feat, word_embeddings=word_embeddings
            )

        m2f = c.mask2former
        with jax.named_scope("panoptic_post"):
            post = panoptic_segmentation(
                seg.class_queries_logits,
                seg.masks_queries_logits,
                target_size=(h, w),
                label_ids_to_fuse=tuple(m2f.label_ids_to_fuse),
                num_labels=m2f.num_labels,
                max_lift_queries=m2f.max_lift_queries,
                threshold=m2f.seg_threshold,
                word_logits=seg.word_logits,
            )

        flat = gaussians.flatten_views()
        semantic = post["semantic"].reshape(b, v * h * w)
        # gaussian labels use 0 background even when the seg map carries the
        # reference's -1 empty-image fill (model.py:267-271 inits zeros)
        instance = jnp.maximum(post["segmentation"], 0).reshape(b, v * h * w)
        flat = flat.replace(semantic_labels=semantic, instance_labels=instance)
        if enable_query_class_logit_lift:
            flat = flat.replace(
                seg_query_class_logits=qc_logits_per_pixel(post),
                seg_query_scores=post["query_scores"],
                seg_query_valid=post["qc_valid"],
            )
        return ModelOutput(gaussians=flat, seg=seg, post=post, pts3d=pts3d)

    def seg_forward(
        self,
        images: jax.Array,
        intrinsics: jax.Array,
        word_embeddings: Optional[jax.Array] = None,
        text_tokens: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """Understanding-only path (reference model.py:391-467): backbone +
        adapter + Mask2Former + panoptic post-process, skipping the gaussian
        heads entirely. Returns (SegOutput, post dict)."""
        c = self.cfg
        b, v, h, w, _ = images.shape
        if text_tokens is not None and word_embeddings is None:
            word_embeddings = self._embed_text(text_tokens)
        if c.num_views == 2:
            out = self.backbone(images, intrinsics)
            all_feat_stacked = [
                jnp.concatenate([f1, f2], axis=0)
                for f1, f2 in zip(out.all_feat1, out.all_feat2)
            ]
            imgs_flat = jnp.concatenate([images[:, 0], images[:, 1]], axis=0)
        else:
            mout = self.backbone(images, intrinsics)
            all_feat_stacked = [
                f.reshape((b * v,) + f.shape[2:]) for f in mout.all_feat
            ]
            imgs_flat = images.reshape(b * v, h, w, 3)
        feats = self.adapter(imgs_flat, all_feat_stacked, train=train)
        multi_scale_feat = []
        for f in feats:
            if c.num_views == 2:
                f = jnp.stack([f[:b], f[b:]], axis=1)
            else:
                f = f.reshape((b, v) + f.shape[1:])
            multi_scale_feat.append(f.astype(jnp.float32))
        seg: SegOutput = self.mask2former(
            multi_scale_feat, word_embeddings=word_embeddings
        )
        m2f = c.mask2former
        post = panoptic_segmentation(
            seg.class_queries_logits,
            seg.masks_queries_logits,
            target_size=(h, w),
            label_ids_to_fuse=tuple(m2f.label_ids_to_fuse),
            num_labels=m2f.num_labels,
            max_lift_queries=m2f.max_lift_queries,
            threshold=m2f.seg_threshold,
            word_logits=seg.word_logits,
        )
        return seg, post
