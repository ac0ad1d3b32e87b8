"""MASt3R-style asymmetric CroCo backbone, TPU-first.

Semantics follow reference src/models/backbone_croco.py:
  * shared ViT-L encoder (24 blocks, dim 1024, 16 heads) over all views,
    with an extra *intrinsic token* = Linear(9->1024)(K.flatten()) appended at
    synthetic position (grid_h, 0) (reference :59, :144-162);
  * two 12-block cross-attention decoders (dim 768): ``dec_blocks`` for view
    0, ``dec_blocks2`` for the other view(s) (reference :231-255, :487-535).

TPU-first design choices:
  * blocks are `nn.scan`-stacked (one trace per block type, stacked params
    [depth, ...]) — compile time stays flat in depth and XLA schedules one
    fused layer body;
  * the multi-view decoder does NOT materialize the O(V^2) per-view context
    copies of the reference's ``generate_ctx_views`` (:499-505). Each view's
    queries attend one shared KV bank of all V*L tokens with an
    exclude-own-view mask — identical math (softmax over the same key set),
    O(V*L) activation memory;
  * all images are NHWC; compute dtype configurable (bf16 for speed).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from siu3r_tpu.config import CrocoCfg
from siu3r_tpu.models.layers import (
    Attention,
    Block,
    CrossAttention,
    DecoderBlock,
    LayerNorm,
    Mlp,
    PatchEmbed,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BackboneOutput:
    """Two-view output bundle (reference backbone forward :317-339)."""

    feat1: jax.Array  # [B, L, 1024] final encoder feat, intrinsic token stripped
    feat2: jax.Array
    all_feat1: List[jax.Array]  # 24 x [B, L, 1024]
    all_feat2: List[jax.Array]
    dec1: List[jax.Array]  # 13 x [B, L, .] ([0]=enc 1024-dim, rest 768-dim)
    dec2: List[jax.Array]
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MultiViewBackboneOutput:
    feat: jax.Array  # [B, V, L, 1024]
    all_feat: List[jax.Array]  # 24 x [B, V, L, 1024]
    dec_feat: List[jax.Array]  # 13 x [B, V, L, .]
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))


class _EncBlockScan(nn.Module):
    num_heads: int
    rope_base: float
    dtype: Any

    @nn.compact
    def __call__(self, x, xpos):
        x = Block(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="block"
        )(x, xpos)
        return x, x


class _DecPairScan(nn.Module):
    """Two-view decoder layer: f1 cross-attends f2 and vice versa
    (reference backbone_croco.py:244-250)."""

    num_heads: int
    rope_base: float
    dtype: Any

    @nn.compact
    def __call__(self, carry, pos1, pos2):
        f1, f2 = carry
        new_f1, _ = DecoderBlock(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="block1"
        )(f1, f2, pos1, pos2)
        new_f2, _ = DecoderBlock(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="block2"
        )(f2, f1, pos2, pos1)
        return (new_f1, new_f2), (new_f1, new_f2)


class MultiViewDecoderBlock(nn.Module):
    """DecoderBlock with per-view self-attention and masked shared-bank
    cross-attention. Parameter layout identical to DecoderBlock so checkpoint
    conversion treats both uniformly.

    Inputs: x [B, Vq, L, C] queries, bank [B, Vk*L, C], positions, and a
    cross mask [1, Vq*L, Vk*L] excluding each query view's own keys.
    """

    num_heads: int
    rope_base: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, xpos, bank, bank_pos, cross_mask):
        b, vq, l, c = x.shape
        xf = x.reshape(b * vq, l, c)
        posf = xpos.reshape(b * vq, l, 2)
        # self-attention stays within each view (reference runs these streams
        # batched per view, backbone_croco.py:520-526)
        xf = xf + Attention(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="attn"
        )(LayerNorm(name="norm1")(xf), posf)
        x = xf.reshape(b, vq, l, c)
        # masked cross-attention over the shared bank
        y_ = LayerNorm(name="norm_y")(bank)
        q = x.reshape(b, vq * l, c)
        qpos = xpos.reshape(b, vq * l, 2)
        q = q + CrossAttention(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="cross_attn"
        )(LayerNorm(name="norm2")(q), y_, y_, qpos, bank_pos, mask=cross_mask)
        q = q + Mlp(int(c * 4.0), dtype=self.dtype, name="mlp")(
            LayerNorm(name="norm3")(q)
        )
        return q.reshape(b, vq, l, c)


class _MultiDecPairScan(nn.Module):
    """Multi-view decoder layer over the shared KV bank
    (reference backbone_croco.py:508-528)."""

    num_heads: int
    rope_base: float
    dtype: Any

    @nn.compact
    def __call__(self, carry, pos_bv, bank_pos, mask1, mask2):
        f = carry  # [B, V, L, C]
        b, v, l, c = f.shape
        bank = f.reshape(b, v * l, c)
        new_f1 = MultiViewDecoderBlock(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="block1"
        )(f[:, :1], pos_bv[:, :1], bank, bank_pos, mask1)
        new_f2 = MultiViewDecoderBlock(
            self.num_heads, rope_base=self.rope_base, dtype=self.dtype, name="block2"
        )(f[:, 1:], pos_bv[:, 1:], bank, bank_pos, mask2)
        new_f = jnp.concatenate([new_f1, new_f2], axis=1)
        return new_f, new_f


class _CroCoBase(nn.Module):
    cfg: CrocoCfg
    dtype: Any = jnp.float32

    def _setup_common(self, dec_pair_cls):
        c = self.cfg
        self.patch_embed = PatchEmbed(
            patch_size=c.patch_size, embed_dim=c.enc_embed_dim, dtype=self.dtype
        )
        self.intrinsic_encoder = nn.Dense(c.enc_embed_dim, name="intrinsic_encoder")
        # nn.remat inside the scan: backward recomputes each block body
        # instead of storing per-block attention/MLP intermediates (param
        # paths are unchanged — remat is a transparent lifted transform)
        self.enc_blocks = nn.scan(
            nn.remat(_EncBlockScan, prevent_cse=False),
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.enc_depth,
            in_axes=nn.broadcast,
        )(num_heads=c.enc_num_heads, rope_base=c.rope_base, dtype=self.dtype, name="enc_blocks")
        self.enc_norm = LayerNorm(name="enc_norm")
        self.decoder_embed = nn.Dense(c.dec_embed_dim, name="decoder_embed")
        self.dec_pairs = nn.scan(
            nn.remat(dec_pair_cls, prevent_cse=False),
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.dec_depth,
            in_axes=nn.broadcast,
        )(num_heads=c.dec_num_heads, rope_base=c.rope_base, dtype=self.dtype, name="dec_blocks")
        self.dec_norm = LayerNorm(name="dec_norm")

    def _encode_flat(self, images_flat: jax.Array, intrinsics_flat: jax.Array):
        """Encode N=(B*V) images (reference _encode_image :144-162).

        Returns (normed feat [N, L+1, C], pos [N, L+1, 2], stacked raw block
        outputs [depth, N, L+1, C]).
        """
        n, h, w, _ = images_flat.shape
        x, pos = self.patch_embed(images_flat)
        intr_tok = self.intrinsic_encoder(intrinsics_flat.reshape(n, 9))
        x = jnp.concatenate([x, intr_tok[:, None, :].astype(x.dtype)], axis=1)
        gh = h // self.cfg.patch_size
        # intrinsic token sits at synthetic position (grid_h, 0)
        # (reference :148-150: y = pos[0].y + pos[-1].y + 1 = gh, x = 0)
        add_pos = jnp.concatenate(
            [
                jnp.full((n, 1, 1), gh, dtype=pos.dtype),
                jnp.zeros((n, 1, 1), dtype=pos.dtype),
            ],
            axis=-1,
        )
        pos = jnp.concatenate([pos, add_pos], axis=1)
        x, all_feat = self.enc_blocks(x, pos)
        feat = self.enc_norm(x)
        return feat, pos, all_feat


class AsymmetricCroCo(_CroCoBase):
    """Two-view backbone (reference backbone_croco.py:24-347)."""

    def setup(self):
        self._setup_common(_DecPairScan)

    def __call__(self, images: jax.Array, intrinsics: jax.Array) -> BackboneOutput:
        """images [B, 2, H, W, 3]; intrinsics [B, 2, 3, 3] (normalized)."""
        b, v, h, w, _ = images.shape
        assert v == 2, "AsymmetricCroCo is the two-view backbone"
        feat, pos, all_feat_stack = self._encode_flat(
            images.reshape(b * v, h, w, 3), intrinsics.reshape(b * v, 3, 3)
        )
        lp1 = feat.shape[1]  # L+1
        feat = feat.reshape(b, v, lp1, -1)
        pos = pos.reshape(b, v, lp1, 2)
        feat1, feat2 = feat[:, 0], feat[:, 1]
        pos1, pos2 = pos[:, 0], pos[:, 1]

        f1 = self.decoder_embed(feat1)
        f2 = self.decoder_embed(feat2)
        (_, _), (dec1_stack, dec2_stack) = self.dec_pairs((f1, f2), pos1, pos2)

        # dec lists mirror reference ``final_output`` after deleting the
        # projected duplicate: [enc_feat, blk1..blk12(last normed)] (:231-255)
        dec1 = [feat1] + [dec1_stack[i] for i in range(self.cfg.dec_depth)]
        dec2 = [feat2] + [dec2_stack[i] for i in range(self.cfg.dec_depth)]
        dec1[-1] = self.dec_norm(dec1[-1])
        dec2[-1] = self.dec_norm(dec2[-1])

        strip = lambda t: t[:, :-1]
        depth = self.cfg.enc_depth
        af = all_feat_stack.reshape(depth, b, v, lp1, -1)
        all1 = [af[i, :, 0, :-1] for i in range(depth)]
        all2 = [af[i, :, 1, :-1] for i in range(depth)]
        return BackboneOutput(
            feat1=strip(feat1),
            feat2=strip(feat2),
            all_feat1=all1,
            all_feat2=all2,
            dec1=[strip(t) for t in dec1],
            dec2=[strip(t) for t in dec2],
            shape=(h, w),
        )


class CroCoEncoderOnly(_CroCoBase):
    """Encoder-only backbone (reference backbone_croco.py:593-838): the
    shared ViT encoder over both views with no cross-view decoder and no
    intrinsic token — used for 2D segmentation pretraining setups."""

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(
            patch_size=c.patch_size, embed_dim=c.enc_embed_dim, dtype=self.dtype
        )
        self.enc_blocks = nn.scan(
            _EncBlockScan,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.enc_depth,
            in_axes=nn.broadcast,
        )(num_heads=c.enc_num_heads, rope_base=c.rope_base, dtype=self.dtype, name="enc_blocks")
        self.enc_norm = LayerNorm(name="enc_norm")

    def __call__(self, images: jax.Array) -> BackboneOutput:
        """images [B, 2, H, W, 3]. No intrinsic token (reference :674-693
        leaves intrinsics_embed None)."""
        b, v, h, w, _ = images.shape
        x, pos = self.patch_embed(images.reshape(b * v, h, w, 3))
        x, all_feat_stack = self.enc_blocks(x, pos)
        feat = self.enc_norm(x)
        l = feat.shape[1]
        feat = feat.reshape(b, v, l, -1)
        depth = self.cfg.enc_depth
        af = all_feat_stack.reshape(depth, b, v, l, -1)
        return BackboneOutput(
            feat1=feat[:, 0],
            feat2=feat[:, 1],
            all_feat1=[af[i, :, 0] for i in range(depth)],
            all_feat2=[af[i, :, 1] for i in range(depth)],
            dec1=[],
            dec2=[],
            shape=(h, w),
        )


class AsymmetricCroCoMulti(_CroCoBase):
    """Multi-view backbone (reference backbone_croco.py:350-590)."""

    def setup(self):
        self._setup_common(_MultiDecPairScan)

    def __call__(self, images: jax.Array, intrinsics: jax.Array) -> MultiViewBackboneOutput:
        """images [B, V, H, W, 3]; intrinsics [B, V, 3, 3]."""
        b, v, h, w, _ = images.shape
        feat, pos, all_feat_stack = self._encode_flat(
            images.reshape(b * v, h, w, 3), intrinsics.reshape(b * v, 3, 3)
        )
        lp1 = feat.shape[1]
        feat_bv = feat.reshape(b, v, lp1, -1)
        pos_bv = pos.reshape(b, v, lp1, 2)

        f = self.decoder_embed(feat_bv)
        bank_pos = pos_bv.reshape(b, v * lp1, 2)
        key_view = jax.lax.broadcasted_iota(jnp.int32, (1, v * lp1), 1) // lp1
        # view-0 queries: exclude view-0 keys
        mask1 = (key_view != 0)[:, None, :]
        # views 1..V-1 queries: exclude own view's keys
        q_view = jax.lax.broadcasted_iota(jnp.int32, (1, (v - 1) * lp1), 1) // lp1 + 1
        mask2 = q_view[:, :, None] != key_view[:, None, :]

        _, dec_stack = self.dec_pairs(f, pos_bv, bank_pos, mask1, mask2)
        dec_feat = [feat_bv] + [dec_stack[i] for i in range(self.cfg.dec_depth)]
        dec_feat[-1] = self.dec_norm(dec_feat[-1])

        strip = lambda t: t[..., :-1, :]
        depth = self.cfg.enc_depth
        af = all_feat_stack.reshape(depth, b, v, lp1, -1)
        all_feat = [af[i, :, :, :-1] for i in range(depth)]
        return MultiViewBackboneOutput(
            feat=strip(feat_bv),
            all_feat=all_feat,
            dec_feat=[strip(t) for t in dec_feat],
            shape=(h, w),
        )
