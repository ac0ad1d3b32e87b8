"""DPT prediction heads (pts3d regression + Gaussian-parameter head).

Structure follows the reference DPT stack:
  * reassemble: per-hook 1x1 conv to pyramid dims + up/down sampling
    (reference src/models/heads/dpt_block.py:399-488, with the duplicate
    act_X_postprocess weights removed as in dpt_head.py:28-34);
  * 4 RefineNet-style fusion blocks (dpt_block.py:84-252);
  * regression head for pts3d (out 3ch, 2x upsample inside head) or
    ``gs_params`` head (out 83ch for sh4) with a direct-from-RGB skip conv
    added after upsample (dpt_gs_head.py:99-171).

Hooks are [0, dec_depth/2, 3*dec_depth/4, dec_depth] into the 13-entry
decoder-output list; token dims [enc_dim, dec_dim, dec_dim, dec_dim]
(dpt_head.py:123-148). All convs NHWC.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from siu3r_tpu.models.layers import ConvTranspose2dTorch, bilinear_resize_torch


class ResidualConvUnit(nn.Module):
    """ReLU-Conv3x3-ReLU-Conv3x3 + skip (reference dpt_block.py:84-147,
    bn=False so convs carry bias)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """RefineNet fusion (reference dpt_block.py:150-237): optional skip via
    resConfUnit1, resConfUnit2, 2x bilinear upsample (align_corners=True,
    skippable for the multi-resolution head), 1x1 out_conv."""

    features: int
    skip_upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip: Optional[jax.Array] = None):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, dtype=self.dtype, name="resConfUnit1")(skip)
        out = ResidualConvUnit(self.features, dtype=self.dtype, name="resConfUnit2")(out)
        if not self.skip_upsample:
            h, w = out.shape[1], out.shape[2]
            out = bilinear_resize_torch(out, (2 * h, 2 * w), align_corners=True)
        out = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(out)
        return out


class DPTHead(nn.Module):
    """PixelwiseTaskWithDPT equivalent.

    __call__(tokens: 4 hooked token maps [B, N, C_i], image [B,H,W,3] or
    None, image_size) -> [B, H, W, num_channels] raw output (NHWC; reference
    returns NCHW).
    """

    num_channels: int
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    last_dim: int = 128
    head_type: str = "regression"  # "regression" | "gs_params"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hooked_tokens: List[jax.Array],
        image: Optional[jax.Array],
        image_size: Tuple[int, int],
        patch_size: int = 16,
    ) -> jax.Array:
        h, w = image_size
        nh, nw = h // patch_size, w // patch_size
        layers = []
        for idx, tok in enumerate(hooked_tokens):
            b, n, c = tok.shape
            x = tok.reshape(b, nh, nw, c)
            x = nn.Conv(
                self.layer_dims[idx], (1, 1), dtype=self.dtype, name=f"act_{idx}_conv"
            )(x)
            if idx == 0:
                x = ConvTranspose2dTorch(
                    self.layer_dims[0], 4, 4, dtype=self.dtype, name="act_0_up"
                )(x)
            elif idx == 1:
                x = ConvTranspose2dTorch(
                    self.layer_dims[1], 2, 2, dtype=self.dtype, name="act_1_up"
                )(x)
            elif idx == 3:
                x = nn.Conv(
                    self.layer_dims[3],
                    (3, 3),
                    strides=(2, 2),
                    padding=1,
                    dtype=self.dtype,
                    name="act_3_down",
                )(x)
            x = nn.Conv(
                self.feature_dim,
                (3, 3),
                padding=1,
                use_bias=False,
                dtype=self.dtype,
                name=f"layer{idx + 1}_rn",
            )(x)
            layers.append(x)

        path4 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet4")(layers[3])
        # crop to layers[2] spatial size (reference dpt_head.py:65-67)
        path4 = path4[:, : layers[2].shape[1], : layers[2].shape[2]]
        path3 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet3")(path4, layers[2])
        path2 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet2")(path3, layers[1])
        path1 = FeatureFusionBlock(self.feature_dim, dtype=self.dtype, name="refinenet1")(path2, layers[0])

        if self.head_type == "regression":
            # reference dpt_block.py:355-369
            x = nn.Conv(self.feature_dim // 2, (3, 3), padding=1, dtype=self.dtype, name="head_conv1")(path1)
            x = bilinear_resize_torch(x, (2 * x.shape[1], 2 * x.shape[2]), align_corners=True)
            x = nn.Conv(self.last_dim, (3, 3), padding=1, dtype=self.dtype, name="head_conv2")(x)
            x = nn.relu(x)
            x = nn.Conv(self.num_channels, (1, 1), dtype=self.dtype, name="head_conv3")(x)
            return x
        elif self.head_type == "gs_params":
            # reference dpt_gs_head.py:105-171: upsample, add RGB-skip conv,
            # then conv3x3(no bias)+relu+conv1x1
            x = bilinear_resize_torch(
                path1, (2 * path1.shape[1], 2 * path1.shape[2]), align_corners=True
            )
            direct = nn.Conv(self.feature_dim, (7, 7), padding=3, dtype=self.dtype, name="input_merger")(image)
            direct = nn.relu(direct)
            x = x + direct
            x = nn.Conv(self.feature_dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="head_conv1")(x)
            x = nn.relu(x)
            x = nn.Conv(self.num_channels, (1, 1), dtype=self.dtype, name="head_conv2")(x)
            return x
        raise ValueError(self.head_type)


class MultiResDPTGSHead(nn.Module):
    """Multi-resolution Gaussian-parameter head (reference
    src/models/heads/multi_res_dpt_gs_head.py): the DPT trunk with
    skip-upsample fusion emits raw GS parameters at 1/4, 1/8, 1/16, 1/32,
    each with its own downsampled-RGB skip conv and prediction head. Kept
    for head_factory parity (not wired into the flagship model, reference
    heads/__init__.py:33-39)."""

    num_channels: int
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hooked_tokens: List[jax.Array],
        image: jax.Array,
        image_size: Tuple[int, int],
        patch_size: int = 16,
    ) -> List[jax.Array]:
        h, w = image_size
        nh, nw = h // patch_size, w // patch_size
        layers = []
        for idx, tok in enumerate(hooked_tokens):
            b, n, c = tok.shape
            x = tok.reshape(b, nh, nw, c)
            x = nn.Conv(self.layer_dims[idx], (1, 1), dtype=self.dtype, name=f"act_{idx}_conv")(x)
            if idx == 0:
                x = ConvTranspose2dTorch(self.layer_dims[0], 4, 4, dtype=self.dtype, name="act_0_up")(x)
            elif idx == 1:
                x = ConvTranspose2dTorch(self.layer_dims[1], 2, 2, dtype=self.dtype, name="act_1_up")(x)
            elif idx == 3:
                x = nn.Conv(self.layer_dims[3], (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="act_3_down")(x)
            x = nn.Conv(self.feature_dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name=f"layer{idx + 1}_rn")(x)
            layers.append(x)

        paths = []
        out = FeatureFusionBlock(self.feature_dim, skip_upsample=True, dtype=self.dtype, name="refinenet4")(layers[3])
        paths.append(out)  # 1/32
        for i, name in ((2, "refinenet3"), (1, "refinenet2"), (0, "refinenet1")):
            up = bilinear_resize_torch(
                out, (layers[i].shape[1], layers[i].shape[2]), align_corners=True
            )
            out = FeatureFusionBlock(
                self.feature_dim, skip_upsample=True, dtype=self.dtype, name=name
            )(up, layers[i])
            paths.append(out)
        # paths: [1/32, 1/16, 1/8, 1/4]

        outs = []
        for path, ds in zip(reversed(paths), (4, 8, 16, 32)):
            img_ds = bilinear_resize_torch(image, (h // ds, w // ds), align_corners=True)
            skip = nn.relu(
                nn.Conv(self.feature_dim, (7, 7), padding=3, dtype=self.dtype, name=f"input_merger_ds{ds}")(img_ds)
            )
            x = path + skip
            x = nn.Conv(self.feature_dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name=f"head_ds{ds}_conv1")(x)
            x = nn.relu(x)
            x = nn.Conv(self.num_channels, (1, 1), dtype=self.dtype, name=f"head_ds{ds}_conv2")(x)
            outs.append(x)
        return outs  # raw GS params at 1/4, 1/8, 1/16, 1/32


def postprocess_pts3d(raw: jax.Array) -> jax.Array:
    """depth_mode ('exp', -inf, inf): pts = dir(xyz) * expm1(||xyz||)
    (reference heads/postprocess.py:22-61; mode set at model.py:49)."""
    d = jnp.linalg.norm(raw, axis=-1, keepdims=True)
    xyz = raw / jnp.clip(d, 1e-8)
    return xyz * jnp.expm1(d)


def dpt_hooks(dec_depth: int) -> list[int]:
    """[0, l/2, 3l/4, l] into the 13-entry decoder list
    (reference dpt_head.py:142)."""
    return [0, dec_depth * 2 // 4, dec_depth * 3 // 4, dec_depth]
