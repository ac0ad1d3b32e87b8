"""LPIPS perceptual loss (VGG16 backbone), used by the render loss
(reference pipeline.py:35, :348-363 — torchmetrics LPIPS('vgg',
normalize=True) at half resolution).

The VGG16 and LPIPS linear-head weights are loadable from a torch state_dict
file (``lpips_vgg.pth`` holding {'vgg': vgg16_features_state, 'lins':
lpips_lin_state}) — this environment has no network access and no torchvision
weight cache, so absent a weights file the module runs with a fixed-seed
random VGG (a meaningful perceptual-style loss signal, but NOT numerically
LPIPS; swap in real weights for strict training parity)."""

from __future__ import annotations

import functools
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# lpips package ScalingLayer constants (inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 feature config: (out_channels, n_convs) per block
_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


def init_lpips_params(weights_path: Optional[str] = None, seed: int = 0):
    """Build the parameter pytree: conv kernels/biases + per-layer linear
    head weights."""
    if weights_path is not None and Path(weights_path).exists():
        import torch

        blob = torch.load(weights_path, map_location="cpu", weights_only=False)
        vgg_state = {k: v.numpy() for k, v in blob["vgg"].items()}
        lin_state = {k: v.numpy() for k, v in blob["lins"].items()}
        convs = []
        # torchvision vgg16.features conv indices
        conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        for i in conv_ids:
            w = vgg_state[f"{i}.weight"].transpose(2, 3, 1, 0)
            b = vgg_state[f"{i}.bias"]
            convs.append({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
        lins = [
            jnp.asarray(np.maximum(lin_state[f"lin{i}.model.1.weight"], 0))[
                :, :, 0, 0
            ].T
            for i in range(5)
        ]
        return {"convs": convs, "lins": lins, "pretrained": True}

    import logging

    logging.getLogger("siu3r_tpu").warning(
        "LPIPS: no pretrained VGG16 weights found (weights_path=%s) - "
        "falling back to a fixed-seed RANDOM VGG. The lpips loss/metric is a "
        "perceptual-style signal but NOT numerically comparable to the "
        "reference's torchvision LPIPS; results.json will carry "
        "lpips_pretrained=false.", weights_path,
    )
    rng = np.random.RandomState(seed)
    convs = []
    in_ch = 3
    for out_ch, n in _BLOCKS:
        for _ in range(n):
            fan_in = in_ch * 9
            w = rng.normal(0, np.sqrt(2.0 / fan_in), (3, 3, in_ch, out_ch))
            convs.append(
                {
                    "kernel": jnp.asarray(w, jnp.float32),
                    "bias": jnp.zeros((out_ch,), jnp.float32),
                }
            )
            in_ch = out_ch
    lins = [
        jnp.full((ch, 1), 1.0 / ch, jnp.float32) for ch, _ in _BLOCKS
    ]
    return {"convs": convs, "lins": lins, "pretrained": False}


@functools.partial(jax.checkpoint, prevent_cse=False)
def _vgg_features(params, x: jax.Array) -> List[jax.Array]:
    """x [B, H, W, 3] in [-1, 1] -> 5 block outputs (post-ReLU)."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    ci = 0
    for bi, (out_ch, n) in enumerate(_BLOCKS):
        for _ in range(n):
            p = params["convs"][ci]
            x = jax.lax.conv_general_dilated(
                x,
                p["kernel"],
                (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"]
            x = jax.nn.relu(x)
            ci += 1
        feats.append(x)
        if bi < len(_BLOCKS) - 1:
            b, h, w, c = x.shape
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips(params, img0: jax.Array, img1: jax.Array, normalize: bool = True) -> jax.Array:
    """img0/img1 [B, H, W, 3]; normalize=True means inputs are in [0, 1]
    (torchmetrics LPIPS(normalize=True) semantics). Returns scalar mean."""
    if normalize:
        img0 = 2 * img0 - 1
        img1 = 2 * img1 - 1
    f0 = _vgg_features(params, img0)
    f1 = _vgg_features(params, img1)
    total = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2  # [B, H, W, C]
        val = d @ lin  # [B, H, W, 1]
        total = total + val.mean(axis=(1, 2, 3))
    return total.mean()
