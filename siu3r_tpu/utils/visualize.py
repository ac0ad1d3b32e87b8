"""Visualization helpers (reference src/utils/visualize_utils.py subset +
kornia-style depth colorization used by the Visualizer).

Pure numpy — these run on the host IO path next to PNG writing.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from siu3r_tpu.utils.scannet_constant import (
    INSTANCE_COLOR_PALLETE,
    PANOPTIC_COLOR_PALLETE,
)

# perceptually ordered turbo-like stops for depth colorization
_TURBO_STOPS = np.array(
    [
        [48, 18, 59], [70, 107, 227], [40, 187, 235], [31, 233, 162],
        [127, 252, 65], [218, 220, 34], [253, 141, 12], [210, 51, 0],
        [122, 4, 3],
    ],
    np.float32,
)


def colorize_depth(
    depth: np.ndarray, d_min: Optional[float] = None, d_max: Optional[float] = None
) -> np.ndarray:
    """[H, W] metric depth -> [H, W, 3] uint8 turbo-style colormap; invalid
    (<=0) pixels black."""
    valid = depth > 0
    if d_min is None:
        d_min = float(depth[valid].min()) if valid.any() else 0.0
    if d_max is None:
        d_max = float(depth[valid].max()) if valid.any() else 1.0
    t = np.clip((depth - d_min) / max(d_max - d_min, 1e-6), 0, 1)
    pos = t * (len(_TURBO_STOPS) - 1)
    i0 = np.clip(np.floor(pos).astype(int), 0, len(_TURBO_STOPS) - 2)
    frac = (pos - i0)[..., None]
    rgb = _TURBO_STOPS[i0] * (1 - frac) + _TURBO_STOPS[i0 + 1] * frac
    rgb = np.where(valid[..., None], rgb, 0)
    return rgb.astype(np.uint8)


def _palette(max_id: int, table: Dict[int, list], seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    pal = rng.randint(30, 255, (max_id + 1, 3)).astype(np.uint8)
    for k, v in table.items():
        if k <= max_id:
            pal[k] = v
    pal[0] = 0
    return pal


def semantic_to_rgb(sem: np.ndarray) -> np.ndarray:
    """[H, W] semantic ids (0 background, 1..20 ScanNet) -> RGB uint8."""
    pal = _palette(max(20, int(sem.max(initial=0))), PANOPTIC_COLOR_PALLETE)
    return pal[np.clip(sem, 0, len(pal) - 1)]


def instance_to_rgb(ins: np.ndarray, seed: int = 0) -> np.ndarray:
    """[H, W] instance ids -> distinct random colors (0 = black)."""
    pal = _palette(max(32, int(ins.max(initial=0))), INSTANCE_COLOR_PALLETE, seed)
    return pal[np.clip(ins, 0, len(pal) - 1)]


def overlay_segmentation(
    image: np.ndarray, sem: np.ndarray, ins: Optional[np.ndarray] = None,
    alpha: float = 0.5,
) -> np.ndarray:
    """Blend a segmentation over an RGB image (reference visualizer overlay
    images, visualizer.py overlay paths; alpha from VisualizerCfg).
    image [H, W, 3] in [0, 1] or uint8."""
    img = image if image.dtype == np.uint8 else (np.clip(image, 0, 1) * 255).astype(np.uint8)
    seg_rgb = instance_to_rgb(ins) if ins is not None else semantic_to_rgb(sem)
    mask = (sem > 0)[..., None]
    blended = img * (1 - alpha) + seg_rgb * alpha
    return np.where(mask, blended, img).astype(np.uint8)


def itemize(value):
    """Tensor/array -> plain python (reference src/utils/tensor_utils.py)."""
    if hasattr(value, "tolist"):
        v = value.tolist()
        return v
    if isinstance(value, dict):
        return {k: itemize(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [itemize(v) for v in value]
    if isinstance(value, (np.floating, np.integer)):
        return value.item()
    return value
