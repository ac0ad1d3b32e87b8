"""Labeled overlay / jet-depth visualizer extras (VERDICT round-1 item #9;
reference src/visualizer.py:276-330 recon grids, :556-712 labeled masks)."""

import numpy as np
from PIL import Image

from siu3r_tpu.config import VisualizerCfg
from siu3r_tpu.utils.visualize import (
    colorize_depth_jet,
    labeled_gt_overlay,
    labeled_instance_overlay,
)
from siu3r_tpu.visualizer import Visualizer


def _scene(n=2, h=64, w=64):
    rng = np.random.RandomState(0)
    imgs = rng.rand(n, h, w, 3).astype(np.float32)
    seg = np.zeros((n, h, w), int)
    seg[:, 8:30, 8:30] = 1
    seg[:, 34:60, 34:60] = 2
    infos = [
        {"id": 1, "label_id": 4, "was_fused": False, "score": 0.91},
        {"id": 2, "label_id": 7, "was_fused": False, "score": 0.55},
    ]
    return imgs, seg, infos


def test_labeled_instance_overlay_draws():
    imgs, seg, infos = _scene()
    out = labeled_instance_overlay(imgs, seg, infos, alpha=0.5)
    n, h, w, _ = imgs.shape
    assert out.shape == (h, n * w, 3) and out.dtype == np.uint8
    base = (imgs[0] * 255).astype(np.uint8)
    # the segment interior is blended away from the raw image ...
    assert not np.array_equal(out[10:28, 10:28], base[10:28, 10:28])
    # ... the background is untouched
    assert np.array_equal(out[:6, :6], base[:6, :6])
    # white contours appear somewhere on the boundary ring (alpha-blended:
    # >= 0.5*255 in every channel simultaneously)
    assert (out[7:32, 7:32] >= 127).all(axis=-1).any()


def test_labeled_gt_overlay_draws():
    imgs, seg, _ = _scene()
    masks = np.stack([(seg == 1), (seg == 2)]).astype(np.float32)  # [O,N,H,W]
    classes = np.array([4, 7])
    valid = np.array([True, False])
    out = labeled_gt_overlay(imgs, masks, classes, valid, alpha=0.5)
    n, h, w, _ = imgs.shape
    assert out.shape == (h, n * w, 3)
    base = (imgs[0] * 255).astype(np.uint8)
    assert not np.array_equal(out[10:28, 10:28], base[10:28, 10:28])
    # invalid object is NOT drawn
    assert np.array_equal(out[36:58, 36:58], base[36:58, 36:58])


def test_colorize_depth_jet_modes():
    rng = np.random.RandomState(1)
    d = rng.rand(32, 32).astype(np.float32) * 4 + 0.2
    rendered = colorize_depth_jet(d, log_scale=True)
    gt = colorize_depth_jet(d, log_scale=False)
    assert rendered.shape == (32, 32, 3) and rendered.dtype == np.uint8
    assert gt.shape == (32, 32, 3)
    # near depths map hot (inverted log scale), far depths cold
    assert not np.array_equal(rendered, gt)
    # all-zero depth does not crash
    assert colorize_depth_jet(np.zeros((8, 8)), log_scale=True).sum() == 0


def test_visualizer_writes_overlay_files(tmp_path):
    imgs, seg, infos = _scene(n=2)
    n, h, w, _ = imgs.shape
    rng = np.random.RandomState(2)
    depth = rng.rand(3, h, w).astype(np.float32) * 3 + 0.3
    render = rng.rand(3, h, w, 3).astype(np.float32)
    sem = np.where(seg > 0, seg + 4, 0)
    masks = np.stack([(seg == 1), (seg == 2)]).astype(np.float32)
    viz = Visualizer(VisualizerCfg(log_colored_depth=True))
    viz.add_scene(
        str(tmp_path), "scene0000_00", [0, 5], [0, 3, 5],
        render, render, depth, depth,
        context_sem_pred=sem, context_ins_pred=seg,
        target_sem_pred=np.concatenate([sem, sem[:1]]),
        target_ins_pred=np.concatenate([seg, seg[:1]]),
        seg_infos=infos,
        context_images=imgs,
        gt_masks=masks,
        gt_classes=np.array([4, 7]),
        gt_valid=np.array([True, True]),
    )
    viz.write_files()
    d = viz.scene_dir(str(tmp_path), "scene0000_00", [0, 5])
    assert (d / "seg_overlay_labeled.png").exists()
    assert (d / "depth_color" / "0.png").exists()
    assert (d / "depth_gt_color" / "3.png").exists()
    im = np.asarray(Image.open(d / "seg_overlay_labeled.png"))
    assert im.shape == (2 * h, 2 * w, 3)  # pred row + gt row, 2 views wide
