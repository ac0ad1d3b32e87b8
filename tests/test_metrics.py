"""Metric sanity tests with analytic cases + visualizer->evaluator file
round-trip."""

import numpy as np
import pytest

from siu3r_tpu.config import EvaluatorCfg, VisualizerCfg
from siu3r_tpu.eval import metrics as M
from siu3r_tpu.eval.evaluator import Evaluator
from siu3r_tpu.visualizer import Visualizer, pack_segment_rgb


def test_psnr_analytic():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert abs(M.psnr(a, b) - 20.0) < 1e-6  # 10*log10(1/0.01)


def test_ssim_identical():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3)
    assert M.ssim(img, img) > 0.9999
    assert M.ssim(img, 1 - img) < 0.5


def test_miou():
    miou = M.MeanIoU(4)
    pred = np.array([[1, 1, 2], [2, 3, 0]])
    gt = np.array([[1, 2, 2], [2, 3, 0]])
    miou.update(pred, gt)
    per = miou.compute()
    np.testing.assert_allclose(per, [1 / 2, 2 / 3, 1.0])


def test_pq_perfect_and_miss():
    pq = M.PanopticQuality(things=[2], stuffs=[1])
    sem = np.array([[1, 1, 2, 2], [1, 1, 2, 2]])
    ins = np.array([[0, 0, 5, 5], [0, 0, 5, 5]])
    pred = np.stack([sem, ins], -1)
    pq.update(pred, pred)
    np.testing.assert_allclose(pq.compute(), [1.0, 1.0])

    pq2 = M.PanopticQuality(things=[2], stuffs=[1])
    wrong = np.stack([np.where(sem == 2, 1, 1), np.zeros_like(ins)], -1)
    pq2.update(wrong, pred)
    vals = pq2.compute()
    assert vals.max() < 1.0  # stuff overlaps partially, thing missed


def test_map_perfect():
    m = M.MeanAveragePrecision()
    masks = np.zeros((2, 16, 16), bool)
    masks[0, :8] = True
    masks[1, 8:] = True
    labels = np.array([0, 1])
    m.update(
        {"masks": masks, "labels": labels, "scores": np.array([0.9, 0.8])},
        {"masks": masks, "labels": labels},
    )
    res = m.compute()
    assert abs(res["map"] - 1.0) < 1e-6


def test_map_half():
    m = M.MeanAveragePrecision()
    gt = np.zeros((1, 16, 16), bool)
    gt[0, :8] = True
    pred = np.zeros((2, 16, 16), bool)
    pred[0, :8] = True  # perfect match
    pred[1, 12:] = True  # false positive
    m.update(
        {"masks": pred, "labels": np.array([0, 0]), "scores": np.array([0.9, 0.95])},
        {"masks": gt, "labels": np.array([0])},
    )
    res = m.compute()
    # FP ranked first: precision at recall 1 is 0.5
    assert 0.45 < res["map_50"] < 0.55


def test_depth_errors_scale_invariant():
    rng = np.random.RandomState(0)
    gt = rng.rand(32, 32) * 4 + 0.5
    pred = gt * 3.0 + 1.0  # recoverable by scale/shift
    absrel, rmse = M.depth_errors(pred, gt)
    assert absrel < 1e-6 and rmse < 1e-6


def test_visualizer_evaluator_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    h, w, n, v = 32, 32, 3, 2
    render = rng.rand(n, h, w, 3).astype(np.float32)
    target = render + rng.randn(n, h, w, 3).astype(np.float32) * 0.01
    depth = rng.rand(n, h, w).astype(np.float32) * 4 + 0.5
    # structured segments: stuff (wall=1) top, two thing instances below
    sem = np.ones((n, h, w), int)
    sem[:, 16:, :16] = 4
    sem[:, 16:, 16:] = 5
    ins = np.zeros((n, h, w), int)
    ins[:, :16] = 1
    ins[:, 16:, :16] = 2
    ins[:, 16:, 16:] = 3
    viz = Visualizer(VisualizerCfg())
    viz.add_scene(
        str(tmp_path), "scene0000_00", [0, 5], [0, 3, 5],
        render, np.clip(target, 0, 1), depth, depth,
        context_sem_pred=sem[:v], context_ins_pred=ins[:v],
        context_sem_gt=sem[:v], context_ins_gt=ins[:v],
        target_sem_pred=sem, target_ins_pred=ins,
        target_sem_gt=sem, target_ins_gt=ins,
    )
    viz.write_files()
    cfg = EvaluatorCfg(
        id2label={i: str(i) for i in range(1, 21)},
        stuffs=[0, 1],
        things=list(range(2, 20)),
        eval_image_quality=True,
    )
    ev = Evaluator(cfg)
    result = ev.evaluate(str(tmp_path))
    assert result["psnr"] > 30  # near-identical images
    assert result["context_miou"] == 1.0
    assert result["target_miou"] == 1.0
    assert result["context_pq"] == 1.0
    assert result["absrel"] < 1e-3
    assert result["target_map"]["map"] == 1.0
    assert (tmp_path / "results.json").exists()


def test_pack_unpack_segments():
    sem = np.array([[3, 0], [20, 7]])
    ins = np.array([[12, 0], [999, 1]])
    rgb = pack_segment_rgb(sem, ins)
    seg = rgb[..., 0].astype(int) + rgb[..., 1].astype(int) * 256 + rgb[..., 2].astype(int) * 65536
    np.testing.assert_array_equal(seg // 1000, sem)
    np.testing.assert_array_equal(seg % 1000, ins)
