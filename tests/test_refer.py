"""Referring-expression (ScanRefer) path: dataset alignment, train step,
word-match loss semantics, eval metric, and the validate CLI.

Reference: scanrefer_dataset.py:82-181 (word i <-> object i),
video_seg_decoder.py:573-594 (refer_seg_forward word-match CE),
:2257-2477 (6 lang cross-attn layers)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def fake_refer_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("scanrefer")
    rng = np.random.RandomState(0)
    n_frames, h, w = 14, 32, 32
    for split in ("train", "val"):
        scan = root / split / "scene0000_00"
        for sub in ("color", "depth", "panoptic"):
            os.makedirs(scan / sub)
        np.savetxt(
            scan / "intrinsic.txt",
            np.array([[40.0, 0, 16], [0, 40, 16], [0, 0, 1]]),
        )
        for i in range(n_frames):
            Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
                scan / "color" / f"{i}.jpg"
            )
            Image.fromarray(
                (rng.rand(h, w) * 4000).astype(np.int32), mode="I"
            ).save(scan / "depth" / f"{i}.png")
            # wall (1*1000+0) left, chair instance (5*1000+7) right,
            # table instance (6*1000+9) bottom-left corner
            seg = np.full((h, w), 1000, np.int64)
            seg[:, w // 2:] = 5 * 1000 + 7
            seg[h // 2:, : w // 4] = 6 * 1000 + 9
            rgb = np.stack(
                [seg % 256, (seg // 256) % 256, seg // 65536], -1
            ).astype(np.uint8)
            Image.fromarray(rgb).save(scan / "panoptic" / f"{i}.png")
    refer = {
        "scene0000_00": {
            "frame2object": {str(i): [7, 9] for i in range(n_frames)},
            "objects": {
                "7": {
                    "panoptic_label_id": 5,
                    "text": ["the chair on the right"],
                    "text_token": [[11, 23, 42, 7]],
                },
                "9": {
                    "panoptic_label_id": 6,
                    "text": ["a small table", "the table in the corner"],
                    "text_token": [[3, 14], [3, 14, 15, 9, 2]],
                },
            },
        }
    }
    for split in ("train", "val"):
        with open(root / f"{split}_refer_seg_data.json", "w") as f:
            json.dump(refer, f)
    with open(root / "val_refer_pair.json", "w") as f:
        json.dump(
            [
                {
                    "scan": "scene0000_00",
                    "context_views_id": [0, 10],
                    "context_objects": [7, 9],
                }
            ],
            f,
        )
    return str(root)


def refer_cfg():
    from tests.test_train import tiny_root_cfg

    cfg = tiny_root_cfg()
    cfg.pipeline.model.mask2former.train_refer_segmentation = True
    cfg.pipeline.model.mask2former.text_vocab_size = 64
    return cfg


def refer_batch(b=2, v=2, o=3, t=5, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    intr = np.array([[1.2, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32)
    return {
        "context_views_images": jnp.asarray(rng.rand(b, v, h, w, 3), jnp.float32),
        "context_views_intrinsics": jnp.asarray(
            np.broadcast_to(intr, (b, v, 3, 3)).copy()
        ),
        "gt_masks": jnp.asarray((rng.rand(b, o, v, h, w) > 0.7).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.randint(0, 5, (b, o)), jnp.int32),
        "gt_valid": jnp.asarray(
            np.broadcast_to(np.arange(o)[None] < 2, (b, o)).copy()
        ),
        "text_token": jnp.asarray(rng.randint(1, 60, (b, o, t)), jnp.int32),
    }


def test_scanrefer_dataset_word_object_alignment(fake_refer_root):
    from siu3r_tpu.data import ScanReferDataset

    ds = ScanReferDataset(fake_refer_root, train=False, max_objects=4,
                          image_size=32)
    item = ds[0]
    assert item["gt_valid"][:2].all() and not item["gt_valid"][2:].any()
    assert item["text_token"].shape == (4, 32)
    # word i <-> object i: object 7 is the right half, object 9 bottom-left
    m7 = item["gt_masks"][0]
    assert m7[:, :, 16:].all() and not m7[:, :16, :16].any()
    m9 = item["gt_masks"][1]
    assert m9[:, 16:, :8].all()
    assert item["gt_classes"][0] == 4 and item["gt_classes"][1] == 5
    # val picks the FIRST text deterministically
    assert item["text_token"][1, :2].tolist() == [3, 14]

    ds_train = ScanReferDataset(fake_refer_root, train=True, max_objects=4,
                                image_size=32)
    item = ds_train[0]
    assert item["gt_valid"].sum() == 2
    assert item["context_views_images"].shape[0] == 2


def test_refer_word_match_loss_matches_torch():
    """Loss semantics vs the reference: F.cross_entropy per item (mean over
    words) accumulated with += over the batch."""
    import torch

    from siu3r_tpu.train.losses import refer_word_match_loss

    rng = np.random.RandomState(1)
    b, w, q = 3, 4, 6
    logits = rng.randn(b, w, q).astype(np.float32)
    assignment = rng.randint(0, q, (b, w)).astype(np.int32)
    valid = np.ones((b, w), bool)
    ours = float(
        refer_word_match_loss(
            jnp.asarray(logits), jnp.asarray(assignment), jnp.asarray(valid)
        )
    )
    expected = 0.0
    for i in range(b):
        expected += float(
            torch.nn.functional.cross_entropy(
                torch.tensor(logits[i]), torch.tensor(assignment[i]).long()
            )
        )
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


@pytest.mark.slow  # compiles a full train step
def test_refer_train_step_updates_lang_params():
    from siu3r_tpu.pipeline import Pipeline

    cfg = refer_cfg()
    pipe = Pipeline(cfg, steps_per_epoch=10, lpips_enabled=False)
    batch = refer_batch()
    state = pipe.init_state(jax.random.PRNGKey(0), batch)
    assert "text_embed" in state.params, "text embedder params missing"
    assert any(
        k.startswith("lang_") for k in state.params["mask2former"]
    ), "lang cross-attn params missing"
    new_state, losses = pipe.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["word_match"]))
    assert np.isfinite(float(losses["total"]))
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(moved["text_embed"])) > 0.0
    lang_moved = max(
        max(jax.tree.leaves(v))
        for k, v in moved["mask2former"].items()
        if k.startswith("lang_")
    )
    assert lang_moved > 0.0


def test_referred_mask_iou_exact():
    from siu3r_tpu.eval.metrics import referred_mask_iou

    pred = np.zeros((2, 1, 4, 4), bool)
    gt = np.zeros((2, 1, 4, 4), np.float32)
    pred[0, 0, :2] = True   # 8 px
    gt[0, 0, :2, :2] = 1.0  # 4 px, all inside pred -> IoU 0.5
    pred[1, 0] = True
    gt[1, 0] = 1.0          # IoU 1.0
    mean, per = referred_mask_iou(pred, gt, np.array([True, True]))
    np.testing.assert_allclose(per, [0.5, 1.0])
    np.testing.assert_allclose(mean, 0.75)


@pytest.mark.slow  # compiles a full eval step
def test_refer_eval_step_shapes():
    from siu3r_tpu.pipeline import Pipeline

    cfg = refer_cfg()
    pipe = Pipeline(cfg, steps_per_epoch=10, lpips_enabled=False)
    batch = refer_batch(b=1)
    state = pipe.init_state(jax.random.PRNGKey(0), batch)
    pred_masks, word_logits = pipe.refer_eval_step(state, batch)
    assert pred_masks.shape == (1, 3, 2, 32, 32)
    assert pred_masks.dtype == bool
    assert word_logits.shape == (1, 3, cfg.pipeline.model.mask2former.num_queries)


@pytest.mark.slow
def test_validate_refer_cli_smoke(fake_refer_root):
    from tests.test_cli_smoke import TINY_OVERRIDES

    from siu3r_tpu.cli.validate_refer import main

    result = main(
        [
            "--config", os.devnull,
            "--limit", "1",
            f"datamodule.dataset_cfg.root={fake_refer_root}",
            "datamodule.dataset_cfg.max_objects=4",
            *TINY_OVERRIDES,
            "pipeline.model.mask2former.train_refer_segmentation=true",
            "pipeline.model.mask2former.text_vocab_size=64",
        ]
    )
    assert result["num_referred"] == 2
    assert 0.0 <= result["refer_miou"] <= 1.0
