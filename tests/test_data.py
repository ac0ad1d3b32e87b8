"""Dataset/loader tests on a synthetic on-disk scan mirroring the reference
ScanNet layout."""

import json
import os

import numpy as np
import pytest

from siu3r_tpu.data import Loader, ScanNetDataset, collate
from siu3r_tpu.data.seg_labels import decode_panoptic_png, instance_maps_to_video_masks, build_ins2sem


@pytest.fixture(scope="module")
def fake_scannet(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("scannet")
    rng = np.random.RandomState(0)
    n_frames, h, w = 16, 64, 64
    for split in ("train", "val"):
        scan = root / split / "scene0000_00"
        for sub in ("color", "depth", "extrinsic", "panoptic"):
            os.makedirs(scan / sub)
        np.savetxt(scan / "intrinsic.txt", np.array([[300.0, 0, 32], [0, 300, 32], [0, 0, 1]]))
        iou = np.clip(rng.rand(200, 200) * 0.6 + 0.2, 0, 1)
        np.save(scan / "iou.npy", iou)
        for i in range(n_frames):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(scan / "color" / f"{i}.jpg")
            depth = (rng.rand(h, w) * 4000).astype(np.int32)
            Image.fromarray(depth, mode="I").save(scan / "depth" / f"{i}.png")
            ext = np.eye(4)
            ext[0, 3] = 0.1 * i
            np.savetxt(scan / "extrinsic" / f"{i}.txt", ext)
            # panoptic: wall (1*1000+0) left, chair instance (5*1000+7) right
            seg = np.full((h, w), 1000, np.int64)
            seg[:, w // 2 :] = 5 * 1000 + 7
            rgb = np.stack(
                [seg % 256, (seg // 256) % 256, seg // 65536], axis=-1
            ).astype(np.uint8)
            Image.fromarray(rgb).save(scan / "panoptic" / f"{i}.png")
    with open(root / "val_pair.json", "w") as f:
        json.dump(
            [{"scan": "scene0000_00", "context_ids": [0, 5], "target_ids": [0, 2, 5]}],
            f,
        )
    return str(root)


def test_panoptic_decode_roundtrip():
    seg = np.array([[1000, 5007], [0, 255 + 3 * 256]])
    rgb = np.stack([seg % 256, (seg // 256) % 256, seg // 65536], -1).astype(np.uint8)
    assert (decode_panoptic_png(rgb) == seg).all()


def test_video_masks():
    ins = [np.array([[0, 7], [7, 3]]), np.array([[3, 3], [0, 0]])]
    sem = [np.array([[1, 5], [5, 2]]), np.array([[2, 2], [1, 1]])]
    ins2sem = build_ins2sem(sem, ins)
    masks, classes, valid = instance_maps_to_video_masks(ins, ins2sem, 4)
    # instances (reduced): 0 ignored; ids 3, 7 -> reduced 2, 6
    assert valid.sum() == 2
    assert set(classes[valid].tolist()) == {1, 4}  # sem 2->1, 5->4
    assert masks.shape == (4, 2, 2, 2)
    # instance 3 mask present in both frames
    oi = list(classes[valid]).index(1)
    assert masks[oi, 0].sum() == 1 and masks[oi, 1].sum() == 2


def test_train_dataset_and_loader(fake_scannet):
    ds = ScanNetDataset(fake_scannet, num_extra_target_views=1, train=True, image_size=64)
    item = ds[0]
    assert item["context_views_images"].shape == (2, 64, 64, 3)
    assert item["target_views_images"].shape[0] == 3
    assert item["gt_masks"].shape[0] == 48
    assert item["gt_valid"].sum() >= 1
    # first context pose is identity after relative_pose
    np.testing.assert_allclose(item["context_views_extrinsics"][0], np.eye(4), atol=1e-6)

    batch = collate([ds[0], ds[0]])
    assert batch["context_views_images"].shape == (2, 2, 64, 64, 3)
    assert batch["gt_classes"].shape == (2, 48)

    loader = Loader(ds, batch_size=1, num_workers=2)
    batch = next(iter(loader))
    assert batch["context_views_images"].shape == (1, 2, 64, 64, 3)


def test_val_dataset(fake_scannet):
    ds = ScanNetDataset(fake_scannet, train=False, image_size=64)
    assert len(ds) == 1
    item = ds[0]
    assert list(item["context_views_id"]) == [0, 5]
    assert list(item["target_views_id"]) == [0, 2, 5]
