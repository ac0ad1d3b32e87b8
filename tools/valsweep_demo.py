"""Config-5 val sweep demonstrated AS A SWEEP (VERDICT r4 Next #6).

Generates N synthetic 256^2 scenes in the reference ScanNet on-disk layout
(color/depth/extrinsic/panoptic + val_pair.json — the format
src/data/components/scannet_dataset.py:60-170 reads), then drives the REAL
``siu3r_tpu.cli.validate`` end to end: eval step (forward + fused color+qc
render + lift) -> Visualizer per-scene protocol writes -> file-driven
Evaluator (PSNR/SSIM/LPIPS + mIoU/PQ/mAP + depth). Reference protocol:
src/pipeline.py:289-326.

Modes:
  python tools/valsweep_demo.py --scenes 20              # one real chip, B=1
  python tools/valsweep_demo.py --dryrun8 --scenes 16    # 8 virtual CPU
      devices, tiny shapes, >=2 timed SHARDED eval steps (DP overhead as a
      number rather than a barrier-once smoke)

Prints a one-line JSON summary with sustained scenes/sec (post-compile).
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_scenes(root: Path, n_scenes: int, size: int, n_frames: int = 12):
    """Synthetic scans in the reference ScanNet layout (same fields the
    dataset reads; depth in mm PNGs, panoptic RGB-packed sem*1000+ins)."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    pairs = []
    for s in range(n_scenes):
        scan = root / "val" / f"scene{s:04d}_00"
        for sub in ("color", "depth", "extrinsic", "panoptic"):
            os.makedirs(scan / sub, exist_ok=True)
        f = 1.2 * size
        np.savetxt(
            scan / "intrinsic.txt",
            np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1.0]]),
        )
        np.save(scan / "iou.npy", np.clip(rng.rand(64, 64) * 0.5 + 0.3, 0, 1))
        # smooth-ish random scene so PSNR/depth metrics are non-degenerate
        base = rng.rand(size // 8 + 1, size // 8 + 1, 3)
        for i in range(n_frames):
            img = np.kron(base, np.ones((8, 8, 1)))[:size, :size]
            img = np.clip(img + 0.05 * rng.randn(size, size, 3), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                scan / "color" / f"{i}.jpg"
            )
            depth = (rng.rand(size, size) * 3000 + 500).astype(np.int32)
            Image.fromarray(depth, mode="I").save(scan / "depth" / f"{i}.png")
            ext = np.eye(4)
            ext[0, 3] = 0.05 * i
            np.savetxt(scan / "extrinsic" / f"{i}.txt", ext)
            seg = np.full((size, size), 1000, np.int64)  # wall stuff
            seg[:, size // 2:] = 5 * 1000 + 7  # chair instance
            seg[: size // 4] = 0  # unlabeled band
            rgb = np.stack(
                [seg % 256, (seg // 256) % 256, seg // 65536], axis=-1
            ).astype(np.uint8)
            Image.fromarray(rgb).save(scan / "panoptic" / f"{i}.png")
        pairs.append(
            {
                "scan": f"scene{s:04d}_00",
                "context_ids": [0, 10],
                "target_ids": [0, 2, 4, 6, 8, 10],
            }
        )
    with open(root / "val_pair.json", "w") as fp:
        json.dump(pairs, fp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=20)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--root", type=str, default="/tmp/siu3r_valsweep")
    ap.add_argument(
        "--dryrun8", action="store_true",
        help="8 virtual CPU devices, tiny shapes, timed sharded eval steps",
    )
    args = ap.parse_args()

    if args.dryrun8:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        args.size = 64

    import jax

    if args.dryrun8:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    root = Path(args.root)
    out_dir = Path(args.root + "_out")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    make_scenes(root, args.scenes, args.size)
    print(f"[valsweep] wrote {args.scenes} scenes in {time.time()-t0:.1f}s",
          file=sys.stderr)

    from siu3r_tpu.cli import validate as validate_cli

    overrides = [
        f"datamodule.dataset_cfg.root={root}",
        f"datamodule.dataset_cfg.image_height={args.size}",
        f"datamodule.dataset_cfg.image_width={args.size}",
        f"pipeline.model.image_size=[{args.size},{args.size}]",
        "trainer.devices=8" if args.dryrun8 else "trainer.devices=1",
    ]
    if args.dryrun8:
        # tiny model (same dims as tests/test_train.py tiny_root_cfg) so the
        # 8-device CPU compile stays tractable; the point is >=2 timed
        # SHARDED steps, not model scale (MULTICHIP covers that)
        overrides += [
            "pipeline.model.croco.enc_depth=2",
            "pipeline.model.croco.dec_depth=2",
            "pipeline.model.croco.enc_embed_dim=64",
            "pipeline.model.croco.dec_embed_dim=48",
            "pipeline.model.croco.enc_num_heads=4",
            "pipeline.model.croco.dec_num_heads=4",
            "pipeline.model.mask2former.hidden_dim=32",
            "pipeline.model.mask2former.num_attention_heads=4",
            "pipeline.model.mask2former.dim_feedforward=64",
            "pipeline.model.mask2former.num_queries=8",
            "pipeline.model.mask2former.decoder_layers=2",
            "pipeline.model.mask2former.encoder_layers=1",
            "pipeline.model.mask2former.encoder_feedforward_dim=64",
            "pipeline.model.mask2former.feature_size=32",
            "pipeline.model.mask2former.mask_feature_size=32",
            "pipeline.model.mask2former.max_lift_queries=4",
            "pipeline.model.gaussian_head.sh_degree=1",
        ]
    argv = [
        "--output_path", str(out_dir),
        "--batch_size", "8" if args.dryrun8 else "1",
    ] + overrides
    t0 = time.time()
    sweep = validate_cli.main(argv)
    wall = time.time() - t0
    summary = {
        "metric": "valsweep",
        "scenes": args.scenes,
        "wall_seconds": round(wall, 1),
        "mode": "dryrun8" if args.dryrun8 else "chip",
    }
    if sweep:
        for k in ("ms_per_scene", "scenes_per_sec"):
            if k in sweep:
                summary[k] = round(sweep[k], 2)
        summary["step_seconds"] = [round(s, 3) for s in sweep["step_seconds"]]
        summary["n_scenes_written"] = sweep["n_scenes"]
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
