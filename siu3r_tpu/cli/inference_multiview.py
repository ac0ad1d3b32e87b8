"""Multi-view inference CLI (reference inference_multiview.py parity).

Usage:
    python -m siu3r_tpu.cli.inference_multiview --image_dir imgs/ \
        [--model_path siu3r_4view.ckpt] [--output_path infer_outputs] \
        [--cx 128 --cy 128 --fx 318 --fy 318]

Loads every image in ``image_dir`` (sorted), runs the multi-view model
(AsymmetricCroCoMulti backbone with the shared-KV-bank decoder), and exports
``output.ply`` with fused per-view Gaussians + lifted segmentation.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from siu3r_tpu.cli.inference import load_model_variables, preprocess_image

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--output_path", type=str, default="infer_outputs")
    parser.add_argument("--cx", type=float, default=128.0)
    parser.add_argument("--cy", type=float, default=128.0)
    parser.add_argument("--fx", type=float, default=318.0)
    parser.add_argument("--fy", type=float, default=318.0)
    parser.add_argument("--save_sh_dc_only", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from siu3r_tpu.config import RootCfg, bind_scannet_classes
    from siu3r_tpu.io import export_ply

    paths = sorted(
        p for p in Path(args.image_dir).iterdir() if p.suffix.lower() in IMAGE_EXTS
    )
    if len(paths) < 2:
        raise SystemExit(f"need >= 2 images in {args.image_dir}, got {len(paths)}")
    print(f"[siu3r_tpu] {len(paths)} views from {args.image_dir}")

    images = np.stack([preprocess_image(p) for p in paths])[None]  # [1,V,H,W,3]
    v = images.shape[1]
    intr = np.array(
        [
            [args.fx / 256.0, 0, args.cx / 256.0],
            [0, args.fy / 256.0, args.cy / 256.0],
            [0, 0, 1],
        ],
        dtype=np.float32,
    )[None, None].repeat(v, 1)

    cfg = bind_scannet_classes(RootCfg()).pipeline.model
    cfg.num_views = v
    model, variables = load_model_variables(args.model_path, cfg)

    t0 = time.time()
    out = jax.jit(
        lambda vs, im, k: model.apply(vs, im, k, enable_query_class_logit_lift=True)
    )(variables, jnp.asarray(images), jnp.asarray(intr))
    g = out.gaussians.to_host()
    print(
        f"[siu3r_tpu] forward in {time.time() - t0:.1f}s "
        f"({g.means.shape[1]} fused gaussians from {v} views)"
    )

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    export_ply(
        means=g.means[0],
        scales=g.scales[0],
        rotations=g.rotations[0],
        harmonics=g.harmonics[0],
        opacities=g.opacities[0],
        semantic_labels=g.semantic_labels[0],
        instance_labels=g.instance_labels[0],
        seg_query_class_logits=g.seg_query_class_logits[0],
        path=out_dir / "output.ply",
        save_sh_dc_only=args.save_sh_dc_only,
    )
    print(f"[siu3r_tpu] wrote {out_dir / 'output.ply'}")


if __name__ == "__main__":
    main()
