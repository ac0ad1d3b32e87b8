"""Two-view inference CLI (reference inference.py parity).

Usage:
    python -m siu3r_tpu.cli.inference --model_path ... \
        --image_path1 a.jpg --image_path2 b.jpg --output_path infer_outputs \
        [--cx 128 --cy 128 --fx 318 --fy 318]

Accepts either a converted orbax checkpoint directory or the reference's
Lightning ``.ckpt`` (converted on the fly via siu3r_tpu.checkpoint). Produces
``output.ply`` with the same attribute schema as the reference
(src/utils/ply_export.py:12-97).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def preprocess_image(image_path) -> np.ndarray:
    """Shortest-side-256 LANCZOS resize + center crop to 256x256, [0, 1]
    float, HWC (reference inference.py:13-38)."""
    from PIL import Image

    image = Image.open(image_path).convert("RGB")
    w, h = image.size
    if w < h:
        new_w, new_h = 256, int(h * (256 / w))
        image = image.resize((new_w, new_h), Image.Resampling.LANCZOS)
        top = (new_h - 256) // 2
        image = image.crop((0, top, new_w, top + 256))
    else:
        new_h, new_w = 256, int(w * (256 / h))
        image = image.resize((new_w, new_h), Image.Resampling.LANCZOS)
        left = (new_w - 256) // 2
        image = image.crop((left, 0, left + 256, new_h))
    return np.asarray(image, dtype=np.float32) / 255.0  # [H, W, 3]


def load_model_variables(model_path: str | None, cfg):
    """Checkpoint path -> flax variables. Supports orbax dirs, torch .ckpt,
    or None (random init, for smoke runs)."""
    import jax

    from siu3r_tpu.models.model import SIU3RModel

    model = SIU3RModel(cfg)
    if model_path is None:
        import jax.numpy as jnp

        print("[siu3r_tpu] no checkpoint given - using random init")
        images = jnp.zeros((1, cfg.num_views) + tuple(cfg.image_size) + (3,))
        intr = jnp.eye(3)[None, None].repeat(cfg.num_views, 1)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images, intr)
        return model, variables
    path = Path(model_path)
    if path.suffix == ".ckpt" or path.suffix == ".pth":
        from siu3r_tpu.checkpoint import load_torch_checkpoint

        variables = load_torch_checkpoint(str(path), cfg)
        return model, variables
    from siu3r_tpu.checkpoint_io import restore_checkpoint

    restored = restore_checkpoint(str(path))
    # training resume points carry optimizer leaves/counters too — keep only
    # the model collections
    return model, {
        k: restored[k] for k in ("params", "batch_stats") if k in restored
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--image_path1", type=str, required=True)
    parser.add_argument("--image_path2", type=str, required=True)
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

    cfg = bind_scannet_classes(RootCfg()).pipeline.model

    image1 = preprocess_image(args.image_path1)
    image2 = preprocess_image(args.image_path2)
    images = jnp.asarray(np.stack([image1, image2])[None])  # [1, 2, H, W, 3]
    intr = jnp.asarray(
        np.array(
            [
                [args.fx / 256.0, 0, args.cx / 256.0],
                [0, args.fy / 256.0, args.cy / 256.0],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )
    )[None, None].repeat(2, 1)

    model, variables = load_model_variables(args.model_path, cfg)

    t0 = time.time()
    out = jax.jit(
        lambda v, im, k: model.apply(v, im, k, enable_query_class_logit_lift=True)
    )(variables, images, intr)
    g = out.gaussians.to_host()
    print(f"[siu3r_tpu] forward in {time.time() - t0:.1f}s "
          f"({g.means.shape[1]} gaussians)")

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
        shift_and_scale=False,
        save_sh_dc_only=args.save_sh_dc_only,
    )
    print(f"[siu3r_tpu] wrote {out_dir / 'output.ply'}")


if __name__ == "__main__":
    main()
