"""Standalone evaluator CLI (reference src/evaluator.py:407-423).

Usage:
    python -m siu3r_tpu.cli.evaluate --eval_path outputs/val/1000 [--dataset scannet]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_path", type=str, required=True)
    parser.add_argument("--eval_scan_num", type=int, default=-1)
    parser.add_argument("--lpips_weights", type=str, default=None)
    args = parser.parse_args(argv)

    from siu3r_tpu.config import EvaluatorCfg, RootCfg, bind_scannet_classes
    from siu3r_tpu.eval import Evaluator

    cfg = bind_scannet_classes(RootCfg()).pipeline.evaluator
    ev = Evaluator(cfg, lpips_weights=args.lpips_weights)
    result = ev.evaluate(args.eval_path, args.eval_scan_num)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
