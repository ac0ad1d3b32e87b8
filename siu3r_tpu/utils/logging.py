"""Rank-prefixed logging (reference src/utils/pylogger.py:7-55 semantics,
using jax.process_index instead of Lightning's rank plumbing)."""

from __future__ import annotations

import logging
import sys
from typing import Optional


def _rank() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class RankedLogger:
    def __init__(self, name: str = "siu3r_tpu", rank_zero_only: bool = False):
        self.logger = logging.getLogger(name)
        if not self.logger.handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(
                logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s")
            )
            self.logger.addHandler(handler)
            self.logger.setLevel(logging.INFO)
        self.rank_zero_only = rank_zero_only

    def _log(self, level: int, msg: str, rank: Optional[int] = None) -> None:
        current = _rank()
        msg = f"[rank: {current}] {msg}"
        if self.rank_zero_only:
            if current == 0:
                self.logger.log(level, msg)
        elif rank is None or rank == current:
            self.logger.log(level, msg)

    def info(self, msg: str, rank: Optional[int] = None) -> None:
        self._log(logging.INFO, msg, rank)

    def warning(self, msg: str, rank: Optional[int] = None) -> None:
        self._log(logging.WARNING, msg, rank)

    def error(self, msg: str, rank: Optional[int] = None) -> None:
        self._log(logging.ERROR, msg, rank)

    def debug(self, msg: str, rank: Optional[int] = None) -> None:
        self._log(logging.DEBUG, msg, rank)


class MetricsHistory:
    """Experiment tracker (the reference's WandbLogger + LearningRateMonitor
    slot, src/run.py:42-48,71-81): appends one JSON object per event to
    ``metrics.jsonl`` in the run output dir. Rank-0 only; safe to call from
    every process. Offline-first (the reference also runs wandb offline by
    default, configs/main.yaml:7)."""

    def __init__(self, out_dir):
        import pathlib

        self.path = pathlib.Path(out_dir) / "metrics.jsonl"
        self.enabled = _rank() == 0
        if self.enabled:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, step: int, **scalars) -> None:
        if not self.enabled:
            return
        import json
        import time

        record = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
