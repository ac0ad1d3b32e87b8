"""Orbax checkpoint save/restore (reference's Lightning ModelCheckpoint
equivalent, SURVEY.md §5.4)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def save_checkpoint(path: str | Path, variables: Any, step: Optional[int] = None) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, variables)


def restore_checkpoint(path: str | Path) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)
