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


def save_train_state(
    path: str | Path, state: Any, epoch: int, global_step: int
) -> None:
    """Full training resume point: params + batch_stats + optimizer state +
    loop counters (the reference resumes Lightning ckpts incl. optimizer
    state via ``trainer.fit(ckpt_path=...)``, run.py:50-52,101).

    The optimizer state is stored as a flat leaf list — optax states are
    NamedTuples whose dict round-trip through orbax would reorder fields;
    unflattening against the live state's treedef on restore is exact. A
    structure fingerprint (treedef string + per-leaf shape/dtype) is stored
    alongside so restoring against a template built with a *different*
    optimizer config errors instead of silently reassembling wrong state."""
    state = jax.device_get(state)
    leaves = list(jax.tree.leaves(state.opt_state))
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_leaves": leaves,
        "opt_fingerprint": _opt_fingerprint(state.opt_state, leaves),
        "step": state.step,
        "epoch": epoch,
        "global_step": global_step,
    }
    save_checkpoint(path, payload)


def _opt_fingerprint(opt_state: Any, leaves=None) -> str:
    """Stable digest of the optimizer-state structure: treedef + per-leaf
    shape/dtype (leaf *values* excluded)."""
    import hashlib

    if leaves is None:
        leaves = jax.tree.leaves(opt_state)
    desc = str(jax.tree.structure(opt_state)) + "|" + ";".join(
        f"{tuple(getattr(l, 'shape', ()))}:{getattr(l, 'dtype', type(l).__name__)}"
        for l in leaves
    )
    return hashlib.sha256(desc.encode()).hexdigest()


def restore_train_state(path: str | Path, template_state: Any):
    """-> (TrainState-like matching ``template_state``'s structure,
    epoch, global_step)."""
    restored = restore_checkpoint(path)
    saved_fp = restored.get("opt_fingerprint")
    if saved_fp is not None:
        live_fp = _opt_fingerprint(template_state.opt_state)
        if saved_fp != live_fp:
            raise ValueError(
                f"optimizer-state structure mismatch restoring {path}: the "
                "checkpoint was saved with a different optimizer config "
                "(changed freeze/schedule/groups). Rebuild the template with "
                "the original config or start a fresh run."
            )
    opt_state = jax.tree.unflatten(
        jax.tree.structure(template_state.opt_state),
        restored["opt_leaves"],
    )
    state = type(template_state)(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=opt_state,
        step=restored["step"],
    )
    return state, int(restored["epoch"]), int(restored["global_step"])
