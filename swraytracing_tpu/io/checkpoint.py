"""Deterministic checkpoint/resume of full simulation state.

The reference's only restart mechanism is "frames already written are
kept" in its append-per-frame binaries (SURVEY.md section 5;
write_field.m fseek addressing) plus ad-hoc .mat restarts
(raytrace_sw.m:11). Here any pytree (flow state + packet state + step
counters, e.g. CoupledCarry) round-trips to an .npz with its tree
structure recorded, so a crashed run resumes bit-exactly at the last
checkpointed step.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax

__all__ = ["save_state", "restore_state", "latest_checkpoint"]


def save_state(path, state, step: int | None = None) -> str:
    """Save a pytree to <path>[_<step>].npz (atomic rename)."""
    path = Path(path)
    if step is not None:
        path = path.with_name(f"{path.stem}_{step:012d}")
    path = path.with_suffix(".npz")
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    tmp = path.with_suffix(".npz.tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, __treedef__=np.frombuffer(
            json.dumps(str(treedef)).encode(), dtype=np.uint8), **arrays)
    tmp.rename(path)
    return str(path)


def restore_state(path, like):
    """Restore into the structure of pytree `like` (shapes/dtypes must
    match what was saved)."""
    with np.load(path) as data:
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        n = len(leaves_like)
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, [
        np.asarray(leaf) for leaf in leaves])


def latest_checkpoint(directory, prefix: str = "ckpt") -> str | None:
    cands = sorted(Path(directory).glob(f"{prefix}_*.npz"))
    return str(cands[-1]) if cands else None
