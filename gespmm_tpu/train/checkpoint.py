"""Checkpoint / resume for training state.

The reference has no checkpointing at all (SURVEY §5.4 — scripts run 200
epochs and exit).  This is a deliberately dependency-light implementation:
params/opt-state pytrees serialized with NumPy's npz plus a JSON manifest
(orbax is available in the image but overkill for these model sizes; the
file format here is inspectable and backend-agnostic).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(directory: str, state, epoch: int) -> str:
    """Write a checkpoint; returns its path. Keeps every checkpoint."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{epoch:08d}.npz")
    leaves, treedef = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    # The treedef string rides inside the archive so `restore` can verify
    # STRUCTURE, not just leaf count — a reshaped model must not silently
    # load positionally-matched weights.
    arrays["__treedef__"] = np.array(str(treedef))
    np.savez(path + ".tmp.npz", **arrays)
    os.replace(path + ".tmp.npz", path)
    manifest = {
        "epoch": epoch,
        "num_leaves": len(leaves),
        "treedef": str(treedef),
    }
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    ckpts = sorted(
        f for f in os.listdir(directory)
        if f.startswith("ckpt_") and f.endswith(".npz") and ".tmp" not in f
    )
    return os.path.join(directory, ckpts[-1]) if ckpts else None


def restore(path: str, state_template) -> Tuple[Any, int]:
    """Load a checkpoint into the structure of `state_template`.

    Returns (state, epoch).  The template provides the treedef.  The
    checkpoint is verified structurally before unflattening: the stored
    treedef string must match the template's, and every leaf's shape and
    dtype must match — positional matching alone would silently load wrong
    weights into any reshaped model of equal leaf count.
    """
    data = np.load(path)
    leaves, treedef = _flatten_with_paths(state_template)
    n_stored = len([k for k in data.files if k.startswith("leaf_")])
    if n_stored != len(leaves):
        raise ValueError(
            f"checkpoint has {n_stored} leaves, template {len(leaves)}"
        )
    if "__treedef__" in data.files:
        stored_td = str(data["__treedef__"])
        if stored_td != str(treedef):
            raise ValueError(
                "checkpoint structure does not match the template:\n"
                f"  stored:   {stored_td}\n  template: {str(treedef)}"
            )
    loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
    for i, (got, want) in enumerate(zip(loaded, leaves)):
        w = np.asarray(want)
        if got.shape != w.shape or got.dtype != w.dtype:
            raise ValueError(
                f"checkpoint leaf {i} is {got.shape}/{got.dtype}, "
                f"template expects {w.shape}/{w.dtype}"
            )
    state = jax.tree_util.tree_unflatten(treedef, loaded)
    epoch = int(os.path.basename(path).split("_")[1].split(".")[0])
    return state, epoch
