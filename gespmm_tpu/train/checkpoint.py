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

    Returns (state, epoch).  The template provides the treedef; leaf arrays
    are matched positionally (the treedef string in the manifest is a
    human-readable sanity check, not a parser input).
    """
    data = np.load(path)
    leaves, treedef = _flatten_with_paths(state_template)
    loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
    if len(loaded) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(loaded)} leaves, template {len(leaves)}"
        )
    state = jax.tree_util.tree_unflatten(treedef, loaded)
    epoch = int(os.path.basename(path).split("_")[1].split(".")[0])
    return state, epoch
