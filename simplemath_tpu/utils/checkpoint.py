"""Checkpoint / resume of solver state.

The reference has no serialization of any kind (SURVEY §5: ``toString`` is
the only export, include/SMArray.h:306).  Long MPC runs and large batched
solves need restartability: this module checkpoints arbitrary pytrees of
arrays (warm-start control sequences, multipliers, RNG keys, step counters)
via orbax when available, with a plain-numpy ``.npz`` fallback so the
feature never depends on optional packages.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, state: Any, metadata: Optional[Dict] = None) -> None:
    """Save a pytree of arrays to ``path`` (directory)."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "state"), state, force=True)
        backend = "orbax"
    except Exception:
        flat, treedef = _flatten_with_paths(state)
        np.savez(
            os.path.join(path, "state.npz"),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
        )
        with open(os.path.join(path, "treedef.json"), "w") as f:
            f.write(str(treedef))
        backend = "npz"
    meta = {"backend": backend}
    if metadata:
        meta.update(metadata)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore(path: str, like: Any = None) -> Any:
    """Restore a checkpoint; ``like`` provides the pytree structure for the
    npz fallback (required there, optional for orbax)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["backend"] == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.join(path, "state"), item=like)
    data = np.load(os.path.join(path, "state.npz"))
    flat = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if like is None:
        raise ValueError("npz restore requires `like` for the tree structure")
    _, treedef = _flatten_with_paths(like)
    return jax.tree_util.tree_unflatten(treedef, flat)
