"""Checkpoint / resume of solver state.

The reference has no serialization of any kind (SURVEY §5: ``toString`` is
the only export, include/SMArray.h:306).  Long MPC runs and large batched
solves need restartability: this module checkpoints arbitrary pytrees of
arrays (warm-start control sequences, multipliers, RNG keys, step counters)
via orbax when available, with a plain-numpy ``.npz`` fallback so the
feature never depends on optional packages.

Restore validates the stored tree structure against ``like`` so a structure
mismatch is a clear error at the checkpoint boundary, not a downstream
shape error or silent misbinding.
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
    flat, treedef = _flatten_with_paths(state)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "state"), state, force=True)
        backend = "orbax"
    except Exception:
        np.savez(
            os.path.join(path, "state.npz"),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
        )
        backend = "npz"
    # The treedef string is the structure fingerprint `restore` checks.
    with open(os.path.join(path, "treedef.json"), "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(flat)}, f)
    meta = {"backend": backend}
    if metadata:
        meta.update(metadata)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def _check_structure(path: str, like: Any) -> None:
    """Raise ValueError if ``like``'s structure differs from the stored one."""
    tdpath = os.path.join(path, "treedef.json")
    if like is None or not os.path.exists(tdpath):
        return  # old checkpoints have no fingerprint; nothing to check
    with open(tdpath) as f:
        stored = json.load(f)
    _, treedef = _flatten_with_paths(like)
    if str(treedef) != stored["treedef"]:
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  stored : {stored['treedef']}\n"
            f"  `like` : {treedef}"
        )


def restore(path: str, like: Any = None) -> Any:
    """Restore a checkpoint; ``like`` provides the pytree structure for the
    npz fallback (required there, optional for orbax).  When given, ``like``
    is validated against the structure recorded at save time."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    _check_structure(path, like)
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
