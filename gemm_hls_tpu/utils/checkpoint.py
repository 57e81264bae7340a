"""Checkpoint/resume for training state.

The reference has no compute checkpointing (its checkpointable artifact is
the compiled bitstream — covered by ``tools/cache.py``); a TPU *training*
framework additionally needs model-state checkpointing.  Orbax when
available (async, sharding-aware — restores distributed arrays onto a
mesh), flat ``.npz`` as the dependency-free fallback.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, state: Any) -> str:
    """Save a pytree of arrays. Directory path -> orbax; ``.npz`` -> numpy."""
    if path.endswith(".npz"):
        leaves, _ = _flatten(state)
        np.savez(path, *[np.asarray(x) for x in leaves])
        return path
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    return path


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Load a checkpoint. ``like`` (a template pytree) is required for the
    ``.npz`` format and used for structure/sharding with orbax."""
    if path.endswith(".npz"):
        if like is None:
            raise ValueError("load_checkpoint(.npz) needs a `like` template")
        leaves, treedef = _flatten(like)
        with np.load(path) as data:
            arrays = [data[k] for k in data.files]
        if len(arrays) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(arrays)} leaves, template has "
                f"{len(leaves)}")
        import jax.numpy as jnp
        restored = [jnp.asarray(a, dtype=l.dtype) for a, l in
                    zip(arrays, leaves)]
        return jax.tree.unflatten(treedef, restored)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), item=like)
    return ckptr.restore(os.path.abspath(path))
