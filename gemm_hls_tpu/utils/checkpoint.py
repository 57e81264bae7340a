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
        # Deterministic indexed keys (leaf order of the pytree) so restore
        # never depends on np.load's file ordering.
        np.savez(path, **{f"arr_{i}": np.asarray(x)
                          for i, x in enumerate(leaves)})
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
            if len(data.files) != len(leaves):
                raise ValueError(
                    f"checkpoint has {len(data.files)} leaves, template has "
                    f"{len(leaves)}")
            arrays = []
            for i, leaf in enumerate(leaves):
                key = f"arr_{i}"
                if key not in data:
                    raise ValueError(f"checkpoint is missing leaf {key}")
                a = data[key]
                if tuple(a.shape) != tuple(np.shape(leaf)):
                    raise ValueError(
                        f"checkpoint leaf {i} has shape {tuple(a.shape)}, "
                        f"template expects {tuple(np.shape(leaf))}")
                arrays.append(a)
        import jax.numpy as jnp
        restored = [jnp.asarray(a, dtype=l.dtype) for a, l in
                    zip(arrays, leaves)]
        return jax.tree.unflatten(treedef, restored)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), item=like)
    return ckptr.restore(os.path.abspath(path))
