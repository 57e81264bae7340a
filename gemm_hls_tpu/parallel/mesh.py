"""Device-mesh construction helpers.

The reference is single-FPGA; its "interconnect" is the linear PE chain with
nearest-neighbor forwarding (``kernel/Compute.cpp:84-106``).  The TPU-native
generalization lifts that dataflow to the ICI torus: a
``jax.sharding.Mesh`` over the chips, with SUMMA/Cannon/2.5D decompositions
(``parallel/summa.py``, ``parallel/grid25d.py``) playing the role of the
PE chain at inter-chip scale.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def _grid_2d(n: int) -> Tuple[int, int]:
    """Most-square (px, py) factorization of n."""
    best = (1, n)
    for px in range(1, int(math.isqrt(n)) + 1):
        if n % px == 0:
            best = (px, n // px)
    return best


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("x", "y"),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    With no ``shape``, factors the device count into the most-square 2-D
    grid — SUMMA/Cannon want balance for the same reason the reference's
    tile optimizer prefers balanced memory tiles
    (``scripts/optimal_memory_tile_size.py:32-51``).
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        if len(axis_names) != 2:
            raise ValueError("auto shape only supported for 2 axes")
        shape = _grid_2d(len(devices))
    shape = tuple(shape)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def mesh_25d(c: int = 2, axis_names: Sequence[str] = ("z", "x", "y"),
             devices=None) -> Mesh:
    """(z=c, x, y) mesh for the 2.5D decomposition: p = c * q^2 devices with
    replication factor c over the ``z`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    p = len(devices)
    if p % c:
        raise ValueError(f"{p} devices not divisible by replication c={c}")
    q2 = p // c
    q = int(math.isqrt(q2))
    if q * q != q2:
        # Fall back to a rectangular (x, y) grid within each slice.
        px, py = _grid_2d(q2)
    else:
        px = py = q
    arr = np.array(devices).reshape((c, px, py))
    return Mesh(arr, tuple(axis_names))
