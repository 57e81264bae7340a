"""Top-level distributed matmul: padding, algorithm dispatch, layout.

The single-chip entry point (``ops/matmul.py``) owns the pad/mask policy
for one device (the reference's ``MM_DYNAMIC_SIZES`` masking,
``kernel/Compute.cpp:112-137``); this module lifts the same policy to the
mesh level: arbitrary global shapes are padded up to mesh-divisible sizes
(K with the semiring's algebraically absorbing pair — see
``Semiring.absorbing``), the requested algorithm runs on the padded
operands, and the overhang is sliced off the result.

Algorithms:

* ``"summa"``  — gather-SUMMA (rectangular meshes, any semiring,
  transpose flags) — :func:`gemm_hls_tpu.parallel.summa.summa_matmul`.
* ``"cannon"`` — Cannon's algorithm (square meshes, O(1) extra memory).
* ``"auto"``   — cannon on square meshes without transposes, else summa.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gemm_hls_tpu.config import GemmConfig, round_up
from gemm_hls_tpu.ops.semiring import get_semiring
from gemm_hls_tpu.parallel.summa import cannon_matmul, summa_matmul


def _pad_global(x, rows: int, cols: int, pad_value):
    if rows == x.shape[0] and cols == x.shape[1]:
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])),
                   constant_values=pad_value)


def distributed_matmul(a, b, mesh: Mesh, *,
                       axes: Tuple[str, str] = ("x", "y"),
                       algorithm: str = "auto",
                       semiring="plus_times",
                       config: Optional[GemmConfig] = None,
                       out_dtype=None,
                       transpose_a: bool = False,
                       transpose_b: bool = False):
    """C = op(A) . op(B) over a device mesh, for arbitrary global shapes.

    Args:
      a: (M, K) global array — or (K, M) with ``transpose_a``.
      b: (K, N) global array — or (N, K) with ``transpose_b``.
      mesh: 2-D mesh; ``axes`` names its (row, column) axes.
      algorithm: "summa", "cannon", or "auto".
      semiring: any registered semiring.  Shapes whose K is not
        mesh-divisible require the semiring to define an absorbing pad
        pair (all built-ins except ``max_times``/custom maps do).

    Returns the (M, N) global result, sharded P(axes) over the mesh.
    """
    sr = get_semiring(semiring)
    ax, ay = axes
    px, py = mesh.shape[ax], mesh.shape[ay]
    m, k = (a.shape[1], a.shape[0]) if transpose_a else a.shape
    kb, n = (b.shape[1], b.shape[0]) if transpose_b else b.shape
    if k != kb:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")

    if algorithm == "auto":
        algorithm = ("cannon" if px == py and not (transpose_a or transpose_b)
                     else "summa")
    if algorithm == "cannon":
        if px != py:
            raise ValueError(f"cannon needs a square mesh, got {px}x{py}")
        if transpose_a or transpose_b:
            raise ValueError("cannon path does not take transpose flags; "
                             "use algorithm='summa'")
        mp = round_up(m, px)
        np_ = round_up(n, py)
        kp = round_up(k, px)
    elif algorithm == "summa":
        mp = round_up(m, px)
        np_ = round_up(n, py)
        kp = round_up(k, px * py)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")

    pads = sr.absorbing_for(a.dtype)
    if kp != k and pads is None:
        raise ValueError(
            f"K={k} is not divisible by the mesh and semiring "
            f"{sr.name!r} has no absorbing pad pair; pad K to {kp} yourself "
            f"or register `absorbing` for the semiring")
    pad_a, pad_b = pads if pads is not None else (0, 0)
    # M/N overhang is sliced off the output, so those pads only need to be
    # inert along K — the absorbing values satisfy both roles.
    a_p = (_pad_global(a, kp, mp, pad_a) if transpose_a
           else _pad_global(a, mp, kp, pad_a))
    b_p = (_pad_global(b, np_, kp, pad_b) if transpose_b
           else _pad_global(b, kp, np_, pad_b))

    a_spec = P(ay, ax) if transpose_a else P(ax, ay)
    b_spec = P(ay, ax) if transpose_b else P(ax, ay)
    a_p = jax.device_put(a_p, NamedSharding(mesh, a_spec))
    b_p = jax.device_put(b_p, NamedSharding(mesh, b_spec))

    if algorithm == "cannon":
        out = cannon_matmul(a_p, b_p, mesh, axes=axes, semiring=sr,
                            config=config, out_dtype=out_dtype)
    else:
        out = summa_matmul(a_p, b_p, mesh, axes=axes, semiring=sr,
                           config=config, out_dtype=out_dtype,
                           transpose_a=transpose_a, transpose_b=transpose_b)
    return out[:m, :n]
