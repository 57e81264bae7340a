"""SUMMA and Cannon distributed CA-GEMM over the device mesh.

The reference's linear systolic chain forwards A downstream, relays B, and
drains C upstream (``kernel/Compute.cpp:84-106,151-193``) — a 1-D systolic
ring at PE granularity.  Lifted to chip granularity this is exactly the
classical communication-avoiding matmul family:

* :func:`summa_matmul` — gather-based SUMMA: each mesh row all-gathers its
  A panel over the column axis, each column all-gathers its B panel over the
  row axis, then one local CA-GEMM per chip.  XLA lowers the gathers to ICI
  all-gathers overlapped with compute.  Works on rectangular meshes and any
  semiring.
* :func:`cannon_matmul` — Cannon's algorithm: O(1) extra memory.  Initial
  skew via a joint-axis ``ppermute`` (device (i,j) -> (i, j-i) for A,
  (i-j, j) for B — the inter-chip analogue of the reference's on-chip
  transpose-and-feed stages, ``kernel/Memory.cpp:131-181``), then p steps of
  local multiply + nearest-neighbor shifts riding the ICI torus.  Square
  meshes.

Both compute C = reduce_k map(A, B) for any registered semiring: the local
step is this framework's own CA matmul and the cross-step combine uses the
semiring's reduce.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gemm_hls_tpu.config import GemmConfig, default_config, round_up, sublane, LANE
from gemm_hls_tpu.ops.matmul import matmul
from gemm_hls_tpu.ops.semiring import get_semiring


def _local_config(cfg: Optional[GemmConfig], dtype, local_m, local_n, local_k,
                  semiring: str) -> GemmConfig:
    """Clamp block sizes to the per-device problem so tiny local shards don't
    pad up to full-size blocks."""
    if cfg is None:
        cfg = default_config(str(dtype), semiring=semiring)
    sub = sublane(cfg.dtype)
    return cfg.replace(
        block_m=min(cfg.block_m, round_up(local_m, sub)),
        block_n=min(cfg.block_n, round_up(local_n, LANE)),
        block_k=min(cfg.block_k, round_up(local_k, LANE)),
        semiring=semiring,
    )


def shard_operands_2d(a, b, mesh: Mesh, axes: Tuple[str, str] = ("x", "y")):
    """Place A as P(x, y) over (M, K) and B as P(x, y) over (K, N)."""
    ax, ay = axes
    a_s = jax.device_put(a, NamedSharding(mesh, P(ax, ay)))
    b_s = jax.device_put(b, NamedSharding(mesh, P(ax, ay)))
    return a_s, b_s


def summa_matmul(a, b, mesh: Mesh, *, axes: Tuple[str, str] = ("x", "y"),
                 semiring="plus_times", config: Optional[GemmConfig] = None,
                 out_dtype=None, transpose_a: bool = False,
                 transpose_b: bool = False):
    """Gather-SUMMA: C[P(x,y)] = op(A) . op(B), operands P(x,y)-sharded.

    Per-device comm volume: (py-1)/py * |A_row_panel| + (px-1)/px *
    |B_col_panel| — the 2-D communication-avoiding optimum for stationary-C.

    ``transpose_a``: A is supplied (K, M) sharded P(ay, ax) — the gathered
    local panel stays K-major and the local kernel contracts its leading
    axis via BlockSpec index maps (zero materialized transposes end to end;
    the distributed extension of the reference's ``MM_TRANSPOSED_A`` path,
    ``kernel/Memory.cpp:205-261``).  ``transpose_b`` likewise takes B as
    (N, K) sharded P(ay, ax).
    """
    sr = get_semiring(semiring)
    ax, ay = axes
    px = mesh.shape[ax]
    py = mesh.shape[ay]
    m, k = (a.shape[1], a.shape[0]) if transpose_a else a.shape
    n = b.shape[0] if transpose_b else b.shape[1]
    if m % px or k % (px * py) or n % py:
        raise ValueError(
            f"shape ({m},{n},{k}) not divisible by mesh {px}x{py} "
            f"(K must divide {px * py})"
        )
    cfg = _local_config(config, a.dtype, m // px, n // py, k, sr.name)
    cfg = cfg.replace(transpose_a=transpose_a, transpose_b=transpose_b)
    if transpose_a:
        # Transposed A puts block_m on the lane dimension (must be %128).
        cfg = cfg.replace(block_m=round_up(cfg.block_m, LANE))
    if out_dtype is not None:
        cfg = cfg.replace(out_dtype=str(jnp.dtype(out_dtype)))

    a_spec = P(ay, ax) if transpose_a else P(ax, ay)
    b_spec = P(ay, ax) if transpose_b else P(ax, ay)

    def local(a_blk, b_blk):
        # Gather the K axis regardless of layout: axis 0 of a (K, m/px)
        # transposed panel, axis 1 of an (m/px, K) one.
        a_panel = jax.lax.all_gather(a_blk, ay, axis=(0 if transpose_a else 1),
                                     tiled=True)
        b_panel = jax.lax.all_gather(b_blk, ax, axis=(1 if transpose_b else 0),
                                     tiled=True)
        return matmul(a_panel, b_panel, semiring=sr, config=cfg)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(a_spec, b_spec),
                       out_specs=P(ax, ay), check_vma=False)
    return fn(a, b)


def cannon_matmul(a, b, mesh: Mesh, *, axes: Tuple[str, str] = ("x", "y"),
                  semiring="plus_times", config: Optional[GemmConfig] = None,
                  out_dtype=None):
    """Cannon's algorithm on a square (p x p) mesh: skew, then p steps of
    local CA-GEMM + ring shifts.  O(|A_blk| + |B_blk|) memory per device —
    the streamed analogue of the reference's K-streaming outer loop."""
    sr = get_semiring(semiring)
    ax, ay = axes
    p = mesh.shape[ax]
    if mesh.shape[ay] != p:
        raise ValueError(f"cannon_matmul needs a square mesh, got "
                         f"{mesh.shape[ax]}x{mesh.shape[ay]}")
    m, k = a.shape
    n = b.shape[1]
    if m % p or n % p or k % p:
        raise ValueError(f"shape ({m},{n},{k}) not divisible by mesh {p}x{p}")
    cfg = _local_config(config, a.dtype, m // p, n // p, k // p, sr.name)
    if out_dtype is not None:
        cfg = cfg.replace(out_dtype=str(jnp.dtype(out_dtype)))
    acc_dtype = cfg.jacc_dtype
    cfg_acc = cfg.replace(out_dtype=str(acc_dtype))

    # Joint-axis permutations, linearized as i*p + j.
    skew_a = [(i * p + j, i * p + ((j - i) % p))
              for i in range(p) for j in range(p)]
    skew_b = [(i * p + j, ((i - j) % p) * p + j)
              for i in range(p) for j in range(p)]
    shift_left = [(j, (j - 1) % p) for j in range(p)]
    shift_up = [(i, (i - 1) % p) for i in range(p)]

    def local(a_blk, b_blk):
        a_blk = jax.lax.ppermute(a_blk, (ax, ay), skew_a)
        b_blk = jax.lax.ppermute(b_blk, (ax, ay), skew_b)
        acc = matmul(a_blk, b_blk, semiring=sr, config=cfg_acc)
        for step in range(p - 1):
            a_blk = jax.lax.ppermute(a_blk, ay, shift_left)
            b_blk = jax.lax.ppermute(b_blk, ax, shift_up)
            acc = sr.reduce_op(acc, matmul(a_blk, b_blk, semiring=sr,
                                           config=cfg_acc))
        return acc.astype(cfg.jout_dtype)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(ax, ay), P(ax, ay)),
                       out_specs=P(ax, ay), check_vma=False)
    return fn(a, b)
