"""2.5D communication-avoiding GEMM over a (z, x, y) mesh.

The 2.5D scheme (Solomonik-Demmel) replicates the 2-D SUMMA grid c times
and splits the contraction dimension across the replicas: p = c * q^2
devices store c copies of the operands' panels, each z-slice computes 1/c of
the K-stages, and a final reduction over ``z`` combines the partials —
cutting inter-chip communication by sqrt(c) at the cost of c-fold operand
replication.  This is the multi-chip extension of the reference's
fast-memory-for-communication trade: the FPGA buys I/O reduction with larger
BRAM tiles (``src/PrintSpecifications.cpp:72-78``); 2.5D buys it with
replicated HBM.

Within each z-slice the 2-D step is gather-SUMMA (``parallel/summa.py``);
the cross-slice combine honors the configured semiring (psum for plus_times,
all-gather + tree-fold otherwise).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.matmul import matmul
from gemm_hls_tpu.ops.pallas_vpu import fold_axis
from gemm_hls_tpu.ops.semiring import get_semiring
from gemm_hls_tpu.parallel.summa import _local_config


def shard_operands_25d(a, b, mesh: Mesh,
                       axes: Tuple[str, str, str] = ("z", "x", "y")):
    """A: (M, K) as P(x, (z, y)) — K split z-major;
    B: (K, N) as P((z, x), y) — K split z-major.

    Both K partitions are z-major, so slice z owns the same K/c range of A
    and B."""
    az, ax, ay = axes
    a_s = jax.device_put(a, NamedSharding(mesh, P(ax, (az, ay))))
    b_s = jax.device_put(b, NamedSharding(mesh, P((az, ax), ay)))
    return a_s, b_s


def matmul_25d(a, b, mesh: Mesh, *, axes: Tuple[str, str, str] = ("z", "x", "y"),
               semiring="plus_times", config: Optional[GemmConfig] = None,
               out_dtype=None):
    """C[P(x,y)] = A[P(x,(z,y))] . B[P((z,x),y)] on a (c, px, py) mesh."""
    sr = get_semiring(semiring)
    az, ax, ay = axes
    c = mesh.shape[az]
    px = mesh.shape[ax]
    py = mesh.shape[ay]
    m, k = a.shape
    n = b.shape[1]
    # A's K is split over (z, y) = c*py ways, B's over (z, x) = c*px; both
    # shards must be integral (the joint c*px*py bound would reject valid
    # shapes on rectangular meshes).
    if m % px or n % py or k % (c * px) or k % (c * py):
        raise ValueError(
            f"shape ({m},{n},{k}) not divisible by 2.5D mesh "
            f"({c},{px},{py}); K must be divisible by both "
            f"c*px={c * px} and c*py={c * py}"
        )
    cfg = _local_config(config, a.dtype, m // px, n // py, k // c, sr.name)
    acc_dtype = cfg.jacc_dtype
    cfg_acc = cfg.replace(out_dtype=str(acc_dtype))
    final_dtype = jnp.dtype(out_dtype) if out_dtype is not None else cfg.jout_dtype

    def local(a_blk, b_blk):
        # Within this z-slice: gather-SUMMA over its K/c chunk.
        a_panel = jax.lax.all_gather(a_blk, ay, axis=1, tiled=True)  # (m/px, k/c)
        b_panel = jax.lax.all_gather(b_blk, ax, axis=0, tiled=True)  # (k/c, n/py)
        partial = matmul(a_panel, b_panel, semiring=sr, config=cfg_acc)
        if sr.is_mxu:
            full = jax.lax.psum(partial, az)
        else:
            stacked = jax.lax.all_gather(partial, az, axis=0, tiled=False)
            full = fold_axis(stacked, sr.reduce_op, axis=0)
        return full.astype(final_dtype)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(ax, (az, ay)), P((az, ax), ay)),
                       out_specs=P(ax, ay), check_vma=False)
    return fn(a, b)
