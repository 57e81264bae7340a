"""Fast-memory-budget tile optimizer — the ``optimal_memory_tile_size.py`` port.

The reference computes the largest *balanced* (T_N, T_M) memory tile whose
BRAM cost fits the chip (``scripts/optimal_memory_tile_size.py``): cost per
PE-column ``pn * ceil(pm * bits / width)``, feasibility check, square-root
heuristic with balanced refinement (:27-51).

TPU translation: the budget is VMEM bytes instead of BRAM geometry; the cost
of a (block_m, block_n, block_k) choice is the multi-buffered A/B stream
blocks plus the resident accumulator/output tile
(:meth:`GemmConfig.vmem_bytes`).  The objective is the same
communication-avoiding one: HBM traffic is ``M*N*K*(1/block_m + 1/block_n)``
plus the output, so maximizing the *harmonic mean* of (block_m, block_n) —
i.e. balanced, as large as possible — minimizes I/O
(``src/PrintSpecifications.cpp:72-75``).

Usage (CLI, analogue of ``optimal_memory_tile_size.py N_bram W_bram ...``):

    python -m gemm_hls_tpu.tools.tile_optimizer --dtype bfloat16 \
        --vmem-bytes 100000000 [--m 8192 --n 8192 --k 8192]
"""

from __future__ import annotations

import argparse
from typing import List, Optional, Tuple

import jax.numpy as jnp

from gemm_hls_tpu.config import GemmConfig, LANE, sublane


def _fits(cfg: GemmConfig, budget: int) -> bool:
    return cfg.vmem_bytes() <= budget


def tile_candidates(dtype="float32", *, max_dim: int = 2048,
                    min_block_k: int = 256) -> List[Tuple[int, int, int]]:
    """Hardware-aligned candidate (block_m, block_n, block_k) triples."""
    sub = sublane(dtype)
    ms = [m for m in (128, 256, 512, 1024, 2048) if m <= max_dim and m % sub == 0]
    ns = [n for n in (128, 256, 512, 1024, 2048) if n <= max_dim and n % LANE == 0]
    ks = [k for k in (256, 512, 1024, 2048) if k >= min_block_k]
    return [(m, n, k) for m in ms for n in ns for k in ks]


def optimal_tiles(dtype="float32", *, vmem_budget: Optional[int] = None,
                  m: Optional[int] = None, n: Optional[int] = None,
                  k: Optional[int] = None, semiring: str = "plus_times",
                  out_dtype=None) -> GemmConfig:
    """Pick the best blocks under a VMEM budget.

    Mirrors the reference heuristic's structure: start from the balanced
    square root of the budget, then refine among feasible aligned candidates,
    preferring (1) minimal I/O volume, (2) balance, (3) larger block_k
    (longer K streaming amortizes the accumulator writeback, the analogue of
    the drain overhead at ``src/PrintSpecifications.cpp:45-50``).
    """
    from gemm_hls_tpu.models.perf_model import detect_chip

    if vmem_budget is None:
        # Leave headroom for Mosaic's own buffers, like the reference leaves
        # BRAM for the FIFOs.
        vmem_budget = int(detect_chip().vmem_bytes * 0.75)

    best = None
    best_key = None
    for bm, bn, bk in tile_candidates(dtype):
        cfg = GemmConfig(dtype=str(jnp.dtype(dtype)), block_m=bm, block_n=bn,
                         block_k=bk, semiring=semiring,
                         out_dtype=str(jnp.dtype(out_dtype)) if out_dtype else None,
                         vmem_limit_bytes=vmem_budget)
        if not _fits(cfg, vmem_budget):
            continue
        if m and bm > m and bm > 128:
            continue
        if n and bn > n and bn > 128:
            continue
        pm, pn, pk = (m or 8192), (n or 8192), (k or 8192)
        io = cfg.io_volume_bytes(pm, pn, pk)
        imbalance = max(bm, bn) / min(bm, bn)
        key = (io, imbalance, -bk)
        if best_key is None or key < best_key:
            best, best_key = cfg, key
    if best is None:
        raise ValueError(
            f"no feasible tile configuration for dtype={dtype} under "
            f"{vmem_budget} bytes of VMEM"
        )
    return best


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dtype", default="float32")
    p.add_argument("--vmem-bytes", type=int, default=None)
    p.add_argument("--m", type=int, default=None)
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--k", type=int, default=None)
    p.add_argument("--semiring", default="plus_times")
    args = p.parse_args(argv)
    cfg = optimal_tiles(args.dtype, vmem_budget=args.vmem_bytes,
                        m=args.m, n=args.n, k=args.k, semiring=args.semiring)
    print(f"block_m={cfg.block_m} block_n={cfg.block_n} block_k={cfg.block_k}")
    print(f"vmem_bytes={cfg.vmem_bytes()}")
    if args.m and args.n and args.k:
        print(f"io_volume_bytes={cfg.io_volume_bytes(args.m, args.n, args.k)}")
    return cfg


if __name__ == "__main__":
    main()
