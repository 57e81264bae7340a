"""Out-of-HBM GEMM with host-DRAM tile staging.

The reference streams outer tiles of C through on-chip BRAM while A/B slabs
arrive in bursts from DDR (``kernel/Memory.cpp``) — fast memory holds one
output tile, slow memory holds the problem.  One level up the hierarchy,
this module does the same with HBM as the "fast" memory and host DRAM as
the slow one: C is computed one host-tile at a time, A/B K-panels stream
host->HBM, and JAX's async dispatch overlaps transfers with device compute
(the double-buffering analogue of ``kernel/Compute.cpp:19-26``).

I/O volume follows the same CA formula at this level:
``M*N*(1 + K/tile_n + K/tile_m)`` words over PCIe/DCN
(``src/PrintSpecifications.cpp:72-75``).
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu.config import GemmConfig, default_config, cdiv
from gemm_hls_tpu.ops.matmul import matmul
from gemm_hls_tpu.ops.semiring import get_semiring


def _device_bytes_limit(device) -> int:
    """Device memory budget in bytes (HBM), best-effort."""
    try:
        stats = device.memory_stats()
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return int(limit)
    except Exception:  # noqa: BLE001 — CPU/interpret devices lack stats
        pass
    return 16 * 1024**3


def _prefetch_fits(panel_bytes: int, acc_bytes: int, device,
                   depth: int = 2) -> bool:
    """Whether double-buffered staging fits the device memory budget.

    Prefetch keeps up to ``depth`` staged panel pairs resident *in
    addition to* the pair being consumed and the accumulator — roughly
    ``(depth + 1) x`` the sequential path's panel residency.  These
    streamed paths exist precisely for problems sized near/over HBM, so a
    workload that fits under sequential staging must not OOM because
    prefetch tripled its panel footprint; fall back to sequential staging
    when the prefetched residency would exceed ~60% of device memory.
    """
    resident = (depth + 1) * panel_bytes + acc_bytes
    return resident <= 0.6 * _device_bytes_limit(device)


def _prefetched(jobs, stage, *, depth: int = 2, enabled: bool = True):
    """Yield ``(job, stage(job))`` with up to ``depth`` stages in flight.

    The staging callable (host-DRAM slice / disk tile read + async
    ``device_put``) runs on a worker thread while the consumer's device
    compute is in flight — the host-level analogue of the PE's A
    double-buffer (``kernel/Compute.cpp:19-26``): buffer s+1 fills while
    buffer s drains.  ``depth=2`` = classic double buffering (one panel
    computing, one staging).  JAX dispatch is thread-safe; transfers are
    async, so the worker only pays the host-side slice/pin cost.

    Callers gate ``enabled`` through :func:`_prefetch_fits` so the extra
    ``depth`` panels of device residency can't push a
    fits-under-sequential workload over HBM.
    """
    jobs = list(jobs)
    if not enabled or len(jobs) <= 1:
        for job in jobs:
            yield job, stage(job)
        return
    with ThreadPoolExecutor(max_workers=1) as pool:
        inflight = deque()
        for job in jobs[:depth]:
            inflight.append((job, pool.submit(stage, job)))
        next_i = depth
        while inflight:
            job, fut = inflight.popleft()
            yield job, fut.result()
            if next_i < len(jobs):
                inflight.append((jobs[next_i], pool.submit(stage,
                                                           jobs[next_i])))
                next_i += 1


def streamed_matmul_files(a_file, b_file, c_file, *, semiring="plus_times",
                          config: Optional[GemmConfig] = None,
                          tile_m: int = 8192, tile_n: int = 8192,
                          tile_k: int = 8192, device=None,
                          prefetch: bool = True) -> None:
    """Disk-resident GEMM: operands and result live in files
    (``utils.tileio.MatrixFile``), streamed disk -> DRAM -> HBM per tile —
    the reference's DDR->BRAM outer-tile loop re-based two levels up.
    With ``prefetch`` (default) the next panel's disk read + host->HBM
    transfer overlaps the current panel's device compute (double-buffered).

    Args:
      a_file: MatrixFile (M, K); b_file: MatrixFile (K, N);
      c_file: writable MatrixFile (M, N).
    """
    sr = get_semiring(semiring)
    m, k = a_file.shape
    k2, n = b_file.shape
    if k != k2 or c_file.shape != (m, n):
        raise ValueError(f"shape mismatch: {a_file.shape} x {b_file.shape} "
                         f"-> {c_file.shape}")
    if config is None:
        config = default_config(str(a_file.dtype), semiring=sr.name)
    acc_dtype = config.jacc_dtype
    cfg_acc = config.replace(out_dtype=str(acc_dtype))
    device = device or jax.devices()[0]
    ident = sr.identity_for(acc_dtype)

    kp = cdiv(k, tile_k)
    jobs = [(i0, j0, kk)
            for i0 in range(0, m, tile_m)
            for j0 in range(0, n, tile_n)
            for kk in range(kp)]

    def stage(job):
        i0, j0, kk = job
        i1, j1 = min(m, i0 + tile_m), min(n, j0 + tile_n)
        k0, k1 = kk * tile_k, min(k, (kk + 1) * tile_k)
        return (jax.device_put(a_file.read_tile(i0, i1, k0, k1), device),
                jax.device_put(b_file.read_tile(k0, k1, j0, j1), device))

    in_b = np.dtype(str(a_file.dtype)).itemsize
    panel_bytes = (min(tile_m, m) + min(tile_n, n)) * min(tile_k, k) * in_b
    acc_bytes = min(tile_m, m) * min(tile_n, n) * acc_dtype.itemsize
    prefetch = prefetch and _prefetch_fits(panel_bytes, acc_bytes, device)

    acc = None
    for (i0, j0, kk), (a_panel, b_panel) in _prefetched(
            jobs, stage, enabled=prefetch):
        i1, j1 = min(m, i0 + tile_m), min(n, j0 + tile_n)
        if kk == 0:
            acc = jax.device_put(jnp.full((i1 - i0, j1 - j0), ident,
                                          acc_dtype), device)
        acc = sr.reduce_op(acc, matmul(a_panel, b_panel, semiring=sr,
                                       config=cfg_acc))
        if kk == kp - 1:
            c_file.write_tile(i0, j0, np.asarray(
                acc.astype(jnp.dtype(str(c_file.dtype)))))


def distributed_streamed_matmul(a: np.ndarray, b: np.ndarray, mesh, *,
                                semiring="plus_times",
                                config: Optional[GemmConfig] = None,
                                tile_m: int = 16384, tile_n: int = 16384,
                                tile_k: int = 16384,
                                algorithm: str = "summa",
                                out_dtype=None) -> np.ndarray:
    """Out-of-HBM GEMM over a device mesh: host DRAM holds the problem,
    each stationary C host-tile is computed by the distributed CA-GEMM
    (SUMMA or 2.5D) with K-panels streamed host -> mesh.

    This is BASELINE config #5's full shape — the reference's DDR->BRAM
    outer-tile loop (``kernel/Memory.cpp``) wrapped around the multi-chip
    decomposition instead of a single kernel.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gemm_hls_tpu.config import round_up
    from gemm_hls_tpu.parallel.dispatch import distributed_matmul
    from gemm_hls_tpu.parallel.grid25d import matmul_25d

    sr = get_semiring(semiring)
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")
    out_dt = np.dtype(out_dtype) if out_dtype is not None else a.dtype
    # Cross-panel partials accumulate in the accumulator dtype (one bf16
    # rounding per panel would otherwise breach the 1e-3 contract); the
    # cast to out_dt happens once per C tile.
    acc_dt = np.dtype(str((config or default_config(
        str(a.dtype), semiring=sr.name)).jacc_dtype))
    out = np.empty((m, n), dtype=out_dt)

    if algorithm == "summa":
        # distributed_matmul owns mesh-divisibility padding (ragged
        # remainder tiles included) and result slicing.
        def dist(ap, bp):
            return np.asarray(distributed_matmul(
                jnp.asarray(ap), jnp.asarray(bp), mesh, algorithm="summa",
                semiring=sr, config=config, out_dtype=str(acc_dt)))
    elif algorithm == "25d":
        cz = mesh.shape["z"]
        px, py = mesh.shape["x"], mesh.shape["y"]
        pads = sr.absorbing_for(a.dtype)

        def dist(ap, bp):
            import math

            mp_, kp_ = ap.shape
            np_ = bp.shape[1]
            mpad = round_up(mp_, px)
            npad = round_up(np_, py)
            kpad = round_up(kp_, cz * px * py // math.gcd(px, py))
            if kpad != kp_ and pads is None:
                raise ValueError(
                    f"panel K={kp_} is not divisible by the 2.5D mesh and "
                    f"semiring {sr.name!r} has no absorbing pad pair")
            pa, pb = pads if pads is not None else (0, 0)
            ap2 = np.pad(ap, ((0, mpad - mp_), (0, kpad - kp_)),
                         constant_values=pa)
            bp2 = np.pad(bp, ((0, kpad - kp_), (0, npad - np_)),
                         constant_values=pb)
            a_s = jax.device_put(ap2, NamedSharding(mesh, P("x", ("z", "y"))))
            b_s = jax.device_put(bp2, NamedSharding(mesh, P(("z", "x"), "y")))
            res = matmul_25d(a_s, b_s, mesh, semiring=sr, config=config,
                             out_dtype=str(acc_dt))
            return np.asarray(res)[:mp_, :np_]
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")

    kp = cdiv(k, tile_k)
    for i0 in range(0, m, tile_m):
        i1 = min(m, i0 + tile_m)
        for j0 in range(0, n, tile_n):
            j1 = min(n, j0 + tile_n)
            acc_np = None
            for kk in range(kp):
                k0, k1 = kk * tile_k, min(k, (kk + 1) * tile_k)
                partial = dist(a[i0:i1, k0:k1], b[k0:k1, j0:j1])
                acc_np = partial if acc_np is None else np.asarray(
                    sr.np_reduce(acc_np, partial))
            out[i0:i1, j0:j1] = acc_np.astype(out_dt)
    return out


def streamed_matmul(a: np.ndarray, b: np.ndarray, *, semiring="plus_times",
                    config: Optional[GemmConfig] = None,
                    tile_m: int = 8192, tile_n: int = 8192,
                    tile_k: int = 8192, out_dtype=None,
                    device=None, prefetch: bool = True) -> np.ndarray:
    """C = A . B for problems larger than HBM; A, B, C live in host DRAM.

    Args:
      a: (M, K) numpy array on host.
      b: (K, N) numpy array on host.
      tile_m/tile_n/tile_k: host-tile sizes — the outer "memory tile" at the
        HBM level (each (tile_m, tile_n) C tile stays resident on device
        while K streams in tile_k panels).
      prefetch: overlap the next panel's host slice + host->HBM transfer
        with the current panel's compute (double-buffered staging).
    """
    sr = get_semiring(semiring)
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")
    if config is None:
        config = default_config(str(a.dtype), semiring=sr.name)
    acc_dtype = config.jacc_dtype
    cfg_acc = config.replace(out_dtype=str(acc_dtype))
    out_dt = np.dtype(out_dtype) if out_dtype is not None else a.dtype
    device = device or jax.devices()[0]

    ident = sr.identity_for(acc_dtype)
    out = np.empty((m, n), dtype=out_dt)

    kp = cdiv(k, tile_k)
    jobs = [(i0, j0, kk)
            for i0 in range(0, m, tile_m)
            for j0 in range(0, n, tile_n)
            for kk in range(kp)]

    def stage(job):
        # Host slice (the expensive contiguous copy) + async host->HBM
        # transfer, off the compute thread.
        i0, j0, kk = job
        i1, j1 = min(m, i0 + tile_m), min(n, j0 + tile_n)
        k0, k1 = kk * tile_k, min(k, (kk + 1) * tile_k)
        return (jax.device_put(np.ascontiguousarray(a[i0:i1, k0:k1]), device),
                jax.device_put(np.ascontiguousarray(b[k0:k1, j0:j1]), device))

    in_b = a.dtype.itemsize
    panel_bytes = (min(tile_m, m) + min(tile_n, n)) * min(tile_k, k) * in_b
    acc_bytes = min(tile_m, m) * min(tile_n, n) * acc_dtype.itemsize
    prefetch = prefetch and _prefetch_fits(panel_bytes, acc_bytes, device)

    acc = None
    for (i0, j0, kk), (a_panel, b_panel) in _prefetched(
            jobs, stage, enabled=prefetch):
        i1, j1 = min(m, i0 + tile_m), min(n, j0 + tile_n)
        if kk == 0:
            acc = jax.device_put(jnp.full((i1 - i0, j1 - j0), ident,
                                          acc_dtype), device)
        partial = matmul(a_panel, b_panel, semiring=sr, config=cfg_acc)
        acc = sr.reduce_op(acc, partial)
        if kk == kp - 1:
            out[i0:i1, j0:j1] = np.asarray(
                acc.astype(jnp.dtype(str(out_dt)))
                if out_dt != acc.dtype else acc)
    return out


def streamed_ozaki_matmul(a: np.ndarray, b: np.ndarray, *,
                          tile_m: int = 4096, tile_n: int = 4096,
                          tile_k: int = 16384,
                          target_rel: float = 1e-14) -> np.ndarray:
    """f64-class C = A . B for problems larger than HBM.

    Same host-tile streaming schedule as :func:`streamed_matmul`, but each
    (tile_m, tile_n) x tile_k panel product runs through the fused
    Ozaki-int8 kernel (``ops/pallas_ozaki.py``), so double-precision-class
    problems are bounded by host DRAM, not HBM.  Panel results are exact
    to ~1e-15 normwise; the cross-panel sum accumulates in host float64
    (one rounding per panel — the same growth as any blocked f64 GEMM).
    """
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")
    out = np.zeros((m, n), np.float64)
    for i0 in range(0, m, tile_m):
        i1 = min(m, i0 + tile_m)
        for j0 in range(0, n, tile_n):
            j1 = min(n, j0 + tile_n)
            for k0 in range(0, k, tile_k):
                k1 = min(k, k0 + tile_k)
                out[i0:i1, j0:j1] += ozaki_matmul_int8(
                    a[i0:i1, k0:k1], b[k0:k1, j0:j1],
                    target_rel=target_rel)
    return out
