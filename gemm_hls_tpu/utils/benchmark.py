"""Timing utilities — the host-driver benchmark semantics.

Re-implements the reference's measurement protocol
(``host/RunHardware.cpp:158-185``): warm once (the FPGA analogue is
reconfiguration), time kernel execution only, report seconds and
GOp/s = 1e-9 * 2*N*K*M / t.

Protocol notes for remote-attached TPUs: every timed call is jitted (eager
dispatch round-trips dominate otherwise) and iterations alternate between
distinct input buffers so transport-level result caching cannot fake speed;
a single ``block_until_ready`` fences the batch.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence, Tuple

import jax


def time_fn(fn: Callable, args_sets: Sequence[Tuple], *, iters: int = 10,
            warmup: int = 2) -> float:
    """Median-of-batches seconds per call of ``fn``.

    Args:
      fn: jitted callable.
      args_sets: one or more argument tuples; iterations cycle through them.
    """
    outs = []
    for i in range(warmup):
        outs.append(fn(*args_sets[i % len(args_sets)]))
    jax.block_until_ready(outs)

    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(fn(*args_sets[i % len(args_sets)]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def gflops(m: int, n: int, k: int, seconds: float) -> float:
    """GOp/s = 1e-9 * 2*M*N*K / t (``host/RunHardware.cpp:174-180``)."""
    return 2.0 * m * n * k / seconds / 1e9


def percent_of_peak(gf: float, peak_flops: float) -> float:
    return 100.0 * gf * 1e9 / peak_flops
