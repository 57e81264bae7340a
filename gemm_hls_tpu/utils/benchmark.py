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
import jax.numpy as jnp


def time_fn(fn: Callable, args_sets: Sequence[Tuple], *, iters: int = 10,
            warmup: int = 2) -> float:
    """Seconds per call of ``fn``, measured with a tamper-proof protocol.

    Remote-attached TPU transports can satisfy ``block_until_ready`` without
    the work being observable, may cache repeated executions, and charge a
    multi-ms round trip per dispatch — so the repetition loop runs
    *on-device*: a ``fori_loop`` whose body recomputes ``fn`` behind an
    ``optimization_barrier`` tied to a loop-carried checksum.  XLA can
    neither hoist the call out of the loop, CSE it, nor dead-code-eliminate
    the output (the output passes through a second ``optimization_barrier``,
    whose operand must be fully materialized), and the single final host
    fetch of the checksum cannot complete before every iteration has
    executed.  One transport round trip total.

    The checksum reads only a small corner tile of the barrier'd output
    rather than reducing the whole array: a full-output ``jnp.sum`` is free
    for native XLA ops (it fuses into the op's output fusion) but costs an
    opaque Pallas/custom-call kernel a full extra HBM read of C per
    iteration — a systematic anti-Pallas bias of up to ~20% on
    output-heavy shapes (measured on 1024x65536x1024: 133->180 TF after
    the fix).  The barrier makes the tile read tamper-proof: XLA cannot
    narrow the producer's computation through an optimization_barrier.

    The fixed per-measurement cost (dispatch + scalar-fetch round trip,
    ~15-30 ms and load-dependent on remote-attached chips) is cancelled
    exactly by the two-point slope: the same on-device loop is timed at two
    iteration counts and the per-iteration time is
    (t(n2) - t(n1)) / (n2 - n1).

    Args:
      fn: jittable callable returning an array (or pytree; first leaf used).
      args_sets: argument tuples; the on-device loop uses the first set (the
        barrier defeats caching, so one set suffices).
      iters: n2 - n1 (the iteration count the slope averages over).
    """
    args = args_sets[0]

    def make(n):
        def repeated(*xs):
            def body(_, s):
                barred = jax.lax.optimization_barrier(tuple(xs) + (s,))
                out = fn(*barred[:-1])
                leaf = jax.lax.optimization_barrier(jax.tree.leaves(out)[0])
                tile = leaf[tuple(slice(0, min(d, 8)) for d in leaf.shape)]
                return barred[-1] + jnp.sum(tile.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((), jnp.float32))
        return jax.jit(repeated)

    n1 = max(1, warmup)
    n2 = n1 + iters
    g1, g2 = make(n1), make(n2)
    float(g1(*args))  # compile + warm g1
    float(g2(*args))  # compile + warm g2

    def measure(g):
        t0 = time.perf_counter()
        float(g(*args))  # single fetch dependent on all iterations
        return time.perf_counter() - t0

    # Median of 3 slopes guards against RTT jitter on either endpoint.
    slopes = sorted((measure(g2) - measure(g1)) / (n2 - n1)
                    for _ in range(3))
    return max(slopes[1], 1e-9)


def interleaved_medians(fns: Sequence[Callable], args: Tuple, flops: float,
                        peak_gflops: Optional[float], *, rounds: int = 3,
                        iters: int = 6) -> list:
    """Median GFLOP/s per fn over ``rounds`` interleaved measurements.

    The comparison protocol shared by the benchmark suites: candidates are
    measured back-to-back within each round (cancels relay/clock drift
    between them), readings above ``peak_gflops`` are re-measured once and
    dropped if still impossible (transport hiccups), and the published
    value per fn is the median of its surviving rounds.  Raises
    RuntimeError if any fn ends up with no sane reading.
    """
    samples: list = [[] for _ in fns]
    for _ in range(max(1, rounds)):
        for fn, out in zip(fns, samples):
            gf = flops / time_fn(fn, [args], iters=iters) / 1e9
            if peak_gflops and gf > peak_gflops:
                gf = flops / time_fn(fn, [args], iters=iters) / 1e9
            if not peak_gflops or gf <= peak_gflops:
                out.append(gf)
    if any(not s for s in samples):
        raise RuntimeError(
            "no physically possible reading after retries (relay hiccup)")
    return [sorted(s)[len(s) // 2] for s in samples]


def gflops(m: int, n: int, k: int, seconds: float) -> float:
    """GOp/s = 1e-9 * 2*M*N*K / t (``host/RunHardware.cpp:174-180``)."""
    return 2.0 * m * n * k / seconds / 1e9


def percent_of_peak(gf: float, peak_flops: float) -> float:
    return 100.0 * gf * 1e9 / peak_flops
