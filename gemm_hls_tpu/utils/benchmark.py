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
    ``optimization_barrier`` tied to a loop-carried checksum of the full
    output.  XLA can neither hoist the call out of the loop, CSE it, nor
    dead-code-eliminate any output element, and the single final host fetch
    of the checksum cannot complete before every iteration has executed.
    One transport round trip total.

    Args:
      fn: jittable callable returning an array (or pytree; first leaf used).
      args_sets: argument tuples; the on-device loop uses the first set (the
        barrier defeats caching, so one set suffices).
    """
    args = args_sets[0]

    def repeated(*xs):
        def body(_, s):
            barred = jax.lax.optimization_barrier(tuple(xs) + (s,))
            out = fn(*barred[:-1])
            leaf = jax.tree.leaves(out)[0]
            return barred[-1] + jnp.sum(leaf.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    g = jax.jit(repeated)
    float(g(*args))  # compile + warm (covers `warmup`)
    t0 = time.perf_counter()
    float(g(*args))  # single fetch dependent on all iterations
    per_iter = (time.perf_counter() - t0) / iters
    # Subtract harness overhead, but never report < 5% of the raw
    # measurement (guards against calibration variance inventing speed).
    return max(per_iter - _loop_overhead(), per_iter * 0.05)


_OVERHEAD_CACHE: dict = {}


def _loop_overhead() -> float:
    """Per-iteration cost of the timing loop itself (barrier + checksum +
    launch), calibrated once per process with a trivial kernel (~0.5 ms on
    remote-attached chips, ~0 locally) and subtracted from measurements."""
    backend = jax.default_backend()
    if backend not in _OVERHEAD_CACHE:
        _OVERHEAD_CACHE[backend] = 0.0  # so the nested time_fn subtracts 0
        x = jnp.ones((8, 128), jnp.float32)
        trivial = jax.jit(lambda v: v)
        _OVERHEAD_CACHE[backend] = time_fn(trivial, [(x,)], iters=30)
    return _OVERHEAD_CACHE[backend]


def gflops(m: int, n: int, k: int, seconds: float) -> float:
    """GOp/s = 1e-9 * 2*M*N*K / t (``host/RunHardware.cpp:174-180``)."""
    return 2.0 * m * n * k / seconds / 1e9


def percent_of_peak(gf: float, peak_flops: float) -> float:
    return 100.0 * gf * 1e9 / peak_flops
