"""Profiling / tracing — the observability subsystem.

The reference offers opt-in Vitis instrumentation (``MM_ENABLE_PROFILING``,
``CMakeLists.txt:10,197-201``) plus coarse host timing compared against the
``PrintSpecifications`` analytical expectation.  The TPU equivalents:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (XProf) of kernel launches, DMA, and ICI.
* :func:`profile_matmul` — times one configuration and reports measured vs
  analytical roofline expectation (the "%-of-expected" the reference prints,
  ``src/PrintSpecifications.cpp:51-60``).

    python -m gemm_hls_tpu.tools.profile 4096 4096 4096 --dtype bfloat16
"""

from __future__ import annotations

import argparse
import contextlib
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (TensorBoard/XProf format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def profile_matmul(m: int, n: int, k: int, *, dtype="float32",
                   semiring="plus_times", config=None, iters: int = 5,
                   logdir: Optional[str] = None) -> dict:
    """Measure one GEMM and compare to the analytical model."""
    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.models.perf_model import detect_chip, specifications
    from gemm_hls_tpu.ops.matmul import matmul
    from gemm_hls_tpu.ops.semiring import get_semiring
    from gemm_hls_tpu.utils.benchmark import (gflops, percent_of_peak,
                                              time_fn)
    from gemm_hls_tpu.utils.verify import make_operands

    sr = get_semiring(semiring)
    cfg = config or default_config(dtype, semiring=sr.name)
    chip = detect_chip()
    a, b = make_operands(m, n, k, dtype)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    fn = jax.jit(lambda x, y: matmul(x, y, semiring=sr, config=cfg))
    jax.block_until_ready(fn(aj, bj))

    if logdir:
        with trace(logdir):
            jax.block_until_ready(fn(aj, bj))

    secs = time_fn(fn, [(aj, bj)], iters=iters, warmup=1)
    spec = specifications(cfg, m, n, k, chip=chip, semiring_is_mxu=sr.is_mxu)
    gf = gflops(m, n, k, secs)
    return {
        "measured_seconds": secs,
        "measured_gflops": gf,
        "expected_seconds": spec["expected_runtime_s"],
        "expected_gflops": spec["expected_gflops"],
        "percent_of_expected": 100.0 * spec["expected_runtime_s"] / secs,
        "percent_of_peak": percent_of_peak(gf, spec["peak_flops"]),
        "bound": spec["bound"],
        "trace_dir": logdir,
        "chip": chip.name,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("m", type=int)
    p.add_argument("n", type=int)
    p.add_argument("k", type=int)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--semiring", default="plus_times")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace-dir", default=None,
                   help="write a TensorBoard/XProf trace here")
    args = p.parse_args(argv)
    r = profile_matmul(args.m, args.n, args.k, dtype=args.dtype,
                       semiring=args.semiring, iters=args.iters,
                       logdir=args.trace_dir)
    print(f"measured: {r['measured_seconds'] * 1e3:.3f} ms "
          f"({r['measured_gflops']:.1f} GOp/s)")
    print(f"roofline expectation: {r['expected_seconds'] * 1e3:.3f} ms "
          f"({r['expected_gflops']:.1f} GOp/s) [{r['bound']}-bound]")
    print(f"achieved {r['percent_of_expected']:.1f}% of expected, "
          f"{r['percent_of_peak']:.1f}% of {r['chip']} peak")
    if r["trace_dir"]:
        print(f"trace written to {r['trace_dir']}")
    return r


if __name__ == "__main__":
    main()
