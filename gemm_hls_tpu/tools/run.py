"""Host runner CLI — the ``RunHardware.exe N K M [hw/hw_emu] [verify]`` port
(reference ``host/RunHardware.cpp:18-28``).

    python -m gemm_hls_tpu.tools.run M N K [--dtype DT] [--semiring SR]
        [--verify {on,off}] [--iters I] [--power] [--backend pallas|xla]

Reproduces the reference driver's protocol (``host/RunHardware.cpp:30-227``):
seed-5 U(1,10) operands, kernel launch + timing, GOp/s = 1e-9*2NKM/t, and
element-wise verification against the BLAS/naive oracle with relative 1e-3 /
exact-integer tolerance.  ``--power`` reports an estimated W and GOp/J from
the chip's TDP — the datasheet-model stand-in for the reference's optional
Corsair PSU powermeter (``host/RunHardware.cpp:156-185``), since TPU chips
expose no user-readable power telemetry.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("m", type=int)
    p.add_argument("n", type=int)
    p.add_argument("k", type=int)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--out-dtype", default=None)
    p.add_argument("--semiring", default="plus_times")
    p.add_argument("--verify", choices=["on", "off"], default="on")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--power", action="store_true",
                   help="estimate W and GOp/J from the chip TDP model")
    p.add_argument("--backend", choices=["pallas", "xla"], default=None)
    p.add_argument("--precision",
                   choices=["default", "high", "highest",
                            "i8x2", "i8x3", "i8x4"],
                   default=None,
                   help="fp32 accuracy/speed tier: highest = full fp32 "
                        "(~2.6e-7); i8x2/i8x3/i8x4 = integer-slice scheme "
                        "on the int8 engine (3.4e-4 at ~97 TF / 3.7e-6 at "
                        "~53 TF / 3.9e-8 at ~30 TF on v5e — i8x4 is at the "
                        "f32 output floor, tighter than highest); default "
                        "= Mosaic 2-pass (~5e-4, magnitude-scaled error)")
    p.add_argument("--block-m", type=int, default=None)
    p.add_argument("--block-n", type=int, default=None)
    p.add_argument("--block-k", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.models.perf_model import detect_chip
    from gemm_hls_tpu.ops.matmul import matmul
    from gemm_hls_tpu.ops.semiring import get_semiring
    from gemm_hls_tpu.utils.benchmark import gflops, percent_of_peak, time_fn
    from gemm_hls_tpu.utils.verify import (
        check_result, make_operands, reference_matmul, tolerance_for,
    )

    sr = get_semiring(args.semiring)

    if (args.dtype == "float64" and sr.name == "plus_times"
            and jax.default_backend() == "tpu"):
        # TPU has no f64 hardware and XLA's emulation is impractical; run
        # the fused Ozaki int8 slice scheme instead (~4x the bf16-slice
        # rate, ~1e-15 normwise, K unbounded — per-block int32 exactness).
        from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8

        print(f"Executing {args.m}x{args.n}x{args.k} float64 GEMM via the "
              f"Ozaki fused int8 slice scheme on {detect_chip().name}...")
        a, b = make_operands(args.m, args.n, args.k, "float64")
        import time as _time
        t0 = _time.perf_counter()
        out = ozaki_matmul_int8(a, b)
        secs = _time.perf_counter() - t0
        gf = gflops(args.m, args.n, args.k, secs)
        print(f"Completed in {secs:.3f} s end-to-end ({gf:.1f} GOp/s incl. "
              f"host split/transfers; device-only rate is ~10x higher).")
        if args.verify == "on":
            exp = reference_matmul(a, b)
            ok, err = check_result(out, exp, rtol=1e-9)
            print("Results verified." if ok
                  else f"VERIFICATION FAILED ({err:.3e}).")
            return 0 if ok else 1
        return 0

    cfg = None
    if args.block_m is None and args.block_n is None and args.block_k is None:
        # No explicit blocks: consult the measured autotune winners (user
        # cache, then the packaged per-chip seed) — the same default the
        # library front door uses for an untuned matmul(a, b).
        from gemm_hls_tpu.tools.autotune import cached_config

        cfg = cached_config(args.m, args.n, args.k, dtype=args.dtype,
                            semiring=sr.name)
    if cfg is None:
        cfg = default_config(args.dtype, semiring=sr.name)
    overrides = {}
    for name in ("block_m", "block_n", "block_k"):
        if getattr(args, name) is not None:
            overrides[name] = getattr(args, name)
    if args.out_dtype:
        overrides["out_dtype"] = args.out_dtype
    if args.precision:
        overrides["precision"] = args.precision
    if overrides:
        cfg = cfg.replace(**overrides)
    chip = detect_chip()
    print(f"Executing {args.m}x{args.n}x{args.k} {args.dtype} {sr.name} "
          f"GEMM on {chip.name} ({jax.default_backend()})...")

    a, b = make_operands(args.m, args.n, args.k, args.dtype)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    fn = jax.jit(lambda x, y: matmul(x, y, semiring=sr, config=cfg,
                                     backend=args.backend))
    out = fn(aj, bj)
    jax.block_until_ready(out)

    secs = time_fn(fn, [(aj, bj)], iters=args.iters, warmup=1)
    gf = gflops(args.m, args.n, args.k, secs)
    peak = chip.peak_for(cfg.dtype) if sr.is_mxu else chip.vpu_ops
    print(f"Kernel executed in {secs:.6f} seconds, corresponding to a "
          f"performance of {gf:.1f} GOp/s ({percent_of_peak(gf, peak):.1f}% "
          f"of {chip.name} peak).")
    if args.power:
        # TDP-model estimate (no user-readable power telemetry on TPU).
        watts = chip.tdp_watts
        print(f"Estimated power: {watts:.0f} W (TDP model), corresponding to "
              f"{gf / watts:.2f} GOp/J.")

    if args.verify == "on":
        print("Verifying result...")
        exp = reference_matmul(a, b, semiring=sr.name)
        ok, err = check_result(np.asarray(out), exp)
        if ok:
            print(f"Results verified (max rel err {err:.3e} <= "
                  f"{tolerance_for(np.asarray(out).dtype):g}).")
            return 0
        print(f"VERIFICATION FAILED (max err {err:.3e}).")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
