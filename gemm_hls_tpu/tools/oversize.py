"""Out-of-HBM GEMM CLI — host-DRAM tile staging for problems larger than
device memory (BASELINE.json config #5; the HBM-level analogue of the
reference's DDR-to-BRAM outer-tile streaming, ``kernel/Memory.cpp``).

    python -m gemm_hls_tpu.tools.oversize --m 65536 --n 65536 --k 65536 \
        --dtype bfloat16 --tile 8192 [--verify-samples 8]

Allocates A, B, C in host DRAM (possibly > HBM in aggregate), streams
K-panels per stationary C host-tile via ``parallel.staging.streamed_matmul``,
reports effective GOp/s (including transfers), and spot-verifies random
output entries against a host dot product (full-oracle verification is
infeasible at these sizes, mirroring the reference benchmark's verify-off
mode, ``host/RunHardware.cpp:83-91``).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--m", type=int, default=32768)
    p.add_argument("--n", type=int, default=32768)
    p.add_argument("--k", type=int, default=32768)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--tile", type=int, default=8192,
                   help="host tile edge (tile_m = tile_n = tile_k)")
    p.add_argument("--semiring", default="plus_times")
    p.add_argument("--verify-samples", type=int, default=8,
                   help="number of random output entries to spot-check")
    args = p.parse_args(argv)

    from gemm_hls_tpu.ops.semiring import get_semiring
    from gemm_hls_tpu.parallel.staging import streamed_matmul
    from gemm_hls_tpu.utils.benchmark import gflops

    m, n, k = args.m, args.n, args.k
    d = np.dtype(args.dtype)
    sr = get_semiring(args.semiring)

    bytes_total = (m * k + k * n + m * n) * d.itemsize
    print(f"Allocating A({m}x{k}) B({k}x{n}) C({m}x{n}) {args.dtype} "
          f"= {bytes_total / 1e9:.1f} GB in host DRAM...")
    rng = np.random.default_rng(5)
    # Block-wise fill to avoid a transient f64 copy of the whole matrix.
    def fill(shape):
        out = np.empty(shape, dtype=d)
        step = max(1, (1 << 28) // (shape[1] * 8))
        for r0 in range(0, shape[0], step):
            r1 = min(shape[0], r0 + step)
            out[r0:r1] = rng.uniform(0.0, 1.0, (r1 - r0, shape[1])).astype(d)
        return out

    a = fill((m, k))
    b = fill((k, n))

    print(f"Streaming with host tiles {args.tile}^3...")
    t0 = time.perf_counter()
    c = streamed_matmul(a, b, semiring=sr.name, tile_m=args.tile,
                        tile_n=args.tile, tile_k=args.tile)
    dt = time.perf_counter() - t0
    gf = gflops(m, n, k, dt)
    print(f"Done in {dt:.1f} s -> {gf:.0f} GOp/s effective "
          f"(incl. host<->device staging)")

    ok = True
    for _ in range(args.verify_samples):
        i = int(rng.integers(0, m))
        j = int(rng.integers(0, n))
        row = a[i, :].astype(np.float64)
        col = b[:, j].astype(np.float64)
        exp = sr.np_reduce.reduce(sr.np_map(row, col))
        got = float(np.asarray(c[i, j], dtype=np.float64))
        rel = abs(got - exp) / max(abs(exp), 1e-30)
        status = "ok" if rel < 1e-2 else "MISMATCH"
        if status != "ok":
            ok = False
        print(f"  spot check C[{i},{j}]: got {got:.6g} exp {exp:.6g} "
              f"rel {rel:.2e} {status}")
    print("Spot verification:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
