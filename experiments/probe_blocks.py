"""Hand-probe block configs for one GEMM shape against XLA's dot.

Usage: python experiments/probe_blocks.py M N K bm,bn,bk [bm,bn,bk ...]
Prints per-config median-of-3 GFLOP/s (peak-sane) and the XLA baseline.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.models.perf_model import detect_chip
from gemm_hls_tpu.utils.benchmark import time_fn


def median3(fn, args, flops, peak_gf, iters=8):
    vals = []
    for _ in range(3):
        gf = flops / time_fn(fn, [args], iters=iters) / 1e9
        if gf > peak_gf:
            gf = flops / time_fn(fn, [args], iters=iters) / 1e9
        if gf <= peak_gf:
            vals.append(gf)
    return sorted(vals)[len(vals) // 2] if vals else None


def main():
    m, n, k = (int(x) for x in sys.argv[1:4])
    cands = [tuple(int(v) for v in s.split(",")) for s in sys.argv[4:]]
    chip = detect_chip()
    peak_gf = chip.peak_for("bfloat16") / 1e9
    ka, kb = jax.random.split(jax.random.PRNGKey(5))
    a = jax.random.uniform(ka, (m, k), jnp.bfloat16, 1, 10)
    b = jax.random.uniform(kb, (k, n), jnp.bfloat16, 1, 10)
    jax.block_until_ready((a, b))
    flops = 2 * m * n * k

    xla = jax.jit(lambda x, y: jnp.dot(x, y))
    gf_x = median3(xla, (a, b), flops, peak_gf)
    print(f"xla: {gf_x/1e3:7.1f} TF", flush=True)

    for bm, bn, bk in cands:
        try:
            cfg = GemmConfig(dtype="bfloat16", block_m=bm, block_n=bn,
                             block_k=bk,
                             vmem_limit_bytes=110 * 1024 * 1024)
            cfg.validate()
            fn = jax.jit(lambda x, y, c=cfg: matmul(x, y, config=c))
            gf = median3(fn, (a, b), flops, peak_gf)
            print(f"({bm:5d},{bn:5d},{bk:5d}): {gf/1e3:7.1f} TF  "
                  f"ratio {gf/gf_x:.3f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"({bm},{bn},{bk}): FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
