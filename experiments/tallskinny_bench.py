"""Tall-skinny (tokens × ffn-in) block sweep vs XLA (VERDICT r2 rect row).

16384×8192×1024 is the one rect-suite shape still quoted at 0.983× XLA
(docs/BENCHMARKS.md).  K=1024 fits a single block (grid K-dim = 1, the
scratch-free single-dot branch), so the sweep is over output-tile
geometry only — the question is how the (M=16384) long axis wants to be
cut against the (N=8192) wide axis.

Usage: python experiments/tallskinny_bench.py
Writes artifacts/tallskinny_blocks_<chip>.csv.
"""
import csv
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.models.perf_model import detect_chip
from gemm_hls_tpu.utils.benchmark import interleaved_medians

VMEM = 110 * 1024 * 1024
M, N, K = 16384, 8192, 1024


def main():
    chip = detect_chip()
    peak_gf = chip.peak_for("bfloat16") / 1e9
    ka, kb = jax.random.split(jax.random.PRNGKey(5))
    a = jax.random.uniform(ka, (M, K), jnp.bfloat16, 1, 10)
    b = jax.random.uniform(kb, (K, N), jnp.bfloat16, 1, 10)
    jax.block_until_ready((a, b))
    flops = 2 * M * N * K

    xla = jax.jit(lambda x, y: jnp.dot(x, y))

    combos = [
        (1024, 2048, 1024),   # current seeded winner (0.983 capture)
        (2048, 1024, 1024),
        (2048, 2048, 1024),
        (512, 2048, 1024),
        (4096, 1024, 1024),
        (1024, 4096, 1024),
        (512, 4096, 1024),
        (2048, 4096, 1024),
        (4096, 2048, 1024),
        (512, 1024, 1024),
        (8192, 1024, 1024),
        (1024, 8192, 1024),
    ]
    out = f"artifacts/tallskinny_blocks_{chip.name}.csv"
    fields = ["block_m", "block_n", "block_k", "pallas_gflops",
              "xla_gflops", "ratio"]
    with open(out, "w", newline="") as f:
        csv.DictWriter(f, fieldnames=fields).writeheader()

    for bm, bn, bk in combos:
        try:
            cfg = GemmConfig(dtype="bfloat16", block_m=bm, block_n=bn,
                             block_k=bk, vmem_limit_bytes=VMEM)
            cfg.validate()
            ours = jax.jit(lambda x, y, c=cfg: matmul(x, y, config=c))
            gf_p, gf_x = interleaved_medians((ours, xla), (a, b), flops,
                                             peak_gf, iters=8)
            row = dict(block_m=bm, block_n=bn, block_k=bk,
                       pallas_gflops=round(gf_p, 1),
                       xla_gflops=round(gf_x, 1),
                       ratio=round(gf_p / gf_x, 3))
            with open(out, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=fields).writerow(row)
            print(f"TS ({bm:5d},{bn:4d},{bk:4d}): ours {gf_p/1e3:6.1f} TF  "
                  f"xla {gf_x/1e3:6.1f} TF  ratio {gf_p/gf_x:.3f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"TS ({bm},{bn},{bk}): FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    print("wrote", out)


if __name__ == "__main__":
    main()
