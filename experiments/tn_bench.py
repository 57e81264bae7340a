"""TN-layout (transpose_a) block sweep vs XLA (VERDICT r2 #5).

The custom-VJP backward pass issues exactly the TN layout (da = g.op(B)^T
computes op(A)^T.g as TN), which round 2 measured at 0.97x XLA at 8192^3.
With ``transpose_a`` the kernel reads A as (K, M) via a BlockSpec index
map, and block_m lands on the *lane* dimension (must be %128) — a
different geometry from the NN winner, so the NN-tuned blocks need not be
optimal.  Sweep TN-specific blocks and report the winner for the seed's
tn-layout bucket.

Usage: python experiments/tn_bench.py [N]
Writes artifacts/tn_blocks_<chip>.csv.
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    chip = detect_chip()
    peak_gf = chip.peak_for("bfloat16") / 1e9
    ka, kb = jax.random.split(jax.random.PRNGKey(5))
    # TN: a arrives K-major (K, M).
    a = jax.random.uniform(ka, (n, n), jnp.bfloat16, 1, 10)
    b = jax.random.uniform(kb, (n, n), jnp.bfloat16, 1, 10)
    jax.block_until_ready((a, b))
    flops = 2 * n * n * n

    xla = jax.jit(lambda x, y: jnp.dot(x.T, y))

    combos = [
        (512, 1024, 8192),   # NN headline winner, TN-legal (512 % 128 == 0)
        (1024, 512, 8192),
        (256, 1024, 8192),
        (128, 2048, 8192),
        (512, 512, 8192),
        (512, 1024, 4096),
        (1024, 1024, 2048),
        (256, 2048, 4096),
        (2048, 512, 2048),
    ]
    out = f"artifacts/tn_blocks_{chip.name}.csv"
    fields = ["block_m", "block_n", "block_k", "pallas_gflops", "xla_gflops",
              "ratio"]
    with open(out, "w", newline="") as f:
        csv.DictWriter(f, fieldnames=fields).writeheader()

    for bm, bn, bk in combos:
        try:
            cfg = GemmConfig(dtype="bfloat16", transpose_a=True,
                             block_m=bm, block_n=bn, block_k=bk,
                             vmem_limit_bytes=VMEM)
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
            print(f"TN ({bm:4d},{bn:4d},{bk:4d}): ours {gf_p/1e3:6.1f} TF  "
                  f"xla {gf_x/1e3:6.1f} TF  ratio {gf_p/gf_x:.3f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"TN ({bm},{bn},{bk}): FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    print("wrote", out)


if __name__ == "__main__":
    main()
