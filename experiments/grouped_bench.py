"""Grouped (ragged) MoE GEMM benchmark: ours vs jax.lax.ragged_dot vs the
dense-dot bound, across routing distributions and MoE-shaped problems.

Writes artifacts/grouped_v5e.csv.  Run on the real chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/grouped_bench.py
"""

import csv
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.grouped import grouped_matmul
from gemm_hls_tpu.utils.benchmark import time_fn

SHAPES = [
    # (m, k, n, G, label)  — MoE FFN shapes (tokens x d_model x d_ff)
    (8192, 2048, 8192, 8, "ffn-8k-tokens"),
    (4096, 4096, 4096, 8, "ffn-square"),
    (8192, 2048, 8192, 16, "ffn-16-experts"),
    (2048, 2048, 8192, 8, "ffn-small-batch"),
]

ROUTINGS = ["even", "skewed", "one_hot"]


def routing(kind, m, G, rng):
    if kind == "even":
        gs = [m // G] * G
    elif kind == "skewed":
        # Zipf-ish: expert popularity follows 1/rank.
        w = 1.0 / np.arange(1, G + 1)
        gs = np.floor(m * w / w.sum()).astype(int)
        gs[0] += m - gs.sum()
    else:  # one expert gets everything
        gs = [m] + [0] * (G - 1)
    return list(map(int, gs))


def main():
    rng = np.random.default_rng(5)
    rows = []
    for m, k, n, G, label in SHAPES:
        flops = 2 * m * k * n
        lhs = jnp.asarray(rng.uniform(-1, 1, (m, k)), jnp.bfloat16)
        rhs = jnp.asarray(rng.uniform(-1, 1, (G, k, n)), jnp.bfloat16)
        # dense bound: same per-row work through one dense dot
        d = jax.jit(lambda a, b: jnp.dot(a, b,
                                         preferred_element_type=jnp.bfloat16))
        t = time_fn(d, [(lhs, rhs[0])], iters=5)
        dense_tf = flops / t / 1e12
        for kind in ROUTINGS:
            gs = jnp.asarray(routing(kind, m, G, rng), jnp.int32)
            cfg = GemmConfig(dtype="bfloat16", out_dtype="bfloat16",
                             block_m=512, block_n=1024, block_k=2048)
            f = jax.jit(lambda a, b, g, cfg=cfg: grouped_matmul(a, b, g, cfg))
            t = time_fn(f, [(lhs, rhs, gs)], iters=5)
            ours_tf = flops / t / 1e12
            rd = jax.jit(lambda a, b, g: jax.lax.ragged_dot(
                a, b, g, preferred_element_type=jnp.bfloat16))
            t = time_fn(rd, [(lhs, rhs, gs)], iters=5)
            xla_tf = flops / t / 1e12
            row = dict(label=label, m=m, k=k, n=n, G=G, routing=kind,
                       ours_tf=round(ours_tf, 1), ragged_dot_tf=round(xla_tf, 1),
                       dense_bound_tf=round(dense_tf, 1),
                       vs_ragged=round(ours_tf / xla_tf, 3),
                       pct_dense=round(100 * ours_tf / dense_tf, 1))
            rows.append(row)
            print(row, flush=True)
    with open("artifacts/grouped_v5e.csv", "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print("wrote artifacts/grouped_v5e.csv")


if __name__ == "__main__":
    main()
