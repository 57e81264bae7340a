"""Grouped (ragged) MoE GEMM benchmark: ours vs jax.lax.ragged_dot vs the
dense-dot bound, across routing distributions and MoE-shaped problems.

Writes artifacts/grouped_v5e.csv.  Run on the real chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/grouped_bench.py

Timing protocol: on-device slope (utils.benchmark.time_fn) with the
iteration count scaled so each measurement integrates >= ~1.5 TFLOP of
device work, median of 3 rounds, and physically-impossible readings
(above the bf16 engine peak) re-measured then discarded — the same
discipline as tools/autotune.py.  With 5 fixed iterations the sub-ms
shapes produced readings like 824 TF (4x the chip's peak).
"""

import csv
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from gemm_hls_tpu.config import GemmConfig, cdiv
from gemm_hls_tpu.models.perf_model import detect_chip
from gemm_hls_tpu.ops.grouped import grouped_matmul
from gemm_hls_tpu.utils.benchmark import time_fn

ARTIFACTS = Path(__file__).resolve().parent.parent / "artifacts"

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


def sched_tile_visits(gs, bm):
    """MXU tile-visits the logical-tile schedule performs for this routing.

    Each nonempty group costs ceil over its row span at bm granularity;
    boundary tiles are visited once per straddling group.  The
    tile-granular achievable bound is dense_peak * m / (visits * bm)."""
    visits = 0
    start = 0
    for s in gs:
        if s > 0:
            visits += cdiv(start + s, bm) - start // bm
        start += s
    total = start
    m_tiles_tail = 0  # virtual tail group rows are zero-filled, no MXU work
    return max(visits + m_tiles_tail, 1)


def timed_tf(fn, args, flops, ceiling_tf, retries=2):
    """TF/s from one slope measurement (time_fn medians 3 slopes on the
    same compiled loops); readings above the physical ceiling are
    re-measured with the most conservative sample kept.  The iteration
    count integrates >= ~6 TFLOP per endpoint so the work delta between
    the two timed loops (tens of ms) dwarfs the relay's RTT jitter —
    with 5 fixed iterations this suite produced readings up to 4x the
    chip's bf16 peak."""
    iters = max(8, min(1000, int(6e12 / max(flops, 1))))
    tf = flops / time_fn(fn, [args], iters=iters) / 1e12
    while ceiling_tf and tf > ceiling_tf and retries:
        retries -= 1
        tf = min(tf, flops / time_fn(fn, [args], iters=iters) / 1e12)
    return tf


def main():
    rng = np.random.default_rng(5)
    try:
        ceiling = (detect_chip().peak_for("bfloat16") or 0) / 1e12  # TF/s
    except Exception:  # noqa: BLE001 — unknown chip: no ceiling filter
        ceiling = 0
    rows = []
    for m, k, n, G, label in SHAPES:
        flops = 2 * m * k * n
        lhs = jnp.asarray(rng.uniform(-1, 1, (m, k)), jnp.bfloat16)
        rhs = jnp.asarray(rng.uniform(-1, 1, (G, k, n)), jnp.bfloat16)
        # dense bound: same per-row work through one dense dot
        d = jax.jit(lambda a, b: jnp.dot(a, b,
                                         preferred_element_type=jnp.bfloat16))
        dense_tf = timed_tf(d, (lhs, rhs[0]), flops, ceiling)
        for kind in ROUTINGS:
            gs_list = routing(kind, m, G, rng)
            gs = jnp.asarray(gs_list, jnp.int32)
            cfg = GemmConfig(dtype="bfloat16", out_dtype="bfloat16",
                             block_m=512, block_n=1024, block_k=2048)
            bm = min(cfg.block_m, m)
            sched_tf = dense_tf * m / (sched_tile_visits(gs_list, bm) * bm)
            f = jax.jit(lambda a, b, g, cfg=cfg: grouped_matmul(a, b, g, cfg))
            ours_tf = timed_tf(f, (lhs, rhs, gs), flops, ceiling)
            rd = jax.jit(lambda a, b, g: jax.lax.ragged_dot(
                a, b, g, preferred_element_type=jnp.bfloat16))
            xla_tf = timed_tf(rd, (lhs, rhs, gs), flops, ceiling)
            row = dict(label=label, m=m, k=k, n=n, G=G, routing=kind,
                       ours_tf=round(ours_tf, 1),
                       ragged_dot_tf=round(xla_tf, 1),
                       dense_bound_tf=round(dense_tf, 1),
                       sched_bound_tf=round(sched_tf, 1),
                       vs_ragged=round(ours_tf / xla_tf, 3),
                       pct_dense=round(100 * ours_tf / dense_tf, 1),
                       pct_sched=round(100 * ours_tf / sched_tf, 1))
            rows.append(row)
            print(row, flush=True)
    out = ARTIFACTS / "grouped_v5e.csv"
    with open(out, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
