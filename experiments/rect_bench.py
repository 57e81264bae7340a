"""Rectangular / real-workload GEMM suite vs XLA's dot (one chip).

The square 8192^3 headline hides shape effects: LLM-style projections are
tall-skinny (M = tokens, K/N = model dims), attention scores are wide-K,
and classifier heads are wide-N.  This captures pallas-vs-XLA across such
shapes with the autotune-seeded default config, writing
artifacts/rect_shapes_<chip>.csv.
"""
import csv
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gemm_hls_tpu import matmul
from gemm_hls_tpu.models.perf_model import detect_chip
from gemm_hls_tpu.utils.benchmark import interleaved_medians

SHAPES = [
    # (M, N, K, label)
    (8192, 8192, 8192, "square-8192"),
    (16384, 8192, 1024, "tall-skinny (tokens x ffn-in)"),
    (16384, 1024, 8192, "tall narrow-out (ffn-out)"),
    (4096, 14336, 4096, "llama-70b mlp up"),
    (4096, 4096, 14336, "llama-70b mlp down"),
    (32768, 2048, 2048, "long-batch qkv"),
    (2048, 2048, 32768, "wide-K reduction"),
    (1024, 65536, 1024, "wide-N head"),
    (8000, 8000, 8000, "unaligned square"),
    (8192, 8192, 7999, "unaligned K"),
]


def main():
    import os

    sel = os.environ.get("RECT_SHAPES", ":")
    lo, hi = sel.split(":")
    shapes = SHAPES[int(lo) if lo else 0:int(hi) if hi else len(SHAPES)]
    append = os.environ.get("RECT_APPEND", "") == "1"
    chip = detect_chip()
    peak_gf = chip.peak_for("bfloat16") / 1e9
    out = f"artifacts/rect_shapes_{chip.name}.csv"
    fields = ["label", "m", "n", "k", "pallas_gflops", "xla_gflops", "ratio"]
    if not append:
        with open(out, "w", newline="") as f:
            csv.DictWriter(f, fieldnames=fields).writeheader()

    def emit(row):
        # Incremental append: a killed run keeps its finished rows.
        with open(out, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=fields).writerow(row)

    for m, n, k, label in shapes:
        ka, kb = jax.random.split(jax.random.PRNGKey(5))
        a = jax.random.uniform(ka, (m, k), jnp.bfloat16, 1, 10)
        b = jax.random.uniform(kb, (k, n), jnp.bfloat16, 1, 10)
        jax.block_until_ready((a, b))
        flops = 2 * m * n * k
        try:
            ours = jax.jit(lambda x, y: matmul(x, y))
            xla = jax.jit(lambda x, y: jnp.dot(x, y))
            # Interleaved median-of-3 with peak-sanity retries — the
            # shared suite protocol (utils/benchmark.interleaved_medians).
            gf_p, gf_x = interleaved_medians((ours, xla), (a, b), flops,
                                             peak_gf)
            emit(dict(label=label, m=m, n=n, k=k,
                      pallas_gflops=round(gf_p, 1),
                      xla_gflops=round(gf_x, 1),
                      ratio=round(gf_p / gf_x, 3)))
            print(f"{label:36s} {m}x{n}x{k}: pallas {gf_p/1e3:7.1f} TF  "
                  f"xla {gf_x/1e3:7.1f} TF  ratio {gf_p/gf_x:.3f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            emit(dict(label=label, m=m, n=n, k=k, pallas_gflops=None,
                      xla_gflops=None, ratio=None))
    print("wrote", out)


if __name__ == "__main__":
    main()
