"""Batched (3-D) GEMM suite vs XLA's batched dot (one chip).

The 3-D form dispatches a vmapped Pallas kernel (batch becomes a leading
grid dimension — one launch for the whole batch).  XLA's batched dot
degrades sharply as the per-example GEMM shrinks (launch/layout overhead);
the vmapped kernel keeps the MXU busy.  Writes
artifacts/batched_shapes_<chip>.csv.
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
    # (B, M, N, K, label)
    (16, 2048, 2048, 2048, "batched mid (16x2048^3)"),
    (64, 512, 512, 512, "batched small (64x512^3)"),
    (256, 128, 128, 128, "per-head attention (256x128^3)"),
    (32, 1024, 1024, 128, "per-head scores (seq x seq, hd=128)"),
]


def main():
    chip = detect_chip()
    peak_gf = chip.peak_for("bfloat16") / 1e9
    out = f"artifacts/batched_shapes_{chip.name}.csv"
    fields = ["label", "b", "m", "n", "k", "pallas_gflops", "xla_gflops",
              "ratio"]
    with open(out, "w", newline="") as f:
        csv.DictWriter(f, fieldnames=fields).writeheader()

    def emit(row):
        with open(out, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=fields).writerow(row)

    for bsz, m, n, k, label in SHAPES:
        ka, kb = jax.random.split(jax.random.PRNGKey(5))
        a = jax.random.uniform(ka, (bsz, m, k), jnp.bfloat16, 1, 10)
        b = jax.random.uniform(kb, (bsz, k, n), jnp.bfloat16, 1, 10)
        jax.block_until_ready((a, b))
        flops = 2 * bsz * m * n * k
        # Small batches finish in ~0.1 ms: scale the slope's iteration
        # count so each measurement integrates >= ~1.5 TFLOP (~10 ms of
        # device work), otherwise the multi-ms RTT jitter swamps the
        # slope (same protocol as autotune_batched; at 20 iters the
        # 64x512^3 row once read XLA at 189 TF — pure transport noise).
        iters = max(6, min(1000, int(1.5e12 / flops)))
        ours = jax.jit(lambda x, y: matmul(x, y))
        xla = jax.jit(lambda x, y: jnp.einsum("bmk,bkn->bmn", x, y))
        gf_p, gf_x = interleaved_medians((ours, xla), (a, b), flops,
                                         peak_gf, iters=iters)
        emit(dict(label=label, b=bsz, m=m, n=n, k=k,
                  pallas_gflops=round(gf_p, 1), xla_gflops=round(gf_x, 1),
                  ratio=round(gf_p / gf_x, 3)))
        print(f"{label:38s}: pallas {gf_p/1e3:6.1f} TF  xla {gf_x/1e3:6.1f} "
              f"TF  ratio {gf_p/gf_x:.3f}", flush=True)

    # Consumer-matched thin-K scores: both sides compute and materialize
    # softmax(q.k^T/sqrt(d)) — XLA fuses the softmax into its dot (this is
    # how it beats the write-included roofline on the bare GEMM); our side
    # fuses it as the batched kernel's epilogue.  FLOP count is the GEMM's
    # (softmax flops excluded on both sides equally).
    from gemm_hls_tpu.ops.attention import attention_scores

    bsz, seq, hd = 32, 1024, 128
    kq, kk = jax.random.split(jax.random.PRNGKey(7))
    q = jax.random.uniform(kq, (bsz, seq, hd), jnp.bfloat16, -1, 1)
    kmat = jax.random.uniform(kk, (bsz, seq, hd), jnp.bfloat16, -1, 1)
    jax.block_until_ready((q, kmat))
    flops = 2 * bsz * seq * seq * hd
    scale = 1.0 / float(jnp.sqrt(jnp.float32(hd)))
    ours = jax.jit(lambda x, y: attention_scores(x, y))
    xla = jax.jit(lambda x, y: jax.nn.softmax(
        jnp.einsum("bqd,bkd->bqk", x, y) * scale, axis=-1).astype(x.dtype))
    gf_p, gf_x = interleaved_medians((ours, xla), (q, kmat), flops, peak_gf,
                                     iters=max(30, min(1000,
                                                       int(1.5e12 / flops))))
    label = "scores+softmax fused (32x1024^2x128)"
    emit(dict(label=label, b=bsz, m=seq, n=seq, k=hd,
              pallas_gflops=round(gf_p, 1), xla_gflops=round(gf_x, 1),
              ratio=round(gf_p / gf_x, 3)))
    print(f"{label:38s}: pallas {gf_p/1e3:6.1f} TF  xla {gf_x/1e3:6.1f} "
          f"TF  ratio {gf_p/gf_x:.3f}", flush=True)

    # End-to-end attention: softmax(q.k^T/sqrt(d)).v — the consumer the
    # scores actually feed.  Here nothing can be elided on either side
    # (the (B,S,D) output is real), making this the robust consumer-
    # matched comparison; the isolated scores row above is bounded by the
    # write-included roofline and XLA's side of it swings with what the
    # fusion elides.  Also measured: jax.nn.dot_product_attention (XLA
    # composition on TPU).
    from gemm_hls_tpu.ops.attention import attention

    kv2 = jax.random.PRNGKey(11)
    v = jax.random.uniform(kv2, (bsz, seq, hd), jnp.bfloat16, -1, 1)
    jax.block_until_ready(v)
    flops = 2 * 2 * bsz * seq * seq * hd

    ours_attn = jax.jit(lambda q, k, v: attention(q, k, v))

    def xla_comp(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        return jnp.einsum("bqk,bkd->bqd",
                          jax.nn.softmax(s, axis=-1).astype(q.dtype), v)

    dpa = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(
        jnp.swapaxes(q, 0, 1)[None], jnp.swapaxes(k, 0, 1)[None],
        jnp.swapaxes(v, 0, 1)[None])[0].swapaxes(0, 1))
    gf_p, gf_x, gf_d = interleaved_medians(
        (ours_attn, jax.jit(xla_comp), dpa), (q, kmat, v), flops, peak_gf,
        iters=max(20, min(1000, int(1.5e12 / flops))))
    label = "attention e2e (32 heads, 1024, hd=128)"
    emit(dict(label=label, b=bsz, m=seq, n=seq, k=hd,
              pallas_gflops=round(gf_p, 1), xla_gflops=round(gf_x, 1),
              ratio=round(gf_p / gf_x, 3)))
    print(f"{label:38s}: pallas {gf_p/1e3:6.1f} TF  xla {gf_x/1e3:6.1f} "
          f"TF  ratio {gf_p/gf_x:.3f}  (dot_product_attention "
          f"{gf_d/1e3:.1f} TF, ratio {gf_p/gf_d:.3f})", flush=True)
    print("wrote", out)


if __name__ == "__main__":
    main()
