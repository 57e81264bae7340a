"""Fused attention scores: softmax(Q.K^T/sqrt(d)) computed *inside* the
batched CA-GEMM kernel's store, plus the full attention product.

The thin-K scores shape (B=heads, M=N=seq, K=head_dim) is where a
standalone GEMM kernel cannot match XLA: XLA fuses the softmax consumer
into the dot and never writes the raw scores to HBM (see
docs/BENCHMARKS.md "thin-K baselines").  ``attention_scores`` performs
the same fusion with the framework's epilogue mechanism — the row
softmax runs on the f32 accumulator inside the kernel, legal because the
batched kernel keeps each example's full score row in VMEM.

    python examples/11_attention_scores.py

On a real chip, ``experiments/batched_bench.py`` measures this shape
consumer-matched against XLA's fused softmax(QK^T).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu.ops.attention import attention, attention_scores

HEADS, SEQ, D_HEAD = 4, 256, 64
DTYPE = jnp.float32


def main():
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.uniform(kq, (HEADS, SEQ, D_HEAD), DTYPE, -1, 1)
    k = jax.random.uniform(kk, (HEADS, SEQ, D_HEAD), DTYPE, -1, 1)
    v = jax.random.uniform(kv, (HEADS, SEQ, D_HEAD), DTYPE, -1, 1)

    # --- fused scores: softmax runs inside the batched kernel ---
    p = attention_scores(q, k)
    rows = np.asarray(jnp.sum(p, axis=-1))
    print(f"scores {p.shape}: rows sum to 1 within "
          f"{np.abs(rows - 1.0).max():.2e}")

    # verify against the unfused composition
    s = jnp.einsum("bqd,bkd->bqk", q, k) / math.sqrt(D_HEAD)
    ref = jax.nn.softmax(s, axis=-1)
    err = float(jnp.abs(p - ref).max())
    print(f"fused vs unfused softmax max abs diff: {err:.2e}")
    assert err < 1e-5

    # --- full attention: two batched GEMMs, softmax fused in the first ---
    out = attention(q, k, v)
    ref_out = jnp.einsum("bqk,bkd->bqd", ref, v)
    err = float(jnp.abs(out - ref_out).max())
    print(f"attention {out.shape}: max abs diff vs reference {err:.2e}")
    assert err < 1e-4

    # --- and it trains: gradients flow through the fused softmax ---
    loss = lambda q: jnp.sum(attention(q, k, v) ** 2)  # noqa: E731
    g = jax.grad(loss)(q)
    print(f"dL/dq {g.shape}: finite={bool(jnp.isfinite(g).all())}")


if __name__ == "__main__":
    main()
