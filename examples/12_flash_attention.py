"""Flash attention: the whole softmax(Q·Kᵀ/√d)·V in ONE Pallas kernel.

Where example 11 fuses the softmax into the scores GEMM but still
round-trips the (S, S) probability matrix through HBM before the PV
GEMM, ``flash_attention`` streams KV blocks through VMEM with an
online-softmax recurrence — the probabilities never exist in HBM at
all, for the forward *or* the backward (the custom VJP recomputes score
blocks from the saved per-row log-sum-exp: ``ops/pallas_flash.py``).

HBM traffic drops from O(S²) to O(S·D), which lifts the workload off
the bandwidth roofline: measured 123 TF at 32 heads × 1024² × 128 bf16
vs 73 TF for the fused-scores path and 44 TF for
``jax.nn.dot_product_attention`` (docs/BENCHMARKS.md).

    python examples/12_flash_attention.py

On a real chip, ``experiments/flash_bench.py`` measures this
consumer-matched against XLA and the fused-scores path.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu.ops.attention import attention, flash_attention

HEADS, SEQ, D_HEAD = 4, 256, 64
DTYPE = jnp.float32


def main():
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((HEADS, SEQ, D_HEAD)), DTYPE)
    k = jnp.asarray(rng.standard_normal((HEADS, SEQ, D_HEAD)), DTYPE)
    v = jnp.asarray(rng.standard_normal((HEADS, SEQ, D_HEAD)), DTYPE)

    # --- bidirectional: must match the two-kernel fused-scores path ---
    o_flash = flash_attention(q, k, v, block_q=128, block_kv=128)
    o_ref = attention(q, k, v)
    err = float(jnp.max(jnp.abs(o_flash - o_ref)))
    print(f"flash vs fused-scores path {o_flash.shape}: max abs diff "
          f"{err:.2e}")
    assert err < 1e-4

    # --- causal: future positions carry exactly zero weight -----------
    o_causal = flash_attention(q, k, v, causal=True, block_q=128,
                               block_kv=128)
    s = jnp.einsum("bqd,bkd->bqk", q, k) / math.sqrt(D_HEAD)
    s = jnp.where(jnp.tril(jnp.ones((SEQ, SEQ), bool)), s, -jnp.inf)
    o_causal_ref = jnp.einsum(
        "bqk,bkd->bqd", jax.nn.softmax(s, axis=-1), v)
    err = float(jnp.max(jnp.abs(o_causal - o_causal_ref)))
    print(f"causal flash vs masked reference: max abs diff {err:.2e}")
    assert err < 1e-4

    # --- training: gradients through the flash backward kernels -------
    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=128,
                                       block_kv=128) ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k) / math.sqrt(D_HEAD)
        s = jnp.where(jnp.tril(jnp.ones((SEQ, SEQ), bool)), s, -jnp.inf)
        return jnp.sum(
            jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s, -1), v) ** 2)

    gq, gk, gv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in (("dq", dq, gq), ("dk", dk, gk), ("dv", dv, gv)):
        e = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        print(f"flash backward {name}: rel err vs autodiff {e:.2e}")
        assert e < 1e-3

    print("OK")



def serving_features():
    """The serving/training mask surface, all in the same kernel."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((HEADS, SEQ, D_HEAD)), DTYPE)
    k = jnp.asarray(rng.standard_normal((HEADS, SEQ, D_HEAD)), DTYPE)
    v = jnp.asarray(rng.standard_normal((HEADS, SEQ, D_HEAD)), DTYPE)

    # Sliding window (Mistral-style): O(S*window*D) work.
    o_win = flash_attention(q, k, v, causal=True, window=64,
                            block_q=64, block_kv=64)
    print(f"sliding-window(64) causal: {o_win.shape}")

    # Logit soft-cap (Gemma-style).
    o_cap = flash_attention(q, k, v, causal=True, logit_cap=30.0,
                            block_q=128, block_kv=128)
    print(f"logit soft-cap(30): {o_cap.shape}")

    # Packed sequences: two documents per row, causal within each.
    seg = np.zeros((HEADS, SEQ), np.int32)
    seg[:, SEQ // 2:] = 1
    o_packed = flash_attention(q, k, v, causal=True,
                               q_segment_ids=jnp.asarray(seg),
                               kv_segment_ids=jnp.asarray(seg),
                               block_q=64, block_kv=64)
    print(f"packed causal (2 segments): {o_packed.shape}")

    # Padded-cache decode: Sq=1 queries, per-example cache lengths, GQA
    # (4 q heads per kv head).
    qd = jnp.asarray(rng.standard_normal((8, 1, D_HEAD)), DTYPE)
    kc = jnp.asarray(rng.standard_normal((2, SEQ, D_HEAD)), DTYPE)
    vc = jnp.asarray(rng.standard_normal((2, SEQ, D_HEAD)), DTYPE)
    lens = jnp.asarray(np.array([100, SEQ], np.int32))
    o_dec = flash_attention(qd, kc, vc, kv_lengths=lens, block_q=8,
                            block_kv=64)
    print(f"GQA decode vs padded cache (lens {list(map(int, lens))}): "
          f"{o_dec.shape}")
    print("serving features OK")


if __name__ == "__main__":
    main()
    serving_features()
