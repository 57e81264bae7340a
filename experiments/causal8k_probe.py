"""S=8192 causal: whole-row-KV triangular blocks with a small q tile.

The autotuned S=8192 causal winner is the streamed triangular grid at
(block_q=512, block_kv=2048) = 131 TF live-flop (85.7% of same-S
full).  The one-pass kernel is compile-gated off at S_kv=8192, but the
candidate space never tried block_kv = S_kv on the *triangular* path
with a small block_q: one kv step per live row, edge sub-slab skipping
via block_kv_compute, no online carries — the one-pass benefits
without its unroll blowup.

Usage: python experiments/causal8k_probe.py [--b 4] [--s 8192]
"""

import argparse
import statistics
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--s", type=int, default=8192)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu.ops.attention import flash_attention
    from gemm_hls_tpu.utils.benchmark import time_fn

    B, S, D = args.b, args.s, args.d
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = (jax.random.normal(kq, (B, S, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    k = (jax.random.normal(kk, (B, S, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    v = (jax.random.normal(kv, (B, S, D), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    jax.block_until_ready((q, k, v))
    flops = 2.0 * B * S * S * D        # live-flop convention (causal)
    iters = max(8, int(6e12 / flops))

    cands = [
        (512, 2048, 512, None),        # shipping winner (control)
        (512, S, 512, None),
        (512, S, 1024, None),
        (1024, S, 512, None),
        (1024, S, 1024, None),
        (256, S, 512, None),
    ]
    for bq, bkv, bkvc, bqc in cands:
        fn = jax.jit(lambda q, k, v, bq=bq, bkv=bkv, bkvc=bkvc, bqc=bqc:
                     flash_attention(q, k, v, causal=True, block_q=bq,
                                     block_kv=bkv, block_kv_compute=bkvc,
                                     block_q_compute=bqc))
        try:
            ts = [time_fn(fn, [(q, k, v)], iters=iters, warmup=1)
                  for _ in range(args.rounds)]
            tf = flops / statistics.median(ts) / 1e12
            print(f"bq={bq} bkv={bkv} bkvc={bkvc}: {tf:6.1f} TF "
                  f"({flops/max(ts)/1e12:.1f}-{flops/min(ts)/1e12:.1f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bkv={bkv} bkvc={bkvc}: FAIL "
                  f"{type(e).__name__} {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
