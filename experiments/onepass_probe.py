"""Probe the one-pass causal row kernel vs the triangular-grid kernel and
the full-mask baseline at small/medium S.  Causal TF uses the live-flop
convention (4*B*S^2*D/2), so parity with the full-mask TF = perfect
dead-work skipping at the same engine rate."""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--configs", default=None,
                    help="bq:wq:w comma list for the one-pass kernel")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu.ops.attention import flash_attention
    from gemm_hls_tpu.utils.benchmark import time_fn

    B, S, D = args.b, args.s, args.d
    flops_c = 4 * B * S * S * D / 2
    flops_f = 4 * B * S * S * D
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    iters = max(20, int(3e12 / flops_c))

    # Full-mask baseline (autotuned blocks).
    full = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    tf = flops_f / time_fn(full, [(q, k, v)], iters=iters, warmup=1) / 1e12
    print(f"full(auto): {tf:.1f} TF")

    if args.configs:
        combos = [tuple(map(int, c.split(":")))
                  for c in args.configs.split(",")]
    else:
        combos = [(512, 256, 512), (512, 256, 256), (1024, 256, 512),
                  (1024, 128, 512), (1024, 256, 256), (512, 128, 512),
                  (min(2048, S), 256, 512), (1024, 512, 512)]
    seen = set()
    for bq, wq, w in combos:
        bq = min(bq, S)
        if (bq, wq, w) in seen:
            continue
        seen.add((bq, wq, w))
        fn = jax.jit(lambda q, k, v, bq=bq, wq=wq, w=w: flash_attention(
            q, k, v, causal=True, block_q=bq, block_kv=S,
            block_kv_compute=w, block_q_compute=wq))
        try:
            t = time_fn(fn, [(q, k, v)], iters=iters, warmup=1)
            print(f"onepass bq={bq} wq={wq} w={w}: "
                  f"{flops_c / t / 1e12:.1f} TF")
        except Exception as e:  # noqa: BLE001
            print(f"onepass bq={bq} wq={wq} w={w}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}")

    # Current shipping causal (autotuned -> tri tables or onepass).
    cur = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
    t = time_fn(cur, [(q, k, v)], iters=iters, warmup=1)
    print(f"causal(auto): {flops_c / t / 1e12:.1f} TF")


if __name__ == "__main__":
    main()
