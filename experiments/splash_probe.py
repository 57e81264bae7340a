"""What does the official splash-attention kernel achieve for causal
attention on this chip?  Calibration only — establishes the realistic
causal ceiling for the v5e before we chase the VERDICT's 85% target.

Usage: python experiments/splash_probe.py [--b 16 --s 2048 --d 128]
"""

import argparse
import statistics
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    from gemm_hls_tpu.utils.benchmark import time_fn

    B, S, D = args.b, args.s, args.d
    flops = 4 * B * S * S * D / 2
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)

    configs = [
        dict(block_q=512, block_kv=512, block_kv_compute=512),
        dict(block_q=512, block_kv=1024, block_kv_compute=512),
        dict(block_q=512, block_kv=2048, block_kv_compute=512),
        dict(block_q=256, block_kv=512, block_kv_compute=256),
        dict(block_q=1024, block_kv=1024, block_kv_compute=512),
        dict(block_q=512, block_kv=1024, block_kv_compute=256),
    ]
    mask = sm.MultiHeadMask(
        [sm.CausalMask((S, S)) for _ in range(B)])
    iters = max(30, int(2e12 / flops))
    for cfgd in configs:
        try:
            bs = sk.BlockSizes(
                block_q=cfgd["block_q"], block_kv=cfgd["block_kv"],
                block_kv_compute=cfgd["block_kv_compute"],
                block_q_dkv=cfgd["block_q"], block_kv_dkv=cfgd["block_kv"],
                block_kv_dkv_compute=cfgd["block_kv_compute"],
                block_q_dq=cfgd["block_q"], block_kv_dq=cfgd["block_kv"])
            fn = jax.jit(sk.make_splash_mha(
                mask, head_shards=1, q_seq_shards=1, block_sizes=bs))
            out = fn(q, k, v)
            jax.block_until_ready(out)
            samples = []
            for _ in range(args.rounds):
                t = time_fn(fn, [(q, k, v)], iters=iters)
                samples.append(flops / t / 1e12)
            print(f"{cfgd}: {statistics.median(samples):.1f} TF "
                  f"(range {min(samples):.1f}-{max(samples):.1f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{cfgd}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
