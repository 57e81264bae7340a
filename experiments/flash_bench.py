"""Flash-attention bench: one-kernel streaming softmax(QKᵀ)V vs the
fused-scores two-kernel path, XLA's composition, and
jax.nn.dot_product_attention, at the per-head attention shape.

All four sides produce the real (B, S, D) output — no elision possible
(the consumer-matched protocol from docs/BENCHMARKS.md).  Interleaved
median-of-3 per implementation.

Usage: python experiments/flash_bench.py [--causal] [--csv out.csv]
"""

import argparse
import math
import statistics
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--blocks", default=None,
                    help="comma list of bq:bkv pairs to sweep, e.g. "
                    "256:1024,512:512")
    ap.add_argument("--grad", action="store_true",
                    help="benchmark the full fwd+bwd step (value_and_grad "
                    "wrt q, k, v) instead of the forward")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu.ops.attention import attention, flash_attention
    from gemm_hls_tpu.utils.benchmark import time_fn

    B, S, D = args.b, args.s, args.d
    flops = 4 * B * S * S * D / (2 if args.causal else 1)
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    scale = 1.0 / math.sqrt(D)

    def xla_comp(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
        if args.causal:
            mask = jnp.tril(jnp.ones((S, S), bool))
            s = jnp.where(mask, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bqk,bkd->bqd", p, v)

    def dpa(q, k, v):
        # dot_product_attention wants (batch, seq, heads, head_dim); our
        # (B, S, D) is heads-major — present it as batch=1, heads=B.
        o = jax.nn.dot_product_attention(
            q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
            v.transpose(1, 0, 2)[None], scale=scale,
            is_causal=args.causal)
        return o[0].transpose(1, 0, 2)

    impls = {
        "xla_composition": jax.jit(xla_comp),
        "jax.nn.dpa": jax.jit(dpa),
    }
    if not args.causal:
        impls["fused_scores+pv"] = jax.jit(
            lambda q, k, v: attention(q, k, v))

    pairs = [(512, 1024), (256, 1024), (1024, 1024), (512, 512),
             (256, 512), (128, 1024)]
    if args.blocks:
        pairs = [tuple(map(int, p.split(":")))
                 for p in args.blocks.split(",")]
    for blk in pairs:
        bq, bkv = blk[0], blk[1]
        bkvc = blk[2] if len(blk) > 2 else None
        name = f"flash_{bq}x{bkv}" + (f"x{bkvc}" if bkvc else "")
        impls[name] = jax.jit(
            lambda q, k, v, bq=bq, bkv=bkv, bkvc=bkvc: flash_attention(
                q, k, v, causal=args.causal, block_q=bq, block_kv=bkv,
                block_kv_compute=bkvc))

    if args.grad:
        # Full training step: value + dq/dk/dv.  5 backward contractions
        # + 2 forward = 7 GEMM-equivalents on the flash side; count the
        # same nominal flops for every impl (ratios stay comparable).
        def as_grad(fn):
            def g(q, k, v):
                val, grads = jax.value_and_grad(
                    lambda q, k, v: jnp.sum(fn(q, k, v)
                                            .astype(jnp.float32) ** 2),
                    argnums=(0, 1, 2))(q, k, v)
                # Combine ALL grads into the returned value: time_fn
                # checksums only the first output leaf, and returning
                # grads[0] alone lets XLA dead-code-eliminate the dk/dv
                # computation on EVERY side being compared.
                return sum(gr[0, :8, :8].astype(jnp.float32)
                           for gr in grads) + val
            return jax.jit(g)
        impls = {name: as_grad(fn) for name, fn in impls.items()}
        flops *= 3.5  # 7 contractions vs the forward's 2

    # Verify each against f64-ish numpy before timing.
    qf = np.asarray(q, np.float32)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    sref = (qf @ np.swapaxes(kf, 1, 2)) * scale
    if args.causal:
        sref = np.where(np.tril(np.ones((S, S), bool)), sref, -np.inf)
    e = np.exp(sref - sref.max(-1, keepdims=True))
    oref = (e / e.sum(-1, keepdims=True)) @ vf

    rows = []
    results = {name: [] for name in impls}
    if args.grad:
        # Cross-check every impl's dq against the XLA composition's.
        gref = np.asarray(impls["xla_composition"](q, k, v), np.float32)
        for name, fn in impls.items():
            err = (np.max(np.abs(np.asarray(fn(q, k, v), np.float32)
                                 - gref)) / np.max(np.abs(gref)))
            print(f"verify {name} (dq vs xla): rel {err:.2e}"
                  + ("  !! BAD" if err > 0.05 else ""), flush=True)
    else:
        for name, fn in impls.items():
            out = np.asarray(fn(q, k, v), np.float32)
            err = np.max(np.abs(out - oref)) / np.max(np.abs(oref))
            print(f"verify {name}: rel {err:.2e}"
                  + ("  !! BAD" if err > 0.05 else ""), flush=True)

    # Integrate >= ~2 TFLOP per reading so multi-ms transport jitter
    # cancels (the batched-suite lesson, docs/BENCHMARKS.md).
    iters = max(30, int(2e12 / flops))
    for r in range(args.rounds):
        for name, fn in impls.items():
            t = time_fn(fn, [(q, k, v)], iters=iters)
            tf = flops / t / 1e12
            results[name].append(tf)
            print(f"round {r}: {name}: {t*1e3:.2f} ms -> {tf:.1f} TF",
                  flush=True)

    print()
    for name, vals in results.items():
        med = statistics.median(vals)
        rows.append((name, med, min(vals), max(vals)))
        print(f"{name}: median {med:.1f} TF  (range {min(vals):.1f}-"
              f"{max(vals):.1f})")

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("impl,median_tf,min_tf,max_tf\n")
            for row in rows:
                f.write(",".join(str(x) for x in row) + "\n")


if __name__ == "__main__":
    main()
