"""Flash BACKWARD kernel efficiency: per-kernel %-of-engine + legs.

Every forward kernel in this repo has a measured ceiling; this gives the
backward the same treatment (VERDICT r4 weak #3).  Conventions:

* The backward does 7 score-area contractions (dq kernel: qk^T recompute,
  ds = do.v^T, dq = ds.k -> 3; dkv kernel: qk^T, ds recompute, dv = p^T.do,
  dk = ds^T.q -> 4), each 2*B*Sq*Skv*D FLOPs (halved for causal live
  area).  A kernel's TF-eff = its contraction count x area-FLOPs / time;
  %-engine = TF-eff / the bf16 MXU peak — the fraction of peak the MXU
  sustains while ALSO paying recompute's exp chain and the ds cast.
* train-step ratio = (fwd+bwd wall clock of the framework's
  flash_attention vs XLA's dot-attention composition), grad of sum(o^2).

Usage: python experiments/flash_bwd_bench.py --s 2048 [--causal]
       [--blocks 512:1024,512:2048] [--csv artifacts/flash_bwd_v5e.csv]
"""

import argparse
import statistics
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=0, help="0 = 2^25/S heads")
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--blocks",
                    default="512:1024,512:2048,1024:1024,256:2048,"
                            "512:512,1024:2048")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.attention import flash_attention
    from gemm_hls_tpu.ops.pallas_flash import (
        flash_mha, flash_mha_bwd_dq, flash_mha_bwd_dkv,
    )
    from gemm_hls_tpu.utils.benchmark import time_fn

    B = args.b or max(1, 2 ** 25 // args.s // args.s * 8)
    S, D = args.s, args.d
    causal = args.causal
    area_flops = 2.0 * B * S * S * D / (2 if causal else 1)
    rng = np.random.default_rng(5)
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.standard_normal((B, S, D)) * scale, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    cfg = default_config("bfloat16").replace(out_dtype="bfloat16")

    # Residuals once (forward with lse), delta via one fused XLA pass.
    o, lse = flash_mha(q, k, v, cfg=cfg, causal=causal, block_q=512,
                       block_kv=min(2048, S), save_lse=True)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    jax.block_until_ready((o, lse, delta))
    iters = max(10, int(4e12 / (3 * area_flops)))

    print(f"B={B} S={S} D={D} causal={causal}  "
          f"(area TF base {area_flops/1e12:.2f})", flush=True)
    rows = []
    for pair in args.blocks.split(","):
        bq, bkv = map(int, pair.split(":"))
        bq, bkv = min(bq, S), min(bkv, S)
        fdq = jax.jit(lambda q, k, v, do, lse, dl, bq=bq, bkv=bkv:
                      flash_mha_bwd_dq(q, k, v, do, lse, dl, cfg=cfg,
                                       causal=causal, block_q=bq,
                                       block_kv=bkv))
        fdkv = jax.jit(lambda q, k, v, do, lse, dl, bq=bq, bkv=bkv:
                       flash_mha_bwd_dkv(q, k, v, do, lse, dl, cfg=cfg,
                                         causal=causal, block_q=bq,
                                         block_kv=bkv))
        out = {"block_q": bq, "block_kv": bkv}
        for name, fn, n_con in (("dq", fdq, 3), ("dkv", fdkv, 4)):
            try:
                ts = [time_fn(fn, [(q, k, v, do, lse, delta)],
                              iters=iters, warmup=1)
                      for _ in range(args.rounds)]
                tf = n_con * area_flops / statistics.median(ts) / 1e12
                out[name] = tf
                print(f"  {name} {bq}x{bkv}: {tf:6.1f} TF-eff "
                      f"({tf/197*100:4.1f}% engine)", flush=True)
            except Exception as e:  # noqa: BLE001
                out[name] = None
                print(f"  {name} {bq}x{bkv}: FAIL {type(e).__name__} "
                      f"{str(e)[:90]}", flush=True)
        rows.append(out)

    if not args.skip_step:
        # Full train step (value+grad of sum(o^2)) vs XLA composition.
        def fr(q, k, v):
            o = flash_attention(q, k, v, causal=causal,
                                scale=float(scale)).astype(jnp.float32)
            return jnp.sum(o ** 2)

        def xr(q, k, v):
            s = (q.astype(jnp.float32) @ k.astype(jnp.float32)
                 .transpose(0, 2, 1)) * scale
            if causal:
                qp = jnp.arange(S)[:, None]
                s = jnp.where(jnp.arange(S)[None, :] <= qp, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.sum((p.astype(jnp.bfloat16) @ v)
                           .astype(jnp.float32) ** 2)

        def combined(gradfn):
            # One value depending on ALL grads: time_fn checksums only
            # the first output leaf, and a bare grads tuple lets XLA
            # dead-code-eliminate the dk/dv computation on both sides.
            def f(q, k, v):
                gq, gk, gv = gradfn(q, k, v)
                return (gq[0, :8, :8].astype(jnp.float32)
                        + gk[0, :8, :8] + gv[0, :8, :8])
            return jax.jit(f)

        g_ours = combined(jax.grad(fr, argnums=(0, 1, 2)))
        g_xla = combined(jax.grad(xr, argnums=(0, 1, 2)))
        q32 = q.astype(jnp.bfloat16)
        ts = [time_fn(g_ours, [(q32, k, v)], iters=max(5, iters // 2),
                      warmup=1) for _ in range(args.rounds)]
        t_ours = statistics.median(ts)
        ts = [time_fn(g_xla, [(q32, k, v)], iters=max(5, iters // 2),
                      warmup=1) for _ in range(args.rounds)]
        t_xla = statistics.median(ts)
        # fwd(2) + bwd(7) = 9 area contractions per step.
        tf_step = 9 * area_flops / t_ours / 1e12
        print(f"train step: ours {t_ours*1e3:.2f} ms ({tf_step:.1f} "
              f"TF-eff) vs XLA {t_xla*1e3:.2f} ms -> "
              f"{t_xla/t_ours:.2f}x", flush=True)

    if args.csv:
        import csv as _csv
        with open(args.csv, "a", newline="") as f:
            w = _csv.writer(f)
            if f.tell() == 0:
                w.writerow(["b", "s", "d", "causal", "block_q",
                            "block_kv", "dq_tf", "dkv_tf"])
            for r in rows:
                w.writerow([B, S, D, int(causal), r["block_q"],
                            r["block_kv"],
                            f"{r['dq']:.1f}" if r["dq"] else "",
                            f"{r['dkv']:.1f}" if r["dkv"] else ""])


if __name__ == "__main__":
    main()
