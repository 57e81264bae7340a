"""Config sweep for the value-carry causal row kernel (full_ref variant
of causal_legs_probe): one process, many (bq, wq, w), median-of-rounds.
Also prints the best full-mask TF for the ratio."""

import argparse
import functools
import statistics
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--configs",
                    default="1024:512:512,1024:1024:512,1024:512:256,"
                            "1024:256:512,512:512:512,2048:512:512")
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gemm_hls_tpu.utils.benchmark import time_fn

    B, S, D = args.b, args.s, args.d
    MASK = -0.7 * np.finfo(np.float32).max

    def make(bq, wq, w):
        n_q = S // bq
        n_j = S // w

        def kern(q_ref, k_ref, v_ref, o_ref):
            i = pl.program_id(1)
            f32 = jnp.float32
            for qi in range(bq // wq):
                q = q_ref[0, qi * wq:(qi + 1) * wq, :]
                q_lo = i * bq + qi * wq
                m = jnp.full((wq, 128), MASK, f32)
                l = jnp.zeros((wq, 128), f32)
                acc = jnp.zeros((wq, D), f32)

                def slab(j, m, l, acc, q=q, q_lo=q_lo):
                    k_sub = k_ref[0, j * w:(j + 1) * w, :]
                    v_sub = v_ref[0, j * w:(j + 1) * w, :]
                    s = jax.lax.dot_general(
                        q, k_sub, (((1,), (1,)), ((), ())),
                        preferred_element_type=f32)
                    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(j * w + col <= q_lo + row, s, MASK)
                    m_cur = jnp.max(s, axis=-1)[:, None]
                    m_new = jnp.maximum(m, m_cur)
                    p = jnp.exp(s - jnp.tile(m_new, (1, w // 128)))
                    corr = jnp.exp(m - m_new)
                    l_new = corr * l + jax.lax.broadcast_in_dim(
                        jnp.sum(p, axis=-1), l.shape, (0,))
                    pv = jax.lax.dot_general(
                        p.astype(v_sub.dtype), v_sub,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    return m_new, l_new, acc * jnp.tile(
                        corr, (1, D // 128)) + pv

                for j in range(n_j):
                    m, l, acc = jax.lax.cond(
                        j * w < q_lo + wq,
                        lambda m, l, a, j=j: slab(j, m, l, a),
                        lambda m, l, a: (m, l, a), m, l, acc)
                lg = jnp.where(l == 0, 1.0, l)
                o_ref[0, qi * wq:(qi + 1) * wq, :] = (
                    acc / jnp.tile(lg, (1, D // 128))).astype(o_ref.dtype)

        return jax.jit(lambda q, k, v: pl.pallas_call(
            kern,
            grid=(B, n_q),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, S, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            name=f"op_{bq}x{wq}x{w}",
        )(q, k, v))

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    flops = 4 * B * S * S * D / 2
    iters = max(20, int(3e12 / flops))

    from gemm_hls_tpu.ops.attention import flash_attention

    ref = None
    if not args.skip_full:
        best_full = 0.0
        for bq, bkv in [(512, 1024), (1024, 1024), (512, 2048),
                        (1024, 2048), (512, S), (1024, S)]:
            bq2, bkv2 = min(bq, S), min(bkv, S)
            fn = jax.jit(lambda q, k, v, a=bq2, b2=bkv2: flash_attention(
                q, k, v, causal=False, block_q=a, block_kv=b2))
            ts = [time_fn(fn, [(q, k, v)], iters=max(10, iters // 2),
                          warmup=1) for _ in range(3)]
            tf = 2 * flops / statistics.median(ts) / 1e12
            best_full = max(best_full, tf)
            print(f"full {bq2}x{bkv2}: {tf:.1f} TF", flush=True)
        print(f"best full: {best_full:.1f} TF")

    ref = flash_attention(q, k, v, causal=True, scale=1.0)
    for cfgs in args.configs.split(","):
        bq, wq, w = map(int, cfgs.split(":"))
        bq = min(bq, S)
        wq = min(wq, bq)
        if S % bq or bq % wq or S % w:
            continue
        try:
            fn = make(bq, wq, w)
            got = fn(q, k, v)
            err = float(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32)).max())
            ts = [time_fn(fn, [(q, k, v)], iters=iters, warmup=1)
                  for _ in range(args.rounds)]
            tf = flops / statistics.median(ts) / 1e12
            print(f"onepass bq={bq} wq={wq} w={w}: {tf:6.1f} TF "
                  f"(err {err:.1e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"onepass bq={bq} wq={wq} w={w}: FAIL "
                  f"{type(e).__name__} {str(e)[:100]}")


if __name__ == "__main__":
    main()
