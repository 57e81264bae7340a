"""Apportion the causal one-pass kernel's per-slab costs into named legs.

All variants share the row structure (grid = (B, n_q), whole KV
resident, unrolled (wq, w) slabs, value carries, lax.cond slab skip).
Only ``full_ref`` is numerically meaningful; the rest strip one leg at
a time:

  full_ref   - the real thing: skip + mask + carries        (correct)
  nomask     - skip + carries, causal mask dropped           (perf only)
  nocarry    - skip + mask, online-softmax carries dropped   (perf only)
  noskip     - mask + carries, dead slabs executed too       (perf only)
  bare       - dots + exp + accumulate only                  (perf only)

TF numbers use the LIVE-flop convention (4*B*S^2*D/2), so a variant's
TF is directly comparable to the shipping causal kernels and to the
full-mask kernel's TF.

Usage: python experiments/causal_legs_probe.py --b 32 --s 1024
"""

import argparse
import functools
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--s", type=int, default=1024)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--bq", type=int, default=1024)
    ap.add_argument("--wq", type=int, default=512)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gemm_hls_tpu.utils.benchmark import time_fn

    B, S, D = args.b, args.s, args.d
    bq, wq, w = min(args.bq, S), args.wq, args.w
    n_q = S // bq
    n_j = S // w
    assert D == 128, "probe assumes d=128 (lane-width carries)"
    MASK = -0.7 * np.finfo(np.float32).max

    def kern(q_ref, k_ref, v_ref, o_ref, *, mask, carry, skip):
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
                if mask == 2:
                    # Mask only slabs straddling the diagonal; interior
                    # slabs take the unmasked lane.
                    def masked(s, j=j, q_lo=q_lo):
                        row = jax.lax.broadcasted_iota(jnp.int32,
                                                       s.shape, 0)
                        col = jax.lax.broadcasted_iota(jnp.int32,
                                                       s.shape, 1)
                        return jnp.where(j * w + col <= q_lo + row,
                                         s, MASK)

                    s = jax.lax.cond((j + 1) * w <= q_lo + 1,
                                     lambda s: s, masked, s)
                elif mask:
                    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(j * w + col <= q_lo + row, s, MASK)
                if carry:
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
                    return m_new, l_new, acc * corr + pv
                p = jnp.exp(s - jnp.float32(3.0))
                pv = jax.lax.dot_general(
                    p.astype(v_sub.dtype), v_sub,
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                return m, l, acc + pv

            for j in range(n_j):
                if skip:
                    m, l, acc = jax.lax.cond(
                        j * w < q_lo + wq,
                        lambda m, l, a, j=j: slab(j, m, l, a),
                        lambda m, l, a: (m, l, a), m, l, acc)
                else:
                    m, l, acc = slab(j, m, l, acc)
            lg = jnp.where(l == 0, 1.0, l)
            den = lg if carry else jnp.full_like(lg, float(S))
            o_ref[0, qi * wq:(qi + 1) * wq, :] = (acc / den).astype(
                o_ref.dtype)

    def build(mask, carry, skip):
        f = functools.partial(kern, mask=mask, carry=carry, skip=skip)
        return jax.jit(lambda q, k, v: pl.pallas_call(
            f,
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
            name=f"legs_m{mask}c{carry}s{skip}",
        )(q, k, v))

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, D)) * 0.3, jnp.bfloat16)
    flops = 4 * B * S * S * D / 2
    iters = max(20, int(3e12 / flops))

    variants = {
        "full_ref": (1, 1, 1),
        "diagmask": (2, 1, 1),
        "nomask": (0, 1, 1),
        "nocarry": (1, 0, 1),
        "noskip": (1, 1, 0),
        "bare": (0, 0, 1),
    }
    # Correctness spot-check of full_ref AND diagmask vs shipping.
    from gemm_hls_tpu.ops.attention import flash_attention

    ref = flash_attention(q, k, v, causal=True, scale=1.0)
    for nm in ("full_ref", "diagmask"):
        got = build(*variants[nm])(q, k, v)
        err = float(jnp.abs(got.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        print(f"{nm} vs shipping causal: maxerr {err:.2e}")

    import statistics
    for name, (mk, cr, sk) in variants.items():
        fn = build(mk, cr, sk)
        ts = [time_fn(fn, [(q, k, v)], iters=iters, warmup=1)
              for _ in range(args.rounds)]
        tf = flops / statistics.median(ts) / 1e12
        print(f"{name:9s} (mask={mk} carry={cr} skip={sk}): {tf:6.1f} TF")


if __name__ == "__main__":
    main()
