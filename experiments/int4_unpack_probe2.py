"""Probe 2: int4 small-M component floors.

Probe 1 (int4_unpack_probe.py) showed per-group split dots change
nothing (52-56 TF) and 2k blocks give +16% (60 TF) — so the cost is NOT
the scale fold or the concat.  This probe isolates the floor:

  nounpack   — dot runs against the PACKED (bk/2, bn) int8 block cast
               straight to bf16 (wrong math, right traffic): the
               DMA + cast + half-size-dot floor the unpack adds to
  int16      — widen int8->int16 (not int32) and shift in int16: the
               widening retile is 2x cheaper if Mosaic lowers it
  i32_2k_4k  — shipping unpack at (bn, bk) = (4096, 2048)
  i32_4kk    — shipping unpack at (bn, bk) = (2048, 4096)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/int4_unpack_probe2.py
"""

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gemm_hls_tpu.ops.quant import dequantize_weights, quantize_weights
    from gemm_hls_tpu.utils.benchmark import time_fn

    m, n, k, g = 32, 8192, 8192, 128
    rng = np.random.default_rng(5)
    w = (rng.standard_normal((k, n)) / np.sqrt(k)).astype(np.float32)
    wq4, s4 = quantize_weights(w, bits=4, group_size=g)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wqj, sj = jnp.asarray(wq4), jnp.asarray(s4)
    ref = np.asarray(
        jnp.dot(x.astype(jnp.float32),
                jnp.asarray(dequantize_weights(wq4, s4, bits=4,
                                               group_size=g))),
        np.float32)

    def kernel(x_ref, wq_ref, s_ref, o_ref, acc_ref, *, n_k_grid, gpb,
               group, mode):
        k_step = pl.program_id(2) if n_k_grid > 1 else 0
        if n_k_grid > 1:
            @pl.when(k_step == 0)
            def _init():
                acc_ref[:] = jnp.zeros_like(acc_ref)

        wq = wq_ref[:]
        bn = wq.shape[-1]
        half = group // 2
        if mode == "nounpack":
            # WRONG MATH floor: packed bytes feed the dot directly; the
            # dot contracts over bk/2 rows of x.
            wf = wq.astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                x_ref[:, :wq.shape[0]], wf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            contrib = contrib * s_ref[0]
        else:
            if mode == "int16":
                w16 = wq.astype(jnp.int16)
                lo = (w16 << 12) >> 12
                hi = w16 >> 4
            else:
                w32 = wq.astype(jnp.int32)
                lo = (w32 << 28) >> 28
                hi = w32 >> 4
            w3 = jnp.concatenate(
                [lo.reshape(gpb, half, bn), hi.reshape(gpb, half, bn)],
                axis=1)
            wf = (w3.astype(jnp.float32)
                  * s_ref[:]).reshape(gpb * group, bn).astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                x_ref[:], wf, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if n_k_grid == 1:
            o_ref[:] = contrib
            return
        acc_ref[:] += contrib

        @pl.when(k_step == n_k_grid - 1)
        def _store():
            o_ref[:] = acc_ref[:]

    def make(bn, bk, mode):
        gpb = bk // g
        grid = (1, n // bn, k // bk)
        kern = functools.partial(kernel, n_k_grid=grid[2], gpb=gpb,
                                 group=g, mode=mode)

        @jax.jit
        def run(x, wq, s):
            s3 = s.reshape(k // g, 1, n)
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((m, bk), lambda i, j, kk: (i, kk),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gpb, 1, bn), lambda i, j, kk: (kk, 0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((m, bn), lambda i, j, kk: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
                scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary"),
                    vmem_limit_bytes=110 * 1024 * 1024),
                cost_estimate=pl.CostEstimate(
                    flops=2 * m * n * k,
                    bytes_accessed=m * k * 2 + k * n // 2 + m * n * 4,
                    transcendentals=0),
                name=f"int4probe2_{mode}_{bn}x{bk}",
            )(x, wq, s3)
        return run

    flops = 2 * m * n * k
    cands = {
        "nounpack_2k": make(2048, 2048, "nounpack"),
        "int16_2k": make(2048, 2048, "int16"),
        "i32_2k": make(2048, 2048, "i32"),
        "i32_4k_2k": make(4096, 2048, "i32"),
        "i32_2k_4k": make(2048, 4096, "i32"),
        "int16_4k_2k": make(4096, 2048, "int16"),
    }
    for name, f in cands.items():
        a = (x, wqj, sj)
        try:
            got = np.asarray(f(*a), np.float32)
        except Exception as e:
            print(f"{name:14s}: FAIL {str(e)[:120]}")
            continue
        err = np.abs(got - ref).max() / np.abs(ref).max()
        t = time_fn(f, [a], iters=max(32, int(3e12 / flops)))
        tf = flops / t / 1e12
        tag = "(floor, wrong math)" if "nounpack" in name else f"err {err:.1e}"
        print(f"{name:14s}: {tf:7.1f} TF   {tag}")


if __name__ == "__main__":
    main()
