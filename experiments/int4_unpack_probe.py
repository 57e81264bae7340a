"""Probe: int4 weight-only GEMM unpack schedules at small M.

The M=32, N=K=8192 weight-only int4 path runs at ~55 TF against a
~164 TF weight-traffic bound (docs/ROADMAP.md): the per-element VPU
unpack (int8->int32 cast, three shifts, sublane concat, f32 scale fold,
bf16 cast) costs more than the halved weight DMA saves.  This probe
measures candidate schedules on-chip:

  base      — the shipping kernel (ops/pallas_dequant.py)
  blocks    — same kernel, (bn, bk) = (2048, 2048): 4x fewer grid steps
  split     — per-group *split* dots: no sublane concat, no weight-block
              scale fold; lo/hi nibble planes each get their own
              (bm, g/2) x (g/2, bn) dot and the group scale applies to
              the (bm, bn) contribution (fma) post-dot
  splitcat  — per-group dots on the concat'd (g, bn) plane (one concat,
              half the dot count of split)

Usage: PYTHONPATH=. python experiments/int4_unpack_probe.py
"""

import functools
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.quant import (
        dequantize_weights, matmul_quantized, quantize_weights,
    )
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

    def split_kernel(x_ref, wq_ref, s_ref, o_ref, acc_ref, *, n_k_grid,
                     gpb, group, concat, out_dtype):
        k_step = pl.program_id(2) if n_k_grid > 1 else 0
        if n_k_grid > 1:
            @pl.when(k_step == 0)
            def _init():
                acc_ref[:] = jnp.zeros_like(acc_ref)

        w32 = wq_ref[:].astype(jnp.int32)
        lo = ((w32 << 28) >> 28).astype(jnp.bfloat16)
        hi = (w32 >> 4).astype(jnp.bfloat16)
        half = group // 2
        x_all = x_ref[:]
        contrib = jnp.zeros_like(acc_ref)
        for gi in range(gpb):
            l_plane = lo[gi * half:(gi + 1) * half]
            h_plane = hi[gi * half:(gi + 1) * half]
            if concat:
                plane = jnp.concatenate([l_plane, h_plane], axis=0)
                xg = x_all[:, gi * group:(gi + 1) * group]
                d = jax.lax.dot_general(
                    xg, plane, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                x_lo = x_all[:, gi * group:gi * group + half]
                x_hi = x_all[:, gi * group + half:(gi + 1) * group]
                d = jax.lax.dot_general(
                    x_lo, l_plane,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d = d + jax.lax.dot_general(
                    x_hi, h_plane,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            contrib = contrib + d * s_ref[gi]
        if n_k_grid == 1:
            o_ref[:] = contrib.astype(out_dtype)
            return
        acc_ref[:] += contrib

        @pl.when(k_step == n_k_grid - 1)
        def _store():
            o_ref[:] = acc_ref[:].astype(out_dtype)

    def make_split(bn, bk, concat):
        gpb = bk // g
        grid = (1, n // bn, k // bk)
        kern = functools.partial(split_kernel, n_k_grid=grid[2], gpb=gpb,
                                 group=g, concat=concat,
                                 out_dtype=jnp.float32)

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
                name=f"int4probe_{bn}x{bk}_{concat}",
            )(x, wq, s3)
        return run

    flops = 2 * m * n * k
    cands = {
        "base": (jax.jit(functools.partial(matmul_quantized, bits=4,
                                           group_size=g)), (x, wqj, sj)),
        "blocks2k": (jax.jit(functools.partial(
            matmul_quantized, bits=4, group_size=g,
            config=default_config("bfloat16").replace(
                block_n=2048, block_k=2048,
                vmem_limit_bytes=110 * 1024 * 1024))), (x, wqj, sj)),
        "split_1k": (make_split(1024, 1024, False), (x, wqj, sj)),
        "split_2k": (make_split(2048, 2048, False), (x, wqj, sj)),
        "splitcat_2k": (make_split(2048, 2048, True), (x, wqj, sj)),
        "split_4k": (make_split(4096, 2048, False), (x, wqj, sj)),
    }
    for name, (f, a) in cands.items():
        got = np.asarray(f(*a), np.float32)
        err = np.abs(got - ref).max() / np.abs(ref).max()
        t = time_fn(f, [a], iters=max(32, int(3e12 / flops)))
        tf = flops / t / 1e12
        print(f"{name:12s}: {tf:7.1f} TF   rel_err {err:.2e}")


if __name__ == "__main__":
    main()
