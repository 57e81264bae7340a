"""Apportion int4 small-M's control-vs-shipping gap into named legs.

probe2 measured the floor: an unpack-free control (identical packed
traffic, int8->bf16 cast, half-K dot, wrong math) runs ~83.5 TF at
M=32 while the shipping unpack schedule reaches 60-64 TF.  This probe
walks the chain from control to shipping ONE leg at a time, so the
~25% residual decomposes into named costs (VERDICT r4 weak #4):

  control     — cast packed (bk/2, bn) straight to bf16, half-K dot
                (wrong math; probe2's "nounpack" floor)
  +unpack     — int32 widen + two shifts + group concat, but the dot
                still contracts only the LO half (wrong math): adds
                the unpack ALU alone
  +fulldot    — unpack + full-K dot, post-dot per-block scale (wrong
                math for g<bk): adds the 2x-rows bf16 cast + 2x MXU
                MACs
  shipping    — unpack + pre-dot group-scale fold (f32 mul on the
                (gpb, g, bn) tile) + full dot: adds the scale fold

All variants move the same packed HBM bytes, so TF differences are
pure in-kernel cost.  TF = 2*m*n*k / t (the real op count).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/int4_legs_probe.py
"""

import functools
import statistics
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gemm_hls_tpu.ops.quant import quantize_weights
    from gemm_hls_tpu.utils.benchmark import time_fn

    m, n, k, g = 32, 8192, 8192, 128
    bn, bk = 2048, 2048          # the shipping small-M winner class
    rng = np.random.default_rng(5)
    w = (rng.standard_normal((k, n)) / np.sqrt(k)).astype(np.float32)
    wq4, s4 = quantize_weights(w, bits=4, group_size=g)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wqj, sj = jnp.asarray(wq4), jnp.asarray(s4)

    def kernel(x_ref, wq_ref, s_ref, o_ref, acc_ref, *, n_k_grid, gpb,
               group, mode):
        k_step = pl.program_id(2) if n_k_grid > 1 else 0
        if n_k_grid > 1:
            @pl.when(k_step == 0)
            def _init():
                acc_ref[:] = jnp.zeros_like(acc_ref)

        wq = wq_ref[:]
        bn_l = wq.shape[-1]
        half = group // 2
        if mode == "control":
            wf = wq.astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                x_ref[:, :wq.shape[0]], wf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            contrib = contrib * s_ref[0]
        else:
            w32 = wq.astype(jnp.int32)
            lo = (w32 << 28) >> 28
            hi = w32 >> 4
            if mode == "unpack":
                # Unpack ALU paid in full; dot stays half-K (lo only).
                w3 = jnp.concatenate(
                    [lo.reshape(gpb, half, bn_l),
                     hi.reshape(gpb, half, bn_l)], axis=1)
                wf = (w3.reshape(gpb * group, bn_l)[:wq.shape[0]]
                      .astype(jnp.bfloat16))
                contrib = jax.lax.dot_general(
                    x_ref[:, :wq.shape[0]], wf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                contrib = contrib * s_ref[0]
            elif mode == "fulldot":
                # Full unpack + full dot, but post-dot block scale
                # instead of the per-group fold.
                w3 = jnp.concatenate(
                    [lo.reshape(gpb, half, bn_l),
                     hi.reshape(gpb, half, bn_l)], axis=1)
                wf = w3.reshape(gpb * group, bn_l).astype(jnp.bfloat16)
                contrib = jax.lax.dot_general(
                    x_ref[:], wf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                contrib = contrib * s_ref[0]
            elif mode == "bf16fold":
                # Fold in bf16: int32->bf16 cast + bf16 mul = two VPU
                # passes over the weight tile instead of the shipping
                # three (f32 cast, f32 mul, bf16 cast).  Costs one
                # bf16 rounding of s (~2^-8 rel, far under the int4
                # quantization error).
                w3 = jnp.concatenate(
                    [lo.reshape(gpb, half, bn_l),
                     hi.reshape(gpb, half, bn_l)], axis=1)
                wf = (w3.astype(jnp.bfloat16)
                      * s_ref[:].astype(jnp.bfloat16)).reshape(
                    gpb * group, bn_l)
                contrib = jax.lax.dot_general(
                    x_ref[:], wf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:                          # shipping
                w3 = jnp.concatenate(
                    [lo.reshape(gpb, half, bn_l),
                     hi.reshape(gpb, half, bn_l)], axis=1)
                wf = (w3.astype(jnp.float32) * s_ref[:]).reshape(
                    gpb * group, bn_l).astype(jnp.bfloat16)
                contrib = jax.lax.dot_general(
                    x_ref[:], wf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        if n_k_grid == 1:
            o_ref[:] = contrib
            return
        acc_ref[:] += contrib

        @pl.when(k_step == n_k_grid - 1)
        def _store():
            o_ref[:] = acc_ref[:]

    def make(mode):
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
                name=f"int4_legs_{mode}",
            )(x, wq, s3)

        return run

    flops = 2.0 * m * n * k
    # ~54 us/call kernels: integrate >= 1000 calls per reading so the
    # fixed ~15 ms transport subtraction is <2% of the signal (the
    # quant_bench protocol); retry readings above the weight-DMA
    # ceiling band (transport hiccups read impossibly fast).
    iters = 1000
    ceiling = 200.0
    modes = ["control", "unpack", "fulldot", "bf16fold", "shipping"]
    fns = {mode: make(mode) for mode in modes}
    for mode, fn in fns.items():
        fn(x, wqj, sj).block_until_ready()     # compile before timing
    res = {mode: [] for mode in modes}
    for r in range(5):
        for mode, fn in fns.items():
            for _ in range(3):
                t = time_fn(fn, [(x, wqj, sj)], iters=iters, warmup=1)
                if flops / t / 1e12 <= ceiling:
                    break
            tf = flops / t / 1e12
            if tf <= ceiling:
                res[mode].append(tf)
    for mode in modes:
        if not res[mode]:
            raise RuntimeError(f"no reliable readings for {mode}")
    prev = None
    for mode in modes:
        tf = statistics.median(res[mode])
        leg = f"  (leg: {prev - tf:+.1f} TF)" if prev is not None else ""
        print(f"{mode:9s}: {tf:6.1f} TF  "
              f"({min(res[mode]):.1f}-{max(res[mode]):.1f}){leg}")
        prev = tf


if __name__ == "__main__":
    main()
