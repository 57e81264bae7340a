"""Weight-only quantized GEMM bench: fused-dequant int8/int4 vs bf16.

Small-batch inference shapes (M ≪ N = K) are weight-bandwidth-bound, so
the speedup ceiling is the weight-bytes ratio (2× int8, 4× int4 minus
the in-kernel unpack cost).  Verifies every path against the host
dequant reference first.

Usage: python experiments/quant_bench.py [--csv artifacts/...]
"""

import argparse
import functools
import statistics
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--k", type=int, default=8192)
    ap.add_argument("--ms", default="32,128,1024")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu import GemmConfig, matmul
    from gemm_hls_tpu.ops.quant import (
        dequantize_weights, matmul_quantized, matmul_w8a8,
        quantize_weights,
    )
    from gemm_hls_tpu.utils.benchmark import time_fn

    n, k = args.n, args.k
    rng = np.random.default_rng(5)
    w = (rng.standard_normal((k, n)) / np.sqrt(k)).astype(np.float32)
    wq8, s8 = quantize_weights(w, bits=8, group_size=None)
    wq4, s4 = quantize_weights(w, bits=4, group_size=128)
    w_bf = jnp.asarray(w, jnp.bfloat16)
    wq8j, s8j = jnp.asarray(wq8), jnp.asarray(s8)
    wq4j, s4j = jnp.asarray(wq4), jnp.asarray(s4)

    rows = []
    for m in map(int, args.ms.split(",")):
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        flops = 2 * m * n * k
        # Integrate >= ~6 TFLOP per reading: the two-point slope at
        # short iteration counts produced up to 1.35x-peak artifacts on
        # the remote tunnel (535 "TF" at M=1024 w8a8, engine peak 394).
        iters = max(32, int(6e12 / flops))

        # Weights ride as ARGUMENTS, never closures: a closed-over
        # 134 MB array becomes an HLO literal constant and each jit
        # retrace re-hashes/embeds it (observed: 8.6 GB RSS, minutes of
        # host CPU per compile).
        impls = {
            "bf16": (jax.jit(lambda x, w: matmul(x, w)), (x, w_bf)),
            "xla_bf16": (jax.jit(jnp.dot), (x, w_bf)),
            "int8": (jax.jit(functools.partial(
                matmul_quantized, bits=8)), (x, wq8j, s8j)),
            "int4_g128": (jax.jit(functools.partial(
                matmul_quantized, bits=4, group_size=128)),
                (x, wq4j, s4j)),
            "w8a8": (jax.jit(matmul_w8a8), (x, wq8j, s8j)),
        }

        # Reference on-device at HIGHEST (host numpy takes minutes at
        # large M in this container).
        w_f32 = jnp.asarray(w)
        ref = np.asarray(jax.jit(lambda a, b: jnp.dot(
            a.astype(jnp.float32), b,
            precision=jax.lax.Precision.HIGHEST))(x, w_f32), np.float32)
        for name, (fn, fargs) in impls.items():
            got = np.asarray(fn(*fargs), np.float32)
            err = np.abs(got - ref).max() / np.abs(ref).max()
            # int4's budget is its quantization error (~1/7 worst-case),
            # not a kernel bound — kernel exactness is covered by the
            # host-dequant CPU suite (tests/test_quant.py).
            lim = {"bf16": 0.02, "xla_bf16": 0.02, "int8": 0.02,
                   "int4_g128": 0.15, "w8a8": 0.04}[name]
            print(f"verify M={m} {name}: rel {err:.3f}"
                  + ("  !! BAD" if err > lim else ""), flush=True)

        from gemm_hls_tpu.models.perf_model import detect_chip
        chip = detect_chip()
        peaks = {"bf16": chip.peak_for("bfloat16"),
                 "xla_bf16": chip.peak_for("bfloat16"),
                 "int8": chip.peak_for("bfloat16"),      # bf16 MXU dots
                 "int4_g128": chip.peak_for("bfloat16"),
                 "w8a8": chip.peak_for("int8")}          # int8 engine
        med = {}
        for name, (fn, fargs) in impls.items():
            ceil_tf = (peaks[name] or 0) / 1e3 or None
            vals = []
            for _ in range(args.rounds):
                t = time_fn(fn, [fargs], iters=iters)
                tf = flops / t / 1e12
                if ceil_tf and tf > ceil_tf:
                    # Impossible reading (transport hiccup): one retry,
                    # then drop.
                    t = time_fn(fn, [fargs], iters=iters)
                    tf = flops / t / 1e12
                    if tf > ceil_tf:
                        continue
                vals.append(tf)
            if not vals:
                raise RuntimeError(f"no physically possible reading for "
                                   f"{name} at M={m}")
            med[name] = statistics.median(vals)
            print(f"M={m} {name}: {med[name]:.1f} TF", flush=True)
        rows.append((m, med))
        print(f"M={m}: int8 {med['int8']/med['bf16']:.2f}x bf16, "
              f"int4 {med['int4_g128']/med['bf16']:.2f}x, "
              f"w8a8 {med['w8a8']/med['bf16']:.2f}x", flush=True)

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("m,bf16_tf,xla_bf16_tf,int8_tf,int4_tf,w8a8_tf\n")
            for m, med in rows:
                f.write(f"{m},{med['bf16']:.1f},{med['xla_bf16']:.1f},"
                        f"{med['int8']:.1f},{med['int4_g128']:.1f},"
                        f"{med['w8a8']:.1f}\n")


if __name__ == "__main__":
    main()
