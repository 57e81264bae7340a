"""Part 2 of the VPU ceiling analysis: is the mapped intermediate fused?

vpu_ceiling.py measured the shipped chunk formulation at 6.21 TOp/s with
HBM excluded — the full derived ALU bound — so the 4.6 TOp/s kernel is
HBM-bound: at bm=16, B re-fetches (M/bm)=256 x 64 MB = 16 GiB (~21 ms at
HBM bw, against 22 ms of ALU work).  Larger bm cuts B traffic linearly,
but the kernel's VMEM feasibility check assumes the (bm, ck, bn) mapped
intermediate is *materialized* and rejects bm > 16 at ck=512.

Here: run the chunk body at nominal mapped sizes far beyond VMEM
(256 MiB-1 GiB).  If they compile and sustain ALU-bound rates, Mosaic
fuses the broadcast-add into the fold (no materialization), the check is
obsolete, and big-bm blocks should lift the full kernel toward 6 TOp/s.

Also re-measures the two noisy rows from part 1 with more iterations.

Usage: python experiments/vpu_ceiling2.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from gemm_hls_tpu.ops.pallas_vpu import fold_axis
from gemm_hls_tpu.utils.benchmark import time_fn

REPS = 64


def _mapped_kernel(a_ref, b_ref, o_ref, *, reps):
    bm, ck = a_ref.shape
    bn = b_ref.shape[1]
    b = b_ref[:]

    def body(_, carry):
        a, acc = carry
        mapped = a[:, :, None] + b[None, :, :]
        acc = jnp.minimum(acc, fold_axis(mapped, jnp.minimum, axis=1))
        return a + 1.0, acc

    _, acc = jax.lax.fori_loop(
        0, reps, body,
        (a_ref[:], jnp.full((bm, bn), jnp.inf, jnp.float32)))
    o_ref[:] = acc


def main():
    import csv

    from gemm_hls_tpu.models.perf_model import detect_chip

    rows = []
    rng = np.random.default_rng(5)
    for bm, ck, bn in [(16, 512, 2048), (32, 512, 2048), (64, 512, 2048),
                       (128, 512, 2048), (256, 512, 2048), (64, 1024, 2048),
                       (8, 512, 2048), (32, 256, 2048)]:
        a = jnp.asarray(rng.uniform(1, 10, (bm, ck)).astype(np.float32))
        b = jnp.asarray(rng.uniform(1, 10, (ck, bn)).astype(np.float32))
        jax.block_until_ready((a, b))
        mapped_mb = bm * ck * bn * 4 / 2**20
        fn = jax.jit(pl.pallas_call(
            functools.partial(_mapped_kernel, reps=REPS),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, bn), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        ))
        ops = 2.0 * bm * ck * bn * REPS
        try:
            meds = sorted(ops / time_fn(fn, [(a, b)], iters=16) / 1e12
                          for _ in range(3))
            print(f"mapped ({bm:3d}x{ck}x{bn}) nominal {mapped_mb:5.0f} "
                  f"MiB: {meds[1]:6.2f} TOp/s  (spread "
                  f"{meds[0]:.2f}-{meds[2]:.2f})", flush=True)
            rows.append(dict(
                label=f"E2 mapped ({bm}x{ck}x{bn}) nominal "
                      f"{mapped_mb:.0f} MiB",
                tops=round(meds[1], 2), spread_lo=round(meds[0], 2),
                spread_hi=round(meds[2], 2), note=""))
        except Exception as e:  # noqa: BLE001
            print(f"mapped ({bm},{ck},{bn}) nominal {mapped_mb:.0f} MiB: "
                  f"FAIL {type(e).__name__}: {str(e)[:110]}", flush=True)

    out = f"artifacts/vpu_ceiling2_{detect_chip().name}.csv"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["label", "tops", "spread_lo",
                                          "spread_hi", "note"])
        w.writeheader()
        w.writerows(rows)
    print("wrote", out)


if __name__ == "__main__":
    main()
