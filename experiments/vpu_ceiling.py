"""Measured VPU ceiling analysis for the min_plus kernel (VERDICT r2 #3).

The shipped kernel sustains 4.6 TOp/s at 4096^3 = 75% of the *derived*
6.16 TOp/s ALU bound (4 ports x 8x128 lanes x 1.503 GHz).  That bound
assumes every ALU slot retires a useful add/min with operands already in
registers.  This experiment measures what the hardware actually sustains
on the kernel's op mix, isolating the binding constraint:

  E1 static-unrolled min+add chain — acc = min(acc, x) + y unrolled R
     times in straight-line code: operands load once, the chain runs on
     registers, so this is the *measured* sustained min+add issue rate
     (the real ALU ceiling for the min_plus op mix; 2 ops/elem/step).
  E2 the kernel's own chunk formulation, HBM excluded — the mapped
     (bm, ck, bn) broadcast-add + min-tree fold on VMEM-resident blocks,
     repeated via fori_loop whose carries are only the small (bm, ck) a
     update and (bm, bn) accumulator; the mapped intermediate is
     recomputed inside each rep exactly as the shipped kernel recomputes
     it per chunk.  This is the formulation ceiling: the shipped kernel
     does exactly this plus HBM streaming.
  E3 VMEM read rate — min-accumulating (8, n)-slice scans over a large
     resident buffer (1 min per 4 B read, small carry): bounds how fast
     the VPU can even *read* a materialized mapped intermediate back.

Usage: python experiments/vpu_ceiling.py
Writes artifacts/vpu_ceiling_<chip>.csv.
"""
import csv
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from gemm_hls_tpu.models.perf_model import detect_chip
from gemm_hls_tpu.ops.pallas_vpu import fold_axis
from gemm_hls_tpu.utils.benchmark import time_fn

REPS = 64


def _chain_kernel(x_ref, y_ref, o_ref, *, reps):
    """E1: acc = min(acc, x) + y, statically unrolled — register chain."""
    x = x_ref[:]
    y = y_ref[:]
    acc = y
    for _ in range(reps):
        acc = jnp.minimum(acc, x) + y
    o_ref[:] = acc


def _mapped_kernel(a_ref, b_ref, o_ref, *, reps):
    """E2: the shipped chunk body on resident blocks; a is loop-carried
    (a += 1 each rep) so the mapped broadcast-add cannot be hoisted."""
    bm, ck = a_ref.shape
    bn = b_ref.shape[1]
    b = b_ref[:]

    def body(_, carry):
        a, acc = carry
        mapped = a[:, :, None] + b[None, :, :]            # (bm, ck, bn)
        acc = jnp.minimum(acc, fold_axis(mapped, jnp.minimum, axis=1))
        return a + 1.0, acc

    _, acc = jax.lax.fori_loop(
        0, reps, body,
        (a_ref[:], jnp.full((bm, bn), jnp.inf, jnp.float32)))
    o_ref[:] = acc


def _scan_kernel(x_ref, o_ref, *, reps):
    """E3: min-accumulate 8-row slices of a resident buffer — read rate."""
    rows = x_ref.shape[0]
    n_slices = rows // 8

    def body(r, acc):
        off = pl.multiple_of((r % n_slices) * 8, 8)
        return jnp.minimum(acc, x_ref[pl.ds(off, 8), :])

    o_ref[:] = jax.lax.fori_loop(0, reps * n_slices, body,
                                 jnp.full_like(o_ref, jnp.inf))


def run(kernel, n_in, out_shape, **kw):
    f = pl.pallas_call(
        functools.partial(kernel, **kw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                  for _ in range(n_in)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    return jax.jit(f)


def median3(fn, args, ops):
    return sorted(ops / time_fn(fn, [args], iters=8) / 1e12
                  for _ in range(3))[1]


def main():
    chip = detect_chip()
    rows = []
    rng = np.random.default_rng(5)

    def emit(label, tops, note=""):
        rows.append(dict(label=label, tops=round(tops, 3), note=note))
        print(f"{label:44s}: {tops:6.2f} TOp/s  {note}", flush=True)

    # E1: register-chain min+add at growing working sets.
    for bm, bn in [(64, 2048), (256, 2048), (1024, 2048)]:
        x = jnp.asarray(rng.uniform(1, 10, (bm, bn)).astype(np.float32))
        y = jnp.asarray(rng.uniform(0, 1, (bm, bn)).astype(np.float32))
        jax.block_until_ready((x, y))
        fn = run(_chain_kernel, 2, (bm, bn), reps=REPS)
        ops = 2.0 * bm * bn * REPS
        kb = bm * bn * 4 // 1024
        try:
            emit(f"E1 chain ({bm}x{bn}, {kb} KiB/buf)",
                 median3(fn, (x, y), ops), "unrolled min+add issue rate")
        except Exception as e:  # noqa: BLE001
            print(f"E1 ({bm},{bn}): FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)

    # E2: the kernel's mapped formulation, VMEM-resident (no HBM).
    for bm, ck, bn in [(16, 512, 2048), (8, 512, 2048), (16, 256, 2048),
                       (32, 256, 2048), (8, 256, 1024)]:
        a = jnp.asarray(rng.uniform(1, 10, (bm, ck)).astype(np.float32))
        b = jnp.asarray(rng.uniform(1, 10, (ck, bn)).astype(np.float32))
        jax.block_until_ready((a, b))
        mapped_mb = bm * ck * bn * 4 / 2**20
        if mapped_mb > 100:
            continue
        fn = run(_mapped_kernel, 2, (bm, bn), reps=REPS)
        ops = 2.0 * bm * ck * bn * REPS
        try:
            emit(f"E2 mapped ({bm}x{ck}x{bn}, {mapped_mb:.0f} MiB)",
                 median3(fn, (a, b), ops), "kernel chunk body, no HBM")
        except Exception as e:  # noqa: BLE001
            print(f"E2 ({bm},{ck},{bn}): FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)

    # E3: VMEM slice-scan read rate (1 min per 4 B read).
    for bm, bn in [(512, 2048), (2048, 2048)]:
        x = jnp.asarray(rng.uniform(0, 1, (bm, bn)).astype(np.float32))
        jax.block_until_ready(x)
        fn = run(_scan_kernel, 1, (8, bn), reps=REPS)
        ops = 1.0 * bm * bn * REPS
        mb = bm * bn * 4 // 2**20
        try:
            tops = median3(fn, (x,), ops)
            emit(f"E3 scan ({bm}x{bn}, {mb} MiB)", tops,
                 f"implied VMEM read ~{tops * 4:.0f} TB/s (4 B/elem)")
        except Exception as e:  # noqa: BLE001
            print(f"E3 ({bm},{bn}): FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)

    out = f"artifacts/vpu_ceiling_{chip.name}.csv"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["label", "tops", "note"])
        w.writeheader()
        w.writerows(rows)
    print("wrote", out)


if __name__ == "__main__":
    main()
