"""min_plus VPU kernel formulation shootout (VERDICT r2 #3).

The shipped kernel materializes a (bm, ck, bn) mapped intermediate and
axis-reduces it (75% of the derived 6.16 TOp/s ALU bound at 4096^3).
Candidate reformulations measured here, all at 4096^3 fp32:

  A. baseline       — the shipped kernel via matmul(semiring="min_plus").
  B. rank1-unroll   — no 3-D intermediate: fori over 128-wide K chunks,
                      static inner unroll of 128 rank-1 updates
                      acc = min(acc, a[:, j:j+1] + b[j:j+1, :]).
                      Exactly 2 ALU ops per triple if Mosaic folds the
                      broadcasts into the ops.
  C. rank8-mapped   — fori over 8-wide K chunks (sublane-aligned): mapped
                      (bm, 8, bn) is vreg-rank-sized, reduce axis=1.
  D. baseline block sweep — (bm, bn, ck) grid around the shipped default.

Usage: python experiments/minplus_kernels.py [N]
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.utils.benchmark import time_fn

VMEM = 128 * 1024 * 1024


def _rank1_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k_grid, bk, unroll):
    pid_k = pl.program_id(2)

    @pl.when(pid_k == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, jnp.inf)

    def body(c, acc):
        off = pl.multiple_of(c * unroll, unroll)
        a_c = a_ref[:, pl.ds(off, unroll)]     # (bm, unroll)
        b_c = b_ref[pl.ds(off, unroll), :]     # (unroll, bn)
        for j in range(unroll):
            acc = jnp.minimum(acc, a_c[:, j:j + 1] + b_c[j:j + 1, :])
        return acc

    acc_ref[:] = jax.lax.fori_loop(0, bk // unroll, body, acc_ref[:])

    @pl.when(pid_k == n_k_grid - 1)
    def _store():
        o_ref[:] = acc_ref[:]


def _rank8_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k_grid, bk):
    pid_k = pl.program_id(2)

    @pl.when(pid_k == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, jnp.inf)

    def body(c, acc):
        off = pl.multiple_of(c * 8, 8)
        a_c = a_ref[:, pl.ds(off, 8)]          # (bm, 8)
        b_c = b_ref[pl.ds(off, 8), :]          # (8, bn)
        mapped = a_c[:, :, None] + b_c[None, :, :]
        return jnp.minimum(acc, jnp.min(mapped, axis=1))

    acc_ref[:] = jax.lax.fori_loop(0, bk // 8, body, acc_ref[:])

    @pl.when(pid_k == n_k_grid - 1)
    def _store():
        o_ref[:] = acc_ref[:]


def run_variant(kernel, a, b, bm, bn, bk, **kw):
    m, k = a.shape
    n = b.shape[1]
    grid = (m // bm, n // bn, k // bk)
    f = pl.pallas_call(
        functools.partial(kernel, n_k_grid=grid[2], bk=bk, **kw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, c: (c, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, c: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM),
    )
    return jax.jit(f)(a, b)


def median3(fn, args, ops, iters=6):
    return sorted(ops / time_fn(fn, [args], iters=iters) / 1e12
                  for _ in range(3))[1]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(1, 10, (n, n)).astype(np.float32))
    b = jnp.asarray(rng.uniform(1, 10, (n, n)).astype(np.float32))
    jax.block_until_ready((a, b))
    ops = 2.0 * n * n * n
    sample = np.minimum.reduce(
        np.asarray(a)[:8, :, None] + np.asarray(b)[None, :, :8], axis=1)

    def check(out):
        np.testing.assert_allclose(np.asarray(out)[:8, :8], sample,
                                   rtol=1e-6)

    base = jax.jit(lambda x, y: matmul(x, y, semiring="min_plus"))
    check(base(a, b))
    print(f"A baseline (shipped)        : {median3(base, (a, b), ops):6.2f} "
          f"TOp/s", flush=True)

    for bm, bn, bk, unroll in [(8, 2048, 2048, 128), (16, 2048, 2048, 128),
                               (32, 1024, 2048, 128), (16, 2048, 2048, 8)]:
        try:
            fn = jax.jit(lambda x, y, t=(bm, bn, bk, unroll): run_variant(
                _rank1_kernel, x, y, t[0], t[1], t[2], unroll=t[3]))
            check(fn(a, b))
            print(f"B rank1 bm={bm:3d} bn={bn} bk={bk} u={unroll:3d}: "
                  f"{median3(fn, (a, b), ops):6.2f} TOp/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B rank1 bm={bm} u={unroll}: FAIL {type(e).__name__}: "
                  f"{str(e)[:110]}", flush=True)

    for bm, bn, bk in [(8, 2048, 2048), (16, 2048, 2048), (32, 2048, 1024)]:
        try:
            fn = jax.jit(lambda x, y, t=(bm, bn, bk): run_variant(
                _rank8_kernel, x, y, t[0], t[1], t[2]))
            check(fn(a, b))
            print(f"C rank8 bm={bm:3d} bn={bn} bk={bk}      : "
                  f"{median3(fn, (a, b), ops):6.2f} TOp/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"C rank8 bm={bm}: FAIL {type(e).__name__}: "
                  f"{str(e)[:110]}", flush=True)

    for bm, bn, bk, ck in [(16, 2048, 2048, 1024), (8, 2048, 2048, 1024),
                           (8, 4096, 2048, 512), (32, 2048, 2048, 256)]:
        try:
            cfg = GemmConfig(dtype="float32", semiring="min_plus",
                             block_m=bm, block_n=bn, block_k=bk,
                             vmem_limit_bytes=VMEM)
            fn = jax.jit(lambda x, y, c=cfg, k=ck: matmul(
                x, y, semiring="min_plus", config=c.replace()) if k is None
                else __import__("gemm_hls_tpu.ops.pallas_vpu",
                                fromlist=["vpu_matmul"]).vpu_matmul(
                    x, y, cfg=c, sr=_MP, k_actual=x.shape[1], ck=k))
            check(fn(a, b))
            print(f"D shipped bm={bm:3d} bn={bn} bk={bk} ck={ck:4d}: "
                  f"{median3(fn, (a, b), ops):6.2f} TOp/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"D shipped bm={bm} ck={ck}: FAIL {type(e).__name__}: "
                  f"{str(e)[:110]}", flush=True)


from gemm_hls_tpu.ops.semiring import get_semiring
_MP = get_semiring("min_plus")


if __name__ == "__main__":
    main()
