"""Boolean-reachability (or_and) encodings on real hardware.

Measures the three device encodings of C[i,j] = OR_k (A[i,k] AND B[k,j])
at 4096^3, reporting effective TOp/s counting 2*M*N*K logical ops (the
same accounting as every other semiring row in docs/BENCHMARKS.md):

  1. MXU int8 counting (the default route): 0/1 -> int8, plus_times into
     int32, != 0.
  2. Bit-packed VPU (backend="pallas-vpu"): 32 k-bits per int32 lane word.
  3. Legacy one-bool-per-int32-lane VPU (reconstructed inline; what the
     repo shipped through round 2).
  4. XLA baseline: jnp.dot on int8 + != 0.

Usage: python experiments/orand_bench.py [N]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.ops import pallas_vpu
from gemm_hls_tpu.ops.semiring import Semiring
from gemm_hls_tpu.utils.benchmark import time_fn

import numpy as np


def median3(fn, args, ops, iters=8):
    vals = sorted(ops / time_fn(fn, [args], iters=iters) / 1e12
                  for _ in range(3))
    return vals[1]


def legacy_orand(a, b):
    """Round-2 encoding: one bool per int32 lane, map=min, reduce=max."""
    sr = Semiring(name="or_and_int", map_op=jnp.minimum,
                  reduce_op=jnp.maximum, identity=0,
                  np_map=np.minimum, np_reduce=np.maximum,
                  reduce_axis=jnp.max)
    cfg = GemmConfig(dtype="int32", out_dtype="int32", acc_dtype="int32",
                     block_m=16, block_n=2048, block_k=2048,
                     vmem_limit_bytes=128 * 1024 * 1024)
    out = pallas_vpu.vpu_matmul(a.astype(jnp.int32), b.astype(jnp.int32),
                                cfg=cfg, sr=sr, k_actual=a.shape[1])
    return out != 0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.random((n, n)) < 0.001)
    b = jnp.asarray(rng.random((n, n)) < 0.001)
    jax.block_until_ready((a, b))
    ops = 2.0 * n * n * n

    exp = np.asarray(jax.jit(
        lambda x, y: jnp.dot(x.astype(jnp.int8), y.astype(jnp.int8),
                             preferred_element_type=jnp.int32) != 0)(a, b))

    for label, fn in [
        ("mxu_int8_counting", jax.jit(
            lambda x, y: matmul(x, y, semiring="or_and"))),
        ("vpu_bitpacked", jax.jit(
            lambda x, y: matmul(x, y, semiring="or_and",
                                backend="pallas-vpu"))),
        ("vpu_legacy_int32_lanes", jax.jit(legacy_orand)),
        ("xla_int8_dot", jax.jit(
            lambda x, y: jnp.dot(x.astype(jnp.int8), y.astype(jnp.int8),
                                 preferred_element_type=jnp.int32) != 0)),
    ]:
        try:
            out = np.asarray(fn(a, b))
            ok = bool((out == exp).all())
            t = median3(fn, (a, b), ops)
            print(f"{label:26s}: {t:8.2f} TOp/s  correct={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:26s}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
