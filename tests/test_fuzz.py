"""Randomized conformance sweep: shapes x dtypes x semirings x layouts
against the host oracle — the adversarial-size philosophy of the reference's
CMake-computed test dims (``CMakeLists.txt:155-159``), extended to a seeded
random grid."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.utils import (
    check_result, make_operands, reference_matmul, tolerance_for,
)

RNG = np.random.default_rng(1234)

CASES = []
for i in range(24):
    m, n, k = (int(RNG.integers(1, 200)) for _ in range(3))
    dtype = RNG.choice(["float32", "float32", "bfloat16", "int32"])
    if dtype == "int32":
        semiring = str(RNG.choice(["plus_times", "min_plus", "max_plus"]))
    else:
        semiring = str(RNG.choice(["plus_times", "min_plus", "max_plus",
                                   "max_min", "max_times"]))
    ta, tb = bool(RNG.integers(0, 2)), bool(RNG.integers(0, 2))
    if semiring != "plus_times" and (ta or tb):
        ta = tb = False  # tropical grad path handles untransposed only
    CASES.append((i, m, n, k, str(dtype), semiring, ta, tb))


@pytest.mark.parametrize("i,m,n,k,dtype,semiring,ta,tb", CASES)
def test_fuzz_case(i, m, n, k, dtype, semiring, ta, tb):
    bm = int(RNG.choice([8, 16, 32]))
    bn = int(RNG.choice([64, 128]))
    bk = int(RNG.choice([32, 64, 128]))
    cfg = GemmConfig(dtype=dtype, block_m=bm, block_n=bn, block_k=bk,
                     semiring=semiring, interpret=True)
    a, b = make_operands(m, n, k, dtype, seed=i, transpose_a=ta,
                         transpose_b=tb)
    exp = reference_matmul(a, b, semiring=semiring, transpose_a=ta,
                           transpose_b=tb)
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring=semiring,
                 config=cfg, transpose_a=ta, transpose_b=tb)
    assert out.shape == (m, n)
    rtol = tolerance_for(dtype)
    if dtype == "bfloat16":
        rtol = 2e-2
    ok, err = check_result(np.asarray(out), exp, rtol=rtol)
    assert ok, (f"case {i}: {m}x{n}x{k} {dtype} {semiring} ta={ta} tb={tb} "
                f"blocks=({bm},{bn},{bk}): err {err:.3e}")
