"""Adversarial multi-chip conformance fuzz (VERDICT r1 #3): tile-unaligned
global shapes, transpose flags, every paddable semiring, and degenerate /
rectangular meshes across the distributed algorithms, verified against the
host oracle — the mesh-level extension of the reference's adversarial test
dims (``CMakeLists.txt:155-159``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu.parallel import distributed_matmul
from gemm_hls_tpu.parallel.mesh import make_mesh
from gemm_hls_tpu.utils import (
    check_result, make_operands, reference_matmul, tolerance_for,
)

MESHES = [(1, 8), (8, 1), (4, 2), (2, 4), (2, 2)]
SEMIRINGS = ["plus_times", "min_plus", "max_plus", "max_min", "plus_sqdiff"]

RNG = np.random.default_rng(99)
CASES = []
for i in range(20):
    mesh_shape = MESHES[int(RNG.integers(0, len(MESHES)))]
    m, n, k = (int(RNG.integers(3, 120)) for _ in range(3))
    semiring = SEMIRINGS[int(RNG.integers(0, len(SEMIRINGS)))]
    ta, tb = bool(RNG.integers(0, 2)), bool(RNG.integers(0, 2))
    algorithm = "summa"
    if mesh_shape[0] == mesh_shape[1] and not (ta or tb) and i % 3 == 0:
        algorithm = "cannon"
    CASES.append((i, mesh_shape, m, n, k, semiring, ta, tb, algorithm))


@pytest.mark.parametrize("i,mesh_shape,m,n,k,semiring,ta,tb,algorithm", CASES)
def test_distributed_fuzz(i, mesh_shape, m, n, k, semiring, ta, tb, algorithm):
    mesh = make_mesh(mesh_shape)
    a, b = make_operands(m, n, k, "float32", seed=1000 + i,
                         transpose_a=ta, transpose_b=tb)
    exp = reference_matmul(a, b, semiring=semiring,
                           transpose_a=ta, transpose_b=tb)
    out = distributed_matmul(jnp.asarray(a), jnp.asarray(b), mesh,
                             semiring=semiring, algorithm=algorithm,
                             transpose_a=ta, transpose_b=tb)
    assert out.shape == (m, n)
    ok, err = check_result(np.asarray(out), exp, rtol=tolerance_for("float32"))
    assert ok, (f"case {i}: mesh {mesh_shape} {m}x{n}x{k} {semiring} "
                f"ta={ta} tb={tb} {algorithm}: err {err:.3e}")


def test_distributed_matmul_rejects_unpaddable_semiring():
    mesh = make_mesh((2, 2))
    a, b = make_operands(8, 8, 9, "float32")  # K=9 not divisible by 4
    with pytest.raises(ValueError, match="absorbing"):
        distributed_matmul(jnp.asarray(a), jnp.asarray(b), mesh,
                           semiring="max_times")


def test_distributed_matmul_bf16_unaligned():
    mesh = make_mesh((2, 4))
    a, b = make_operands(45, 77, 33, "bfloat16", seed=7)
    exp = reference_matmul(a, b)
    out = distributed_matmul(jnp.asarray(a), jnp.asarray(b), mesh,
                             out_dtype="float32")
    ok, err = check_result(np.asarray(out), exp, rtol=2e-2)
    assert ok, f"bf16 unaligned: err {err:.3e}"


def test_integer_semiring_unaligned_k_no_overflow():
    """Self-review r2: integer min_plus/max_plus K-padding must not wrap
    around (INT32_MAX + INT32_MAX = -2 would win every min)."""
    mesh = make_mesh((2, 2))
    rng = np.random.default_rng(23)
    a = rng.integers(0, 50, (8, 9)).astype(np.int32)   # K=9: padded to 16
    b = rng.integers(0, 50, (9, 8)).astype(np.int32)
    for semiring in ("min_plus", "max_plus"):
        exp = reference_matmul(a, b, semiring=semiring)
        out = distributed_matmul(jnp.asarray(a), jnp.asarray(b), mesh,
                                 semiring=semiring)
        np.testing.assert_array_equal(np.asarray(out), exp)
