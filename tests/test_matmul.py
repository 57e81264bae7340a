"""MXU-path (plus_times) matmul correctness on the software-simulation path.

The reference runs the *actual kernel source* on CPU via hlslib's dataflow
simulation and compares against BLAS with relative 1e-3 tolerance
(``test/TestSimulation.cpp``); here the actual Pallas kernel runs in
interpreter mode against the numpy/BLAS oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.utils import (
    make_operands, reference_matmul, unaligned_sizes, verify_matmul,
)

CFG = GemmConfig(block_m=32, block_n=128, block_k=128, interpret=True)


def run_case(m, n, k, dtype="float32", cfg=CFG, **kw):
    ta = kw.get("transpose_a", False)
    tb = kw.get("transpose_b", False)
    a, b = make_operands(m, n, k, dtype, transpose_a=ta, transpose_b=tb)
    exp = reference_matmul(a, b, transpose_a=ta, transpose_b=tb)
    out = matmul(jnp.asarray(a), jnp.asarray(b), config=cfg, **kw)
    assert out.shape == (m, n)
    return verify_matmul(np.asarray(out), exp)


def test_aligned():
    run_case(64, 256, 256)


def test_single_tile():
    run_case(32, 128, 128)


def test_unaligned_adversarial():
    # Reference CMakeLists.txt:155-159 adversarial size selection.
    m, n, k = unaligned_sizes(CFG)
    run_case(m, n, k)


@pytest.mark.parametrize("m,n,k", [(1, 1, 1), (7, 13, 5), (33, 129, 130)])
def test_tiny_and_odd(m, n, k):
    run_case(m, n, k)


@pytest.mark.parametrize("ta,tb", [(True, False), (False, True), (True, True)])
def test_transposes(ta, tb):
    run_case(65, 140, 131, transpose_a=ta, transpose_b=tb)


def test_bfloat16_fp32_accumulate():
    a, b = make_operands(48, 160, 200, "bfloat16")
    exp = reference_matmul(a, b)
    out = matmul(jnp.asarray(a), jnp.asarray(b),
                 config=CFG.replace(dtype="bfloat16", out_dtype="float32"))
    verify_matmul(np.asarray(out), exp, rtol=1e-2)


def test_int32():
    a, b = make_operands(20, 33, 40, "int32")
    exp = reference_matmul(a, b)
    out = matmul(jnp.asarray(a), jnp.asarray(b), config=CFG.replace(dtype="int32"))
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), exp)


def test_float64():
    a, b = make_operands(24, 40, 56, "float64")
    exp = reference_matmul(a, b)
    out = matmul(jnp.asarray(a), jnp.asarray(b),
                 config=CFG.replace(dtype="float64"))
    verify_matmul(np.asarray(out), exp, rtol=1e-9)


def test_xla_backend_matches():
    a, b = make_operands(40, 70, 90, "float32")
    exp = reference_matmul(a, b)
    out = matmul(jnp.asarray(a), jnp.asarray(b), backend="xla", config=CFG)
    verify_matmul(np.asarray(out), exp)


def test_strict_pad_policy_rejects():
    cfg = CFG.replace(pad_policy="strict")
    a, b = make_operands(33, 128, 128, "float32")
    with pytest.raises(ValueError, match="strict"):
        matmul(jnp.asarray(a), jnp.asarray(b), config=cfg)
    # Divisible sizes pass.
    a, b = make_operands(32, 128, 128, "float32")
    matmul(jnp.asarray(a), jnp.asarray(b), config=cfg)


def test_shape_errors():
    a = jnp.zeros((4, 5), jnp.float32)
    b = jnp.zeros((6, 3), jnp.float32)
    with pytest.raises(ValueError, match="contraction mismatch"):
        matmul(a, b, config=CFG)
    with pytest.raises(ValueError, match="dtype mismatch"):
        matmul(a, jnp.zeros((5, 3), jnp.bfloat16), config=CFG)


def test_grad_matches_xla():
    a, b = make_operands(33, 60, 70, "float32")
    a, b = jnp.asarray(a), jnp.asarray(b)

    def loss_pallas(a, b):
        return jnp.sum(matmul(a, b, config=CFG) ** 2)

    def loss_ref(a, b):
        return jnp.sum((a @ b) ** 2)

    ga, gb = jax.grad(loss_pallas, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-3)


def test_grad_with_transpose():
    a, b = make_operands(33, 60, 70, "float32", transpose_a=True)
    a, b = jnp.asarray(a), jnp.asarray(b)

    def loss_pallas(a, b):
        return jnp.sum(matmul(a, b, config=CFG, transpose_a=True) ** 2)

    def loss_ref(a, b):
        return jnp.sum((a.T @ b) ** 2)

    ga, gb = jax.grad(loss_pallas, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-3)


def test_jit_wrapped():
    a, b = make_operands(40, 129, 100, "float32")
    f = jax.jit(lambda a, b: matmul(a, b, config=CFG))
    out = f(jnp.asarray(a), jnp.asarray(b))
    verify_matmul(np.asarray(out), reference_matmul(a, b))


def test_batched_3d():
    ops = [make_operands(16, 24, 32, "float32", seed=i) for i in range(4)]
    a3 = np.stack([a for a, _ in ops])
    b3 = np.stack([b for _, b in ops])
    out = matmul(jnp.asarray(a3), jnp.asarray(b3), config=CFG)
    assert out.shape == (4, 16, 24)
    for i in range(4):
        verify_matmul(np.asarray(out[i]), reference_matmul(a3[i], b3[i]))


def test_batched_broadcast_b():
    ops = [make_operands(16, 24, 32, "float32", seed=i) for i in range(4)]
    a3 = np.stack([a for a, _ in ops])
    b = ops[0][1]
    out = matmul(jnp.asarray(a3), jnp.asarray(b), config=CFG)
    assert out.shape == (4, 16, 24)
    verify_matmul(np.asarray(out[2]), reference_matmul(a3[2], b))


def test_batched_semiring():
    ops = [make_operands(8, 16, 12, "float32", seed=i) for i in range(3)]
    a3 = np.stack([a for a, _ in ops])
    b3 = np.stack([b for _, b in ops])
    out = matmul(jnp.asarray(a3), jnp.asarray(b3), semiring="min_plus",
                 config=CFG)
    verify_matmul(np.asarray(out[1]),
                  reference_matmul(a3[1], b3[1], semiring="min_plus"))


def test_debug_progress_prints(capfd):
    a, b = make_operands(32, 128, 128, "float32")
    out = matmul(jnp.asarray(a), jnp.asarray(b), config=CFG.replace(debug=True))
    jax.block_until_ready(out)
    captured = capfd.readouterr()
    assert "output tile" in captured.out + captured.err


def test_float16():
    a, b = make_operands(24, 130, 48, "float16")
    exp = reference_matmul(a, b)
    out = matmul(jnp.asarray(a), jnp.asarray(b),
                 config=CFG.replace(dtype="float16", out_dtype="float32"))
    verify_matmul(np.asarray(out), exp, rtol=1e-2)


def test_degenerate_shapes():
    a = jnp.zeros((0, 8), jnp.float32)
    b = jnp.zeros((8, 4), jnp.float32)
    assert matmul(a, b, config=CFG).shape == (0, 4)
    a = jnp.zeros((4, 0), jnp.float32)
    b = jnp.zeros((0, 4), jnp.float32)
    out = matmul(a, b, config=CFG)  # K == 0: reduce identity (0 for +)
    np.testing.assert_array_equal(np.asarray(out), np.zeros((4, 4)))
    out = matmul(a, b, semiring="min_plus", config=CFG)
    assert np.all(np.isinf(np.asarray(out)))
