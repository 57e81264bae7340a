"""Generic-semiring (VPU path) correctness — the configurable map/reduce
operator capability (reference ``MM_MAP_OP``/``MM_REDUCE_OP``,
``include/Config.h.in:34-35``) on the software-simulation path."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.utils import make_operands, reference_matmul, verify_matmul

CFG = GemmConfig(block_m=16, block_n=128, block_k=64, interpret=True)

SEMIRINGS_F32 = ["min_plus", "max_plus", "max_min", "min_max", "max_times"]


@pytest.mark.parametrize("name", SEMIRINGS_F32)
def test_semirings_f32_aligned(name):
    a, b = make_operands(32, 256, 128, "float32")
    exp = reference_matmul(a, b, semiring=name)
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring=name, config=CFG)
    verify_matmul(np.asarray(out), exp, what=name)


@pytest.mark.parametrize("name", SEMIRINGS_F32)
def test_semirings_f32_unaligned(name):
    # K-tail masking to the reduce identity (reference Compute.cpp:112-137).
    a, b = make_operands(21, 130, 77, "float32")
    exp = reference_matmul(a, b, semiring=name)
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring=name, config=CFG)
    verify_matmul(np.asarray(out), exp, what=name)


def test_max_times_negative_values():
    # The masking approach (vs pad-value tricks) must survive all-negative
    # products.
    a, b = make_operands(9, 140, 13, "float32", low=-10.0, high=-1.0)
    exp = reference_matmul(a, b, semiring="max_times")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="max_times", config=CFG)
    verify_matmul(np.asarray(out), exp)


def test_min_plus_int32():
    a, b = make_operands(17, 129, 33, "int32")
    exp = reference_matmul(a, b, semiring="min_plus")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="min_plus",
                 config=CFG.replace(dtype="int32"))
    np.testing.assert_array_equal(np.asarray(out), exp)


def test_or_and_bool_reachability():
    # Default route: MXU int8 counting (exact over {0,1}).
    a, b = make_operands(19, 131, 23, "bool")
    exp = reference_matmul(a, b, semiring="or_and")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="or_and", config=CFG)
    assert out.dtype == jnp.bool_
    np.testing.assert_array_equal(np.asarray(out), exp)


@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True), (True, True)])
def test_or_and_mxu_transposes(ta, tb):
    rng = np.random.default_rng(7)
    m, n, k = 21, 45, 67
    a = rng.random((k, m) if ta else (m, k)) < 0.1
    b = rng.random((n, k) if tb else (k, n)) < 0.1
    exp = reference_matmul(a.T if ta else a, b.T if tb else b,
                           semiring="or_and")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="or_and",
                 transpose_a=ta, transpose_b=tb, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), exp)


def test_or_and_bitpacked_k_sweep():
    # backend="pallas-vpu" forces the bit-packed VPU encoding (32
    # contraction bits per int32 word): cover K below / at / straddling /
    # beyond word and block boundaries, plus single-bit tails
    # (K % 32 == 1) where a bit-order mistake flips reachability.
    rng = np.random.default_rng(11)
    for k in (1, 31, 32, 33, 64, 100, 257, 1024):
        a = rng.random((17, k)) < 0.08
        b = rng.random((k, 35)) < 0.08
        exp = reference_matmul(a, b, semiring="or_and")
        out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="or_and",
                     backend="pallas-vpu", interpret=True)
        np.testing.assert_array_equal(np.asarray(out), exp, err_msg=f"k={k}")


def test_backend_pallas_vpu_plus_times():
    # The escape hatch runs even the arithmetic semiring on the VPU kernel.
    a, b = make_operands(24, 131, 40, "float32")
    out = matmul(jnp.asarray(a), jnp.asarray(b), backend="pallas-vpu",
                 config=CFG)
    verify_matmul(np.asarray(out), reference_matmul(a, b))


def test_or_and_bitpack_helpers_roundtrip():
    from gemm_hls_tpu.ops.matmul import _pack_bits_cols, _pack_bits_rows

    rng = np.random.default_rng(3)
    x = rng.random((5, 70)) < 0.5
    rows = np.asarray(_pack_bits_rows(jnp.asarray(x)))
    assert rows.shape == (5, 3)  # ceil(70/32)
    # bit j of word w == x[:, 32*w + j]
    for m in range(5):
        for kk in range(70):
            bit = (rows[m, kk // 32] >> (kk % 32)) & 1
            assert bool(bit) == bool(x[m, kk]), (m, kk)
    cols = np.asarray(_pack_bits_cols(jnp.asarray(x.T.copy())))
    np.testing.assert_array_equal(cols, rows.T)


def test_min_plus_distance_product():
    # Distance-product sanity: one relaxation step of APSP on a small graph.
    inf = np.inf
    d = np.array([[0, 3, inf], [inf, 0, 1], [2, inf, 0]], dtype=np.float32)
    exp = reference_matmul(d, d, semiring="min_plus")
    out = matmul(jnp.asarray(d), jnp.asarray(d), semiring="min_plus",
                 config=GemmConfig(block_m=8, block_n=8, block_k=8, interpret=True))
    np.testing.assert_allclose(np.asarray(out), exp)


def test_vpu_transposes():
    a, b = make_operands(20, 50, 30, "float32", transpose_a=True, transpose_b=True)
    exp = reference_matmul(a, b, semiring="min_plus", transpose_a=True,
                           transpose_b=True)
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="min_plus",
                 config=CFG, transpose_a=True, transpose_b=True)
    verify_matmul(np.asarray(out), exp)


def test_xla_backend_generic_semiring():
    a, b = make_operands(23, 45, 67, "float32")
    exp = reference_matmul(a, b, semiring="min_plus")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="min_plus",
                 backend="xla", config=CFG)
    verify_matmul(np.asarray(out), exp)


def test_log_plus_forward_algorithm():
    # log-space sum-product: C = logsumexp_k(A + B) — HMM forward step.
    a, b = make_operands(9, 130, 17, "float32", low=-2.0, high=2.0)
    exp = reference_matmul(a, b, semiring="log_plus")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="log_plus", config=CFG)
    verify_matmul(np.asarray(out), exp, rtol=1e-4)


def test_vmap_over_matmul():
    # Batched semiring matmul via jax.vmap over the public API.
    import jax
    ops = [make_operands(16, 24, 32, "float32", seed=i) for i in range(8)]
    a3 = np.stack([a for a, _ in ops])
    b3 = np.stack([b for _, b in ops])
    f = jax.vmap(lambda x, y: matmul(x, y, config=CFG))
    out = f(jnp.asarray(a3), jnp.asarray(b3))
    for i in range(8):
        verify_matmul(np.asarray(out[i]),
                      a3[i].astype(np.float64) @ b3[i].astype(np.float64))


def test_vpu_out_dtype_override():
    a, b = make_operands(16, 128, 32, "float32")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="min_plus",
                 config=CFG, out_dtype="bfloat16")
    assert str(out.dtype) == "bfloat16"


def test_acc_dtype_override():
    from gemm_hls_tpu.config import GemmConfig
    cfg = CFG.replace(acc_dtype="float32", dtype="bfloat16")
    a, b = make_operands(16, 128, 32, "bfloat16")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="max_plus",
                 config=cfg, out_dtype="float32")
    exp = reference_matmul(a, b, semiring="max_plus")
    verify_matmul(np.asarray(out), exp, rtol=1e-2)


def test_bool_rejected_for_arithmetic_semiring():
    import pytest
    a, b = make_operands(8, 8, 8, "bool")
    # plus_times on bool routes to XLA (documented); min_plus on bool is
    # rejected by supports_dtype.
    with pytest.raises(ValueError, match="does not support"):
        matmul(jnp.asarray(a), jnp.asarray(b), semiring="min_plus", config=CFG)


def test_min_plus_int8_widened_acc():
    # int8 inputs accumulate in int32 on the VPU path (width conversion).
    a, b = make_operands(9, 129, 40, "int8", low=1, high=5)
    exp = reference_matmul(a, b, semiring="min_plus")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="min_plus",
                 config=CFG.replace(dtype="int8"), out_dtype="int32")
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), exp)


def test_plus_absdiff_l1_distances():
    a, b = make_operands(17, 130, 33, "float32")
    exp = reference_matmul(a, b, semiring="plus_absdiff")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="plus_absdiff",
                 config=CFG)
    verify_matmul(np.asarray(out), exp)
    # cross-check directly: L1 distance of row i of A vs column j of B
    i, j = 3, 7
    np.testing.assert_allclose(
        np.asarray(out)[i, j], np.abs(a[i] - b[:, j]).sum(), rtol=1e-5)


def test_plus_sqdiff_l2_distances():
    a, b = make_operands(12, 129, 20, "float32")
    exp = reference_matmul(a, b, semiring="plus_sqdiff")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="plus_sqdiff",
                 config=CFG)
    verify_matmul(np.asarray(out), exp)
