"""f64-accurate GEMM on the bf16 path (Ozaki slices + float-float sums)."""

import numpy as np
import pytest

from gemm_hls_tpu.ops.ozaki import ozaki_matmul, slice_plan, split_f64
from gemm_hls_tpu.utils import make_operands


def test_split_is_exact_and_bf16_representable():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1e3, 1e3, (32, 32))
    slice_bits, n_slices = slice_plan(1024)
    s = split_f64(x, slice_bits, n_slices)
    # Reconstruction error below the dropped-tail bound.
    recon = s.sum(axis=0)
    rel = np.abs(recon - x) / np.maximum(np.abs(x), 1e-300)
    assert rel.max() < 2.0 ** (-(slice_bits * n_slices) + 2)
    # Every slice element fits bfloat16 exactly (<= 8 mantissa bits).
    import ml_dtypes
    for sl in s:
        roundtrip = sl.astype(ml_dtypes.bfloat16).astype(np.float64)
        np.testing.assert_array_equal(roundtrip, sl)


def test_slice_plan_exactness_constraint():
    for k in (128, 1024, 8192, 65536):
        bits, n = slice_plan(k)
        assert 2 * bits + int(np.ceil(np.log2(k))) <= 24
        assert bits * n >= 40  # enough mantissa coverage for ~1e-14


@pytest.mark.parametrize("mnk", [(64, 48, 128), (33, 65, 127)])
def test_f64_accuracy(mnk):
    m, n, k = mnk
    a, b = make_operands(m, n, k, "float64", low=-5.0, high=5.0)
    exp = a @ b
    got = ozaki_matmul(a, b, interpret=True)
    rel = np.abs(got - exp) / np.maximum(np.abs(exp), 1e-300)
    assert rel.max() < 1e-12, f"max rel {rel.max():.2e}"


def test_beats_plain_f32_by_orders_of_magnitude():
    a, b = make_operands(48, 48, 96, "float64", low=1.0, high=10.0)
    exp = a @ b
    f32_err = np.abs(a.astype(np.float32) @ b.astype(np.float32) - exp) / exp
    ozaki_err = np.abs(ozaki_matmul(a, b, interpret=True) - exp) / exp
    assert ozaki_err.max() < f32_err.max() * 1e-5


def test_wide_dynamic_range():
    # Elements spanning 16 orders of magnitude: the per-vector fixed grids
    # truncate contributions far below the row/column max, so accuracy
    # degrades gracefully (documented Ozaki property) but stays far beyond
    # plain f32 (~1e-3 here).
    rng = np.random.default_rng(1)
    a = rng.uniform(1, 2, (16, 64)) * 10.0 ** rng.integers(-8, 8, (16, 64))
    b = rng.uniform(1, 2, (64, 16)) * 10.0 ** rng.integers(-8, 8, (64, 16))
    exp = a @ b
    got = ozaki_matmul(a, b, interpret=True)
    rel = np.abs(got - exp) / np.maximum(np.abs(exp), 1e-300)
    assert rel.max() < 1e-8, f"max rel {rel.max():.2e}"


def test_normwise_full_f64_accuracy():
    # The scheme's guarantee is normwise: |C - C_exact| <= eps * ||a_i|| ||b_j||.
    # Elementwise relative error can inflate at cancelled (near-zero) outputs.
    a, b = make_operands(64, 64, 256, "float64", low=-5.0, high=5.0)
    exp = a @ b
    got = ozaki_matmul(a, b, interpret=True)
    normwise = np.abs(got - exp) / (
        np.linalg.norm(a, axis=1)[:, None] * np.linalg.norm(b, axis=0)[None, :])
    assert normwise.max() < 1e-14, f"normwise {normwise.max():.2e}"


def test_distributed_ozaki_on_mesh():
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul_distributed
    from gemm_hls_tpu.parallel.mesh import make_mesh
    mesh = make_mesh((2, 4))
    a, b = make_operands(32, 64, 64, "float64", low=-5.0, high=5.0)
    got = ozaki_matmul_distributed(a, b, mesh)
    exp = a @ b
    normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                 * np.linalg.norm(b, axis=0)[None, :])
    assert normw.max() < 5e-14, f"normwise {normw.max():.2e}"


def test_slice_plan_k_bound():
    with pytest.raises(ValueError, match="exactness bound"):
        slice_plan(1 << 23)
    # Largest supported K still satisfies the constraint.
    bits, _ = slice_plan(1 << 22)
    assert 2 * bits + 22 <= 24


def test_int8_variant_f64_accuracy():
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8
    a, b = make_operands(48, 64, 96, "float64", low=-5.0, high=5.0)
    got = ozaki_matmul_int8(a, b)
    exp = a @ b
    normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                 * np.linalg.norm(b, axis=0)[None, :])
    assert normw.max() < 1e-13, f"normwise {normw.max():.2e}"


def test_int8_variant_k_bound():
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8
    # The staged path accumulates int32 across all of K -> hard bound.
    with pytest.raises(ValueError, match="exactness bound"):
        ozaki_matmul_int8(np.zeros((4, 1 << 18)), np.zeros((1 << 18, 4)),
                          fused=False)


def test_int8_fused_large_k():
    """K beyond the staged path's 2^17 bound stays f64-accurate (the fused
    kernel accumulates int32 per K block only, flushing error-free into
    float-float — so K is unbounded)."""
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8
    k = (1 << 17) + 256
    a, b = make_operands(8, 8, k, "float64", low=-2.0, high=2.0)
    got = ozaki_matmul_int8(a, b)
    exp = a @ b
    normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                 * np.linalg.norm(b, axis=0)[None, :])
    assert normw.max() < 1e-13, f"normwise {normw.max():.2e}"


def test_int8_fused_matches_staged():
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8
    a, b = make_operands(40, 70, 90, "float64", low=-5.0, high=5.0)
    fused = ozaki_matmul_int8(a, b, fused=True)
    staged = ozaki_matmul_int8(a, b, fused=False)
    exp = a @ b
    for got, name in ((fused, "fused"), (staged, "staged")):
        normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                     * np.linalg.norm(b, axis=0)[None, :])
        assert normw.max() < 1e-13, f"{name}: {normw.max():.2e}"
    np.testing.assert_allclose(fused, staged, rtol=1e-12)


def test_int8_distributed_matches_oracle():
    """Fused int8 f64-class GEMM over a 2x2 mesh (gather-SUMMA)."""
    import jax
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8_distributed
    from gemm_hls_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((2, 2), ("x", "y"))
    rng = np.random.default_rng(13)
    a = rng.uniform(-5, 5, (96, 140))
    b = rng.uniform(-5, 5, (140, 88))
    got = ozaki_matmul_int8_distributed(a, b, mesh)
    exp = a @ b
    normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                 * np.linalg.norm(b, axis=0)[None, :])
    assert normw.max() < 1e-13, f"normwise {normw.max():.2e}"


def test_int8_distributed_awkward_k():
    """Regression: K values where round_up(k, px*py*256) is not divisible by
    the preferred 2048 K block (e.g. K=2500 -> kp=3072 on a 2x2 mesh) must
    shrink the block instead of crashing (ADVICE r1)."""
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8_distributed
    from gemm_hls_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((2, 2), ("x", "y"))
    rng = np.random.default_rng(17)
    a = rng.uniform(-5, 5, (32, 2500))
    b = rng.uniform(-5, 5, (2500, 32))
    # target_rel=1e-6 keeps the interpret-mode slice triangle small.
    got = ozaki_matmul_int8_distributed(a, b, mesh, target_rel=1e-6)
    exp = a @ b
    normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                 * np.linalg.norm(b, axis=0)[None, :])
    assert normw.max() < 1e-6, f"normwise {normw.max():.2e}"


def test_device_split_reconstructs():
    """device_split_int8 (double-single f32 arithmetic) must reconstruct
    the f64 input to the ~48 bits the (hi, lo) f32 pair carries."""
    import jax.numpy as jnp
    from gemm_hls_tpu.ops.ozaki import (
        INT8_SLICE_BITS, device_split_int8, f64_to_f32pair,
    )

    rng = np.random.default_rng(3)
    x = rng.uniform(-1e3, 1e3, (24, 40))
    hi, lo = f64_to_f32pair(x)
    assert np.max(np.abs((hi.astype(np.float64) + lo) - x)
                  / np.abs(x)) < 2.0 ** -46
    slices, ulp = device_split_int8(jnp.asarray(hi), jnp.asarray(lo),
                                    n_slices=8, axis=1)
    recon = np.zeros_like(x)
    for i in range(8):
        recon += (np.asarray(slices[i], np.float64)
                  * 2.0 ** (-INT8_SLICE_BITS * i))
    recon *= np.asarray(ulp, np.float64)
    rowmax = np.max(np.abs(x), axis=1, keepdims=True)
    assert np.max(np.abs(recon - x) / rowmax) < 2.0 ** -44


def test_int8_device_split_end_to_end():
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8

    rng = np.random.default_rng(11)
    a = rng.uniform(-5, 5, (48, 100))
    b = rng.uniform(-5, 5, (100, 72))
    exp = a @ b
    na = (np.linalg.norm(a, axis=1)[:, None]
          * np.linalg.norm(b, axis=0)[None, :])
    got = ozaki_matmul_int8(a, b, split="device")
    assert np.max(np.abs(got - exp) / na) < 1e-12
