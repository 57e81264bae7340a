"""fp32-class GEMM on the int8 path (integer slice decomposition)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu.ops.int8_slices import _quantize_slices, fp32_matmul_int8
from gemm_hls_tpu.utils import make_operands


def test_quantize_reconstructs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-100, 100, (16, 32)).astype(np.float32))
    slices, ulp = _quantize_slices(x, axis=1)
    recon = sum(slices[i].astype(np.float32) * np.asarray(ulp) * 2.0 ** (-7 * i)
                for i in range(3))
    rel = np.abs(recon - np.asarray(x)) / np.abs(np.asarray(ulp)) / 2 ** 14
    assert rel.max() < 1.0  # residual below the last slice's ulp


@pytest.mark.parametrize("mnk", [(64, 96, 128), (33, 65, 127)])
def test_accuracy_beats_default_precision(mnk):
    m, n, k = mnk
    a, b = make_operands(m, n, k, "float32", low=-5.0, high=5.0)
    got = np.asarray(fp32_matmul_int8(jnp.asarray(a), jnp.asarray(b),
                                      block_m=32, block_n=128, block_k=128))
    exp = a.astype(np.float64) @ b
    normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                 * np.linalg.norm(b, axis=0)[None, :])
    # ~2^-21 normwise; far beyond the bf16 single-pass (~2^-11) level.
    assert normw.max() < 2e-6, f"normwise {normw.max():.2e}"


def test_wide_magnitudes():
    rng = np.random.default_rng(3)
    a = (rng.uniform(-1, 1, (24, 48)) * 10.0 **
         rng.integers(-3, 4, (24, 48))).astype(np.float32)
    b = (rng.uniform(-1, 1, (48, 24)) * 10.0 **
         rng.integers(-3, 4, (48, 24))).astype(np.float32)
    got = np.asarray(fp32_matmul_int8(jnp.asarray(a), jnp.asarray(b),
                                      block_m=32, block_n=128, block_k=128))
    exp = a.astype(np.float64) @ b
    normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                 * np.linalg.norm(b, axis=0)[None, :] + 1e-30)
    assert normw.max() < 1e-5, f"normwise {normw.max():.2e}"


def test_k_bound_staged_only():
    a = jnp.zeros((8, 1 << 18), jnp.float32)
    b = jnp.zeros((1 << 18, 8), jnp.float32)
    # Staged path accumulates int32 across all of K -> hard bound.
    with pytest.raises(ValueError, match="exactness bound"):
        fp32_matmul_int8(a, b, fused=False)


def test_fused_matches_staged_and_large_k():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(-3, 3, (40, 200)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-3, 3, (200, 72)).astype(np.float32))
    exp = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    for ns in (2, 3):
        got = np.asarray(fp32_matmul_int8(a, b, n_slices=ns, block_m=32,
                                          block_n=128, block_k=256,
                                          fused=True))
        normw = np.abs(got - exp) / (
            np.linalg.norm(a, axis=1)[:, None]
            * np.linalg.norm(b, axis=0)[None, :])
        bound = 3e-4 if ns == 2 else 2e-6
        assert normw.max() < bound, f"n_slices={ns}: {normw.max():.2e}"
    # K beyond the staged bound works on the fused path.
    k = (1 << 17) + 128
    a2 = jnp.asarray(rng.uniform(-1, 1, (8, k)).astype(np.float32))
    b2 = jnp.asarray(rng.uniform(-1, 1, (k, 8)).astype(np.float32))
    got = np.asarray(fp32_matmul_int8(a2, b2, block_m=32, block_n=128,
                                      block_k=2048))
    exp = np.asarray(a2, np.float64) @ np.asarray(b2, np.float64)
    normw = np.abs(got - exp) / (np.linalg.norm(a2, axis=1)[:, None]
                                 * np.linalg.norm(b2, axis=0)[None, :])
    assert normw.max() < 2e-6, f"large-K normwise {normw.max():.2e}"


def test_int8_slices_gradients():
    import jax
    a, b = make_operands(24, 32, 40, "float32", low=-2.0, high=2.0)
    a, b = jnp.asarray(a), jnp.asarray(b)
    ga, gb = jax.grad(lambda x, y: jnp.sum(fp32_matmul_int8(
        x, y, block_m=32, block_n=128, block_k=128) ** 2),
        argnums=(0, 1))(a, b)
    ra, rb = jax.grad(lambda x, y: jnp.sum((x @ y) ** 2), argnums=(0, 1))(a, b)
    # Normwise closeness (the scheme's guarantee), generous elementwise atol.
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-3,
                               atol=np.abs(np.asarray(ra)).max() * 1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-3,
                               atol=np.abs(np.asarray(rb)).max() * 1e-4)


def test_precision_i8_via_matmul_api():
    from gemm_hls_tpu import matmul
    a, b = make_operands(40, 70, 90, "float32", low=-3.0, high=3.0)
    out = matmul(jnp.asarray(a), jnp.asarray(b), precision="i8x3")
    exp = a.astype(np.float64) @ b
    normw = np.abs(np.asarray(out) - exp) / (
        np.linalg.norm(a, axis=1)[:, None] * np.linalg.norm(b, axis=0)[None, :])
    assert normw.max() < 2e-6
    with pytest.raises(ValueError, match="i8x"):
        matmul(jnp.asarray(a), jnp.asarray(b).T, precision="i8x3",
               transpose_b=True)


def test_fast_path_k_near_bound_falls_back():
    """Self-review r2: K values where the unpadded K fits the whole-K int32
    bound but the padded K does not must fall back to the hi/lo kernel
    instead of crashing in fused_int8_fp32's own validation."""
    rng = np.random.default_rng(5)
    k = 44000  # 3*127^2*44000 < 2^31 but padded 45056 exceeds it
    a = jnp.asarray(rng.uniform(-1, 1, (16, k)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (k, 128)).astype(np.float32))
    got = np.asarray(fp32_matmul_int8(a, b, n_slices=3, block_m=16,
                                      block_n=128, block_k=2048, fused=True))
    exp = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                 * np.linalg.norm(b, axis=0)[None, :])
    assert normw.max() < 2e-6, f"normwise {normw.max():.2e}"


def test_i8x4_reaches_f32_output_floor():
    """4 slices (10 truncated-triangle products) reach the f32 *output*
    rounding floor: normwise error well under i8x3's ~2^-21 and under the
    fp32-HIGHEST contract (~2^-22)."""
    from gemm_hls_tpu import matmul
    rng = np.random.default_rng(11)
    m, n, k = 48, 128, 160
    a = jnp.asarray(rng.uniform(1, 10, (m, k)).astype(np.float32))
    b = jnp.asarray(rng.uniform(1, 10, (k, n)).astype(np.float32))
    exp = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    errs = {}
    for mode in ("i8x3", "i8x4"):
        got = np.asarray(matmul(a, b, precision=mode), np.float64)
        errs[mode] = np.linalg.norm(got - exp) / np.linalg.norm(exp)
    assert errs["i8x4"] < errs["i8x3"] / 4, errs
    assert errs["i8x4"] < 2 ** -22, errs
