"""Weight-only quantization: quantizer invariants + fused-dequant kernel
conformance (interpreter mode, host-dequant oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu import GemmConfig
from gemm_hls_tpu.ops.quant import (
    dequantize_weights, matmul_quantized, quantize_weights,
)

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("bits,g,tol", [
    (8, None, 1 / 127), (8, 64, 1 / 127), (4, 64, 1 / 7), (4, None, 1 / 7),
])
def test_quantizer_roundtrip_error_bound(bits, g, tol):
    w = RNG.standard_normal((256, 128)).astype(np.float32)
    wq, s = quantize_weights(w, bits=bits, group_size=g)
    wd = dequantize_weights(wq, s, bits=bits, group_size=g)
    # Symmetric quantization: per-group max-abs error <= scale/2 ~= tol/2
    # of the group max; bound loosely at tol of the global max.
    assert np.abs(wd - w).max() <= tol * np.abs(w).max() + 1e-7
    assert wq.dtype == np.int8
    assert s.dtype == np.float32


def test_quantizer_rejects_bad_args():
    w = np.zeros((64, 32), np.float32)
    with pytest.raises(ValueError):
        quantize_weights(w, bits=5)
    with pytest.raises(ValueError):
        quantize_weights(w, group_size=48)       # doesn't divide K
    with pytest.raises(ValueError):
        quantize_weights(w, bits=4, group_size=31)


def test_int4_packing_is_planar():
    # Row i of the packed group = (low: row i, high: row i + g/2).
    w = RNG.standard_normal((8, 4)).astype(np.float32)
    wq, s = quantize_weights(w, bits=4, group_size=8)
    q = np.rint(w / s[0]).clip(-7, 7).astype(np.int8)
    lo = ((wq.astype(np.int8) << 4).astype(np.int8) >> 4)
    hi = wq.astype(np.int8) >> 4
    np.testing.assert_array_equal(lo, q[:4])
    np.testing.assert_array_equal(hi, q[4:])


@pytest.mark.parametrize("bits,g", [(8, None), (8, 64), (4, 64), (4, None)])
def test_fused_matmul_matches_host_dequant(bits, g):
    w = RNG.standard_normal((256, 128)).astype(np.float32)
    x = RNG.standard_normal((32, 256)).astype(np.float32)
    wq, s = quantize_weights(w, bits=bits, group_size=g)
    got = np.asarray(matmul_quantized(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(s), bits=bits,
        group_size=g, interpret=True))
    ref = x @ dequantize_weights(wq, s, bits=bits, group_size=g)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fused_matmul_multi_kblock_int8():
    # Per-channel int8 with K split across 4 grid steps.
    w = RNG.standard_normal((512, 128)).astype(np.float32)
    x = RNG.standard_normal((16, 512)).astype(np.float32)
    wq, s = quantize_weights(w, bits=8)
    cfg = GemmConfig(dtype="float32", block_m=16, block_n=128, block_k=128)
    got = np.asarray(matmul_quantized(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(s), bits=8,
        config=cfg, interpret=True))
    ref = x @ dequantize_weights(wq, s, bits=8)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_multi_group_per_block_matches_oracle():
    # block_k = 2 groups: the kernel folds scales pre-dot.
    w = RNG.standard_normal((256, 128)).astype(np.float32)
    x = jnp.asarray(RNG.standard_normal((8, 256)), jnp.float32)
    for bits in (8, 4):
        wq, s = quantize_weights(w, bits=bits, group_size=64)
        from gemm_hls_tpu.ops.pallas_dequant import dequant_matmul

        got = np.asarray(dequant_matmul(
            x, jnp.asarray(wq), jnp.asarray(s),
            cfg=GemmConfig(dtype="float32", block_m=8, block_n=128,
                           block_k=128),
            bits=bits, group_size=64, interpret=True))
        ref = np.asarray(x) @ dequantize_weights(wq, s, bits=bits,
                                                 group_size=64)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fused_matmul_rejects_mismatches():
    w = RNG.standard_normal((256, 128)).astype(np.float32)
    x = jnp.asarray(RNG.standard_normal((8, 256)), jnp.float32)
    wq, s = quantize_weights(w, bits=8, group_size=64)
    with pytest.raises(ValueError):
        # group_size larger than block_k (scales would straddle blocks).
        from gemm_hls_tpu.ops.pallas_dequant import dequant_matmul

        dequant_matmul(x, *map(jnp.asarray, quantize_weights(
            w, bits=8, group_size=128)),
            cfg=GemmConfig(dtype="float32", block_m=8, block_n=128,
                           block_k=64),
            bits=8, group_size=128, interpret=True)
    with pytest.raises(ValueError):
        matmul_quantized(x, jnp.asarray(wq).astype(jnp.int32),
                         jnp.asarray(s), bits=8, group_size=64,
                         interpret=True)


def test_quantized_end_to_end_error_is_quantization_bounded():
    # The fused kernel's end-to-end error vs the FP weights equals the
    # quantization error, not a kernel artifact.
    w = (RNG.standard_normal((256, 128)) / 16).astype(np.float32)
    x = RNG.standard_normal((16, 256)).astype(np.float32)
    wq, s = quantize_weights(w, bits=8)
    got = np.asarray(matmul_quantized(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(s), bits=8,
        interpret=True))
    ref = x @ w
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_w8a8_matches_quantized_oracle():
    from gemm_hls_tpu.ops.pallas_dequant import quantize_activations
    from gemm_hls_tpu.ops.quant import matmul_w8a8

    w = RNG.standard_normal((256, 128)).astype(np.float32)
    x = RNG.standard_normal((32, 256)).astype(np.float32)
    for g in (None, 64):
        wq, s = quantize_weights(w, bits=8, group_size=g)
        got = np.asarray(matmul_w8a8(jnp.asarray(x), jnp.asarray(wq),
                                     jnp.asarray(s), group_size=g,
                                     interpret=True))
        xq, sx = quantize_activations(jnp.asarray(x))
        ref = (np.asarray(xq, np.float32) * np.asarray(sx)) \
            @ dequantize_weights(wq, s, bits=8, group_size=g)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_w8a8_end_to_end_error_bounded():
    from gemm_hls_tpu.ops.quant import matmul_w8a8

    w = (RNG.standard_normal((512, 256)) / 16).astype(np.float32)
    x = RNG.standard_normal((64, 512)).astype(np.float32)
    wq, s = quantize_weights(w, bits=8)
    got = np.asarray(matmul_w8a8(jnp.asarray(x), jnp.asarray(wq),
                                 jnp.asarray(s), interpret=True))
    ref = x @ w
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_w8a8_zero_row_guard():
    from gemm_hls_tpu.ops.pallas_dequant import quantize_activations

    x = jnp.zeros((8, 64), jnp.float32)
    xq, sx = quantize_activations(x)
    assert np.isfinite(np.asarray(sx)).all()
    np.testing.assert_array_equal(np.asarray(xq), 0)


def test_w8a8_fused_quant_multi_kblock_matches_blockwise_oracle():
    """The fused path quantizes activations per (row, K-block): exact
    parity with a host oracle using the same scale grid."""
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.pallas_dequant import w8a8_matmul

    m, k, n, bk = 32, 512, 128, 256
    w = (RNG.standard_normal((k, n)) / np.sqrt(k)).astype(np.float32)
    x = RNG.standard_normal((m, k)).astype(np.float32)
    wq, s = quantize_weights(w, bits=8)
    cfg = default_config("int8").replace(block_m=32, block_n=128,
                                         block_k=bk, out_dtype="float32",
                                         interpret=True)
    got = np.asarray(w8a8_matmul(jnp.asarray(x), jnp.asarray(wq),
                                 jnp.asarray(s), cfg=cfg, interpret=True))
    # Host oracle with the identical per-(row, K-block) scale grid.
    ref = np.zeros((m, n), np.float32)
    wd = dequantize_weights(wq, s, bits=8)
    for b in range(k // bk):
        xt = x[:, b * bk:(b + 1) * bk]
        ax = np.abs(xt).max(axis=1, keepdims=True)
        sx = np.where(ax == 0, 0.0, ax / 127.0)
        r = np.where(ax == 0, 0.0, 127.0 / ax)
        xq = np.clip(np.round(xt * r), -127, 127)
        ref += (xq * sx) @ wd[b * bk:(b + 1) * bk]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_w8a8_fused_no_less_accurate_than_unfused():
    """Per-block activation scales are a finer grid than per-row: the
    fused path's end-to-end error must not exceed the unfused path's
    (with slack for rounding luck)."""
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.pallas_dequant import w8a8_matmul

    m, k, n = 64, 1024, 256
    w = (RNG.standard_normal((k, n)) / np.sqrt(k)).astype(np.float32)
    # Blockwise-heterogeneous magnitudes: where per-row scales hurt.
    x = RNG.standard_normal((m, k)).astype(np.float32)
    x[:, : k // 2] *= 50.0
    wq, s = quantize_weights(w, bits=8)
    cfg = default_config("int8").replace(block_m=64, block_n=256,
                                         block_k=256, out_dtype="float32",
                                         interpret=True)
    ref = x @ w
    errs = {}
    for fuse in (True, False):
        got = np.asarray(w8a8_matmul(jnp.asarray(x), jnp.asarray(wq),
                                     jnp.asarray(s), cfg=cfg,
                                     interpret=True, fuse_quant=fuse))
        errs[fuse] = np.abs(got - ref).max() / np.abs(ref).max()
    assert errs[True] <= errs[False] * 1.1, errs


def test_w8a8_fused_groupwise_scales():
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.pallas_dequant import w8a8_matmul

    m, k, n, g = 32, 512, 128, 256
    w = (RNG.standard_normal((k, n)) / np.sqrt(k)).astype(np.float32)
    x = RNG.standard_normal((m, k)).astype(np.float32)
    wq, s = quantize_weights(w, bits=8, group_size=g)
    cfg = default_config("int8").replace(block_m=32, block_n=128,
                                         block_k=g, out_dtype="float32",
                                         interpret=True)
    got = np.asarray(w8a8_matmul(jnp.asarray(x), jnp.asarray(wq),
                                 jnp.asarray(s), cfg=cfg, group_size=g,
                                 interpret=True))
    ref = x @ w
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_w8a8_fused_zero_rows_are_zero():
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.pallas_dequant import w8a8_matmul

    x = np.zeros((32, 256), np.float32)
    x[3] = RNG.standard_normal(256)
    w = (RNG.standard_normal((256, 128)) / 16).astype(np.float32)
    wq, s = quantize_weights(w, bits=8)
    cfg = default_config("int8").replace(block_m=32, block_n=128,
                                         block_k=128, out_dtype="float32",
                                         interpret=True)
    got = np.asarray(w8a8_matmul(jnp.asarray(x), jnp.asarray(wq),
                                 jnp.asarray(s), cfg=cfg, interpret=True))
    assert np.isfinite(got).all()
    assert np.abs(got[0]).max() == 0
    assert np.abs(got[3]).max() > 0
