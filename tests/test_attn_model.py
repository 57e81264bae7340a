"""Analytical attention model: structure + calibration sanity."""

import pytest

from gemm_hls_tpu.models.attn_model import (
    attention_bwd_specifications, attention_specifications,
)
from gemm_hls_tpu.models.perf_model import get_chip

CHIP = get_chip("v5e")


def test_matches_committed_captures_within_15pct():
    # docs/BENCHMARKS.md flash table (v5e, bf16): the model must stay
    # within +-15% of the middle of each measured band.
    cases = [
        # Round-5 autotuned winners (in-kernel scale fold): S=1024
        # single-kv-block at 167.0 TF, S=4096 whole-row at 153.2 TF.
        ((32, 1024, 1024, 128), dict(block_q=1024, block_kv=1024), 167.0),
        ((8, 4096, 4096, 128), dict(block_q=256, block_kv=4096), 153.2),
    ]
    for args, kw, measured in cases:
        spec = attention_specifications(*args, chip=CHIP, dtype="bfloat16",
                                        **kw)
        ratio = spec["expected_tflops"] / measured
        assert 0.85 < ratio < 1.15, (args, spec["expected_tflops"], measured)


def test_bwd_matches_committed_captures_within_15pct():
    # artifacts/flash_bwd_v5e.csv round-5 captures (B=64, S=2048, D=128,
    # full mask): midpoints of the two capture runs per winner config.
    cases = [
        ("dq", dict(block_q=1024, block_kv=2048), 194.8),
        ("dkv", dict(block_q=512, block_kv=2048), 178.5),
    ]
    for kern, kw, measured in cases:
        spec = attention_bwd_specifications(64, 2048, 2048, 128,
                                            kernel=kern, chip=CHIP,
                                            dtype="bfloat16", **kw)
        ratio = spec["expected_tflops"] / measured
        assert 0.85 < ratio < 1.15, (kern, spec["expected_tflops"], measured)


def test_bwd_contraction_convention():
    dq = attention_bwd_specifications(8, 1024, 1024, 128, kernel="dq",
                                      chip=CHIP)
    dkv = attention_bwd_specifications(8, 1024, 1024, 128, kernel="dkv",
                                       chip=CHIP)
    assert dq["contractions"] == 3 and dkv["contractions"] == 4
    # Same area, so the flops scale exactly with the contraction count.
    assert dkv["flops"] / dq["flops"] == pytest.approx(4 / 3)
    with pytest.raises(ValueError):
        attention_bwd_specifications(8, 1024, 1024, 128, kernel="dx",
                                     chip=CHIP)


def test_bwd_causal_tri_grid_skips_latch_and_mxu():
    full = attention_bwd_specifications(8, 4096, 4096, 128, kernel="dkv",
                                        block_q=512, block_kv=512,
                                        chip=CHIP)
    caus = attention_bwd_specifications(8, 4096, 4096, 128, kernel="dkv",
                                        causal=True, block_q=512,
                                        block_kv=512, chip=CHIP)
    # Flattened live-block grid: dead blocks pay neither MXU nor latch.
    assert 0.5 <= caus["live_fraction"] < 0.57
    assert caus["latch_s"] == pytest.approx(
        full["latch_s"] * caus["live_fraction"])
    assert caus["mxu_s"] == pytest.approx(
        full["mxu_s"] * caus["live_fraction"])


def test_causal_halves_mxu_leg_at_fine_blocks():
    full = attention_specifications(4, 4096, 4096, 128, block_q=128,
                                    block_kv=128, chip=CHIP)
    caus = attention_specifications(4, 4096, 4096, 128, causal=True,
                                    block_q=128, block_kv=128, chip=CHIP)
    assert 0.5 <= caus["live_fraction"] < 0.55
    assert caus["mxu_s"] < 0.55 * full["mxu_s"]


def test_window_reduces_live_fraction_further():
    caus = attention_specifications(1, 8192, 8192, 128, causal=True,
                                    block_q=256, block_kv=256, chip=CHIP)
    win = attention_specifications(1, 8192, 8192, 128, causal=True,
                                   window=1024, block_q=256, block_kv=256,
                                   chip=CHIP)
    assert win["live_fraction"] < 0.3 * caus["live_fraction"] + 0.05


def test_decode_is_memory_bound():
    spec = attention_specifications(32, 1, 2048, 128, block_q=8,
                                    block_kv=512, chip=CHIP)
    assert spec["bound"] == "memory"
    assert spec["hbm_s"] > 10 * spec["mxu_s"]


def test_flash_saves_the_probability_traffic():
    spec = attention_specifications(32, 1024, 1024, 128, chip=CHIP)
    # 2 * B * S^2 bf16 bytes (write + read of P) never spent.
    assert spec["probability_bytes_saved"] == 2 * 32 * 1024 * 1024 * 2
