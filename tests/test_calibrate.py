"""First-run self-calibration for unknown chip generations."""

import json
import warnings

import numpy as np
import pytest

from gemm_hls_tpu.models import perf_model
from gemm_hls_tpu.tools import calibrate


def test_fit_latch_two_point_slope():
    # Same work at 16 vs 512 grid steps: the roofline terms cancel.
    t_roofline = 10e-3
    latch = 2.2e-7
    t1 = t_roofline + 16 * latch
    t2 = t_roofline + 512 * latch
    got = calibrate.fit_latch(t1, 16, t2, 512)
    assert abs(got - latch) / latch < 1e-12
    assert calibrate.fit_latch(5e-3, 10, 4e-3, 20) == 0.0  # clamped
    with pytest.raises(ValueError):
        calibrate.fit_latch(1.0, 20, 1.0, 10)


class _FakeDev:
    def __init__(self, kind):
        self.device_kind = kind


def _fake_tpu(monkeypatch, kind):
    monkeypatch.setattr(perf_model.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(perf_model.jax, "devices",
                        lambda *a: [_FakeDev(kind)])


def test_detect_chip_uses_calibration_for_unknown_kind(monkeypatch,
                                                       tmp_path):
    cache = tmp_path / "calibration.json"
    cache.write_text(json.dumps({
        "tpu v9 hyper": {"measured_bf16_flops": 394e12,
                         "grid_step_overhead_s": 1.1e-7,
                         "timestamp": 0.0}}))
    monkeypatch.setattr(calibrate, "CALIBRATION_CACHE", str(cache))
    _fake_tpu(monkeypatch, "TPU v9 Hyper")
    spec = perf_model.detect_chip()
    assert spec.name == "tpu v9 hyper"
    assert spec.grid_step_overhead_s == pytest.approx(1.1e-7)
    # datasheet-shaped roofline rescaled to the measured engine rate
    assert spec.peak_flops["bfloat16"] == pytest.approx(394e12)
    assert spec.peak_flops["int8"] == pytest.approx(2 * 394e12)
    assert spec.vpu_ops == pytest.approx(
        perf_model.get_chip("v5e").vpu_ops * 2)


def test_detect_chip_warns_without_calibration(monkeypatch, tmp_path):
    monkeypatch.setattr(calibrate, "CALIBRATION_CACHE",
                        str(tmp_path / "missing.json"))
    _fake_tpu(monkeypatch, "TPU v9 Hyper")
    with pytest.warns(UserWarning, match="calibrate"):
        spec = perf_model.detect_chip()
    assert spec.name == "v5e"  # fallback constants


def test_detect_chip_known_kinds_skip_calibration(monkeypatch, tmp_path):
    monkeypatch.setattr(calibrate, "CALIBRATION_CACHE",
                        str(tmp_path / "missing.json"))
    _fake_tpu(monkeypatch, "TPU v5 lite0")
    assert perf_model.detect_chip().name == "v5e"


def test_run_calibration_persists_and_memoizes(monkeypatch, tmp_path):
    cache = tmp_path / "calibration.json"
    monkeypatch.setattr(calibrate, "CALIBRATION_CACHE", str(cache))
    # Don't spend CPU time seeding autotune in the unit test.
    from gemm_hls_tpu.tools import autotune
    monkeypatch.setattr(autotune, "autotune",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("should be monkeypatched out")))
    calls = []
    monkeypatch.setattr(autotune, "autotune", lambda *a, **k: calls.append(a))
    e = calibrate.run_calibration(cache_path=str(cache), n_probe=128)
    assert e["measured_bf16_flops"] > 0
    assert e["grid_step_overhead_s"] >= 0
    data = json.loads(cache.read_text())
    assert len(data) == 1 and list(data.values())[0] == e
    assert len(calls) == 1  # autotune seeding requested
    # second call returns the persisted entry without re-measuring
    e2 = calibrate.run_calibration(cache_path=str(cache), n_probe=128)
    assert e2 == e and len(calls) == 1
