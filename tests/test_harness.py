"""Verification + benchmark harness semantics (reference Utility.h /
RunHardware.cpp protocol)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gemm_hls_tpu.utils.benchmark import gflops, percent_of_peak, time_fn
from gemm_hls_tpu.utils.verify import (
    check_result, make_operands, reference_matmul, tolerance_for,
    verify_matmul,
)
from gemm_hls_tpu.tools.print_specifications import main as print_specs_main


def test_make_operands_deterministic():
    a1, b1 = make_operands(8, 8, 8)
    a2, b2 = make_operands(8, 8, 8)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
    # Reference distribution: U(1, 10) (TestSimulation.cpp:46-55).
    assert a1.min() >= 1.0 and a1.max() <= 10.0


def test_tolerances():
    assert tolerance_for("float32") == 1e-3  # reference 1e-3
    assert tolerance_for("int32") == 0.0     # exact
    assert tolerance_for("bfloat16") == 2e-2


def test_check_result_exact_int():
    x = np.array([[1, 2]], dtype=np.int32)
    ok, err = check_result(x, x)
    assert ok and err == 0
    ok, _ = check_result(x, x + 1)
    assert not ok


def test_check_result_inf_handling():
    # min_plus on disconnected graphs produces +inf; must match exactly.
    exp = np.array([[1.0, np.inf]])
    ok, _ = check_result(np.array([[1.0, np.inf]]), exp)
    assert ok
    ok, _ = check_result(np.array([[1.0, 1e30]]), exp)
    assert not ok


def test_verify_matmul_raises_with_stats():
    exp = np.ones((2, 2))
    with pytest.raises(AssertionError, match="verification FAILED"):
        verify_matmul(np.full((2, 2), 1.5), exp)


def test_reference_blas_vs_naive_blocking():
    # Blocked sweep must equal unblocked (exercises the row-chunk loop).
    a, b = make_operands(50, 60, 70)
    full = reference_matmul(a, b, semiring="min_plus")
    small = reference_matmul(a, b, semiring="min_plus", block_bytes=10_000)
    np.testing.assert_array_equal(full, small)


def test_gflops_formula():
    # GOp/s = 1e-9 * 2NKM / t (RunHardware.cpp:174-180)
    assert gflops(1000, 1000, 1000, 2.0) == pytest.approx(1.0)
    assert percent_of_peak(100.0, 1e12) == pytest.approx(10.0)


def test_time_fn_runs():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((128, 128), jnp.float32)
    t = time_fn(f, [(x,)], iters=3, warmup=1)
    assert t > 0


def test_print_specifications_cli(capsys):
    spec = print_specs_main(["1024", "1024", "1024", "--dtype", "bfloat16",
                             "--chip", "v5e"])
    out = capsys.readouterr().out
    assert "Peak performance" in out
    assert spec["chip"] == "v5e"
    spec2 = print_specs_main(["512", "512", "512", "--semiring", "min_plus",
                              "--chip", "v5e"])
    assert spec2["peak_flops"] < spec["peak_flops"]


def test_interleaved_medians_protocol(monkeypatch):
    """Shared suite protocol: interleaved rounds, peak-sanity re-measure
    then drop, medians per fn, error when nothing sane survives."""
    from gemm_hls_tpu.utils import benchmark as bm

    flops = 1e9
    # Sequence of per-call seconds: fn0 alternates sane readings, fn1 has
    # one impossible (too-fast) reading that stays impossible on retry.
    times = iter([1.0, 1.0,          # round 1: fn0 sane, fn1 sane
                  2.0, 1e-6, 1e-6,   # round 2: fn0 sane, fn1 hiccups twice
                  1.0, 1.0])         # round 3
    monkeypatch.setattr(bm, "time_fn", lambda *a, **k: next(times))
    med0, med1 = bm.interleaved_medians(
        (object(), object()), (None,), flops, peak_gflops=10.0)
    assert med0 == flops / 1.0 / 1e9   # median of [1, 0.5, 1] GF readings
    assert med1 == flops / 1.0 / 1e9   # hiccup round dropped

    always_fast = iter([1e-9] * 12)
    monkeypatch.setattr(bm, "time_fn", lambda *a, **k: next(always_fast))
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="physically possible"):
        bm.interleaved_medians((object(),), (None,), flops,
                               peak_gflops=10.0)
