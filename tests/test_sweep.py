"""Sweep manager semantics — build_manager.py analogue (SURVEY.md §2 #14)."""

import pytest

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.tools.sweep import (
    SweepResult, best_result, expand_grid, merge_csvs, run_one, sweep,
    to_csv,
)

# Small interpreter-mode base so sweeps run on CPU.
BASE = GemmConfig(interpret=True)


def test_expand_grid():
    grid = expand_grid(block_m=[16, 32], block_n=[128], block_k=[64, 128])
    assert len(grid) == 4
    assert {"block_m", "block_n", "block_k"} == set(grid[0])


def test_run_one_ok():
    cfg = BASE.replace(block_m=16, block_n=128, block_k=64)
    res = run_one(cfg, 32, 128, 64, iters=1)
    assert res.status == "ok"
    assert res.gflops and res.gflops > 0
    assert res.max_rel_err is not None and res.max_rel_err <= 1e-3


def test_run_one_invalid_config():
    cfg = GemmConfig(block_n=100)  # not lane-aligned, compiled mode
    res = run_one(cfg, 64, 64, 64)
    assert res.status == "invalid_config"
    assert "block_n" in res.detail


def test_run_one_vmem_overflow_classified():
    cfg = GemmConfig(block_m=4096, block_n=4096, block_k=4096)
    res = run_one(cfg, 64, 64, 64)
    assert res.status in ("invalid_config", "vmem_overflow")


def test_sweep_and_csv():
    grid = expand_grid(block_m=[16, 32], block_n=[128], block_k=[64])
    results = sweep(grid, 32, 128, 64, base=BASE, iters=1)
    assert len(results) == 2
    assert all(r.status == "ok" for r in results)
    text = to_csv(results)
    lines = text.strip().splitlines()
    assert lines[0].startswith("m,n,k,dtype,semiring,block_m")
    assert len(lines) == 3
    # Problem dims are recorded so the CSV is self-describing for merge.
    assert lines[1].startswith("32,128,64,")


def test_sweep_generic_semiring():
    grid = expand_grid(block_m=[16], block_n=[128], block_k=[64])
    results = sweep(grid, 16, 128, 64,
                    base=BASE.replace(semiring="min_plus"), iters=1)
    assert results[0].status == "ok"


def test_best_result():
    r1 = SweepResult(BASE, "ok", seconds=1.0, gflops=10.0)
    r2 = SweepResult(BASE, "ok", seconds=0.5, gflops=20.0)
    r3 = SweepResult(BASE, "crashed")
    assert best_result([r1, r2, r3]) is r2
    assert best_result([r3]) is None


def test_sweep_checkpoint_resume(tmp_path):
    ckpt = str(tmp_path / "sweep.csv")
    grid = expand_grid(block_m=[16, 32], block_n=[128], block_k=[64])
    r1 = sweep(grid, 32, 128, 64, base=BASE, iters=1, checkpoint_csv=ckpt)
    assert all(r.status == "ok" for r in r1)
    # Second run resumes everything from the CSV without re-executing.
    r2 = sweep(grid, 32, 128, 64, base=BASE, iters=1, checkpoint_csv=ckpt)
    assert all("[resumed]" in r.detail for r in r2)
    assert [r.gflops for r in r2] == pytest.approx([r.gflops for r in r1], rel=1e-2)


def test_run_one_timeout():
    import time as _time
    from gemm_hls_tpu.tools import sweep as sweep_mod

    # Monkeypatch-free: drive the alarm with an artificially slow verify by
    # timing out a real (but tiny) run with an absurdly small budget.
    cfg = BASE.replace(block_m=16, block_n=128, block_k=64)
    res = sweep_mod.run_one(cfg, 32, 128, 64, iters=1, timeout_s=1e-4,
                            retries=2)
    assert res.status == "timeout"
    assert "exceeded" in res.detail


def test_run_one_no_timeout_when_fast():
    res = run_one(BASE.replace(block_m=16, block_n=128, block_k=64),
                  32, 128, 64, iters=1, timeout_s=300)
    assert res.status == "ok"


def test_isolated_sweep_survives_crash_and_hang(tmp_path):
    """VERDICT r1 #5: a hard crash (child os._exit — not even an exception)
    and a hang must be contained by process isolation, classified, and the
    scan must complete and checkpoint; a rerun resumes the good results."""
    from gemm_hls_tpu.tools.sweep import run_one, sweep

    cfg = GemmConfig(dtype="float32", block_m=16, block_n=128, block_k=64,
                     interpret=True)

    crashed = run_one(cfg, 32, 128, 64, verify=False, iters=1,
                      isolation="process", platform="cpu",
                      setup_code="import os; os._exit(42)", timeout_s=120)
    assert crashed.status == "crashed"
    assert "42" in crashed.detail

    hung = run_one(cfg, 32, 128, 64, verify=False, iters=1,
                   isolation="process", platform="cpu",
                   setup_code="import time; time.sleep(600)", timeout_s=3)
    assert hung.status == "timeout"
    assert "killed" in hung.detail

    # A full scan containing a healthy config still completes + checkpoints.
    ck = str(tmp_path / "iso.csv")
    grid = [dict(block_m=16, block_n=128, block_k=64)]
    res = sweep(grid, 32, 128, 64, base=cfg, verify=False, iters=1,
                isolation="process", platform="cpu", timeout_s=120,
                checkpoint_csv=ck)
    assert [r.status for r in res] == ["ok"]
    resumed = sweep(grid, 32, 128, 64, base=cfg, verify=False, iters=1,
                    isolation="process", platform="cpu", timeout_s=120,
                    checkpoint_csv=ck)
    assert "[resumed]" in resumed[0].detail


def test_isolated_sweep_parallel_workers(tmp_path):
    """workers>1 runs isolated children concurrently and preserves order."""
    from gemm_hls_tpu.tools.sweep import sweep

    base = GemmConfig(dtype="float32", interpret=True)
    grid = [dict(block_m=16, block_n=128, block_k=64),
            dict(block_m=32, block_n=128, block_k=64),
            dict(block_m=16, block_n=128, block_k=32)]
    res = sweep(grid, 32, 128, 64, base=base, verify=False, iters=1,
                isolation="process", platform="cpu", workers=3, timeout_s=300)
    assert [r.status for r in res] == ["ok", "ok", "ok"]
    assert [r.config.block_m for r in res] == [16, 32, 16]


def test_run_one_unreliable_timing_classified(monkeypatch):
    """A reading that stays above the hardware peak after retries is
    published as unreliable_timing, not as a record (ADVICE r1 bench.py
    finding, extended to the sweep)."""
    from gemm_hls_tpu.models import perf_model
    from gemm_hls_tpu.tools import sweep as sweep_mod

    class TinyChip:
        name = "tiny"

        def peak_for(self, dtype):
            return 1.0  # 1 FLOP/s: every real measurement exceeds it

    monkeypatch.setattr(perf_model, "detect_chip", lambda: TinyChip())
    calls = {"n": 0}
    real_time_fn = sweep_mod.time_fn

    def counting_time_fn(*a, **kw):
        calls["n"] += 1
        return real_time_fn(*a, **kw)

    monkeypatch.setattr(sweep_mod, "time_fn", counting_time_fn)
    cfg = BASE.replace(block_m=16, block_n=128, block_k=64)
    res = run_one(cfg, 32, 128, 64, iters=1, verify=False)
    assert res.status == "unreliable_timing"
    assert calls["n"] == 3  # initial + 2 re-measures before giving up
    assert res.gflops is not None


def test_merge_csvs_keep_best(tmp_path):
    """merge verb: ok beats failure, higher gflops beats lower, unique
    configs union — the reference merge_files semantics
    (build_manager.py:671-693)."""
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    a.write_text(
        "m,n,k,dtype,semiring,block_m,block_n,block_k,precision,status,"
        "seconds,gflops,max_rel_err,detail\n"
        "64,64,64,float32,plus_times,16,128,64,default,ok,0.1,50.00,,\n"
        "64,64,64,float32,plus_times,32,128,64,default,crashed,,,,boom\n")
    b.write_text(
        "m,n,k,dtype,semiring,block_m,block_n,block_k,precision,status,"
        "seconds,gflops,max_rel_err,detail\n"
        "64,64,64,float32,plus_times,16,128,64,default,ok,0.05,90.00,,\n"
        "64,64,64,float32,plus_times,32,128,64,default,ok,0.2,20.00,,\n"
        "64,64,64,float32,min_plus,16,128,64,default,ok,0.3,10.00,,\n")
    out = tmp_path / "merged.csv"
    merge_csvs([str(a), str(b)], str(out))
    import csv as _csv

    rows = list(_csv.DictReader(open(out)))
    assert len(rows) == 3  # 2 deduped + 1 unique
    by_blk = {(r["semiring"], r["block_m"]): r for r in rows}
    # Machine b's faster reading wins for (16,...).
    assert by_blk[("plus_times", "16")]["gflops"] == "90.00"
    # ok (machine b) beats crashed (machine a) for (32,...).
    assert by_blk[("plus_times", "32")]["status"] == "ok"
    assert by_blk[("min_plus", "16")]["gflops"] == "10.00"


def test_merge_csvs_legacy_schema(tmp_path):
    """CSVs from the pre-m/n/k schema merge without error (blank dims)."""
    a = tmp_path / "old.csv"
    a.write_text(
        "dtype,semiring,block_m,block_n,block_k,precision,status,seconds,"
        "gflops,max_rel_err,detail\n"
        "float32,plus_times,16,128,64,default,ok,0.1,50.00,,\n")
    text = merge_csvs([str(a)])
    lines = text.strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("m,n,k,dtype")
    assert ",50.00," in lines[1]


def test_merge_cli(tmp_path):
    from gemm_hls_tpu.tools.sweep import main

    a = tmp_path / "a.csv"
    a.write_text(
        "m,n,k,dtype,semiring,block_m,block_n,block_k,precision,status,"
        "seconds,gflops,max_rel_err,detail\n"
        "64,64,64,float32,plus_times,16,128,64,default,ok,0.1,50.00,,\n")
    out = tmp_path / "m.csv"
    main(["merge", str(a), str(a), "-o", str(out)])
    assert out.exists()
    assert len(out.read_text().strip().splitlines()) == 2


def test_cli_config_product(tmp_path):
    """CLI sweeps dtype x semiring products, not just block triples."""
    from gemm_hls_tpu.tools.sweep import main

    out = tmp_path / "prod.csv"
    results = main([
        "--m", "32", "--n", "128", "--k", "64",
        "--dtype", "float32,bfloat16", "--semiring", "plus_times",
        "--block-m", "16", "--block-n", "128", "--block-k", "64",
        "--no-verify", "--iters", "1", "--csv", str(out)])
    assert len(results) == 2
    assert {r.config.dtype for r in results} == {"float32", "bfloat16"}
