import pytest

from gemm_hls_tpu.config import LANE, sublane
from gemm_hls_tpu.tools.tile_optimizer import main, optimal_tiles, tile_candidates


def test_candidates_aligned():
    for bm, bn, bk in tile_candidates("bfloat16"):
        assert bm % sublane("bfloat16") == 0
        assert bn % LANE == 0
        assert bk % LANE == 0


def test_optimal_fits_budget():
    budget = 32 * 1024 * 1024
    cfg = optimal_tiles("float32", vmem_budget=budget)
    assert cfg.vmem_bytes() <= budget
    cfg.validate()


def test_larger_budget_never_more_io():
    # More fast memory must never increase communication — the monotonicity
    # the reference heuristic relies on (optimal_memory_tile_size.py:32-51).
    m = n = k = 8192
    small = optimal_tiles("float32", vmem_budget=16 << 20, m=m, n=n, k=k)
    large = optimal_tiles("float32", vmem_budget=96 << 20, m=m, n=n, k=k)
    assert large.io_volume_bytes(m, n, k) <= small.io_volume_bytes(m, n, k)


def test_balanced_preference():
    cfg = optimal_tiles("bfloat16", vmem_budget=64 << 20)
    ratio = max(cfg.block_m, cfg.block_n) / min(cfg.block_m, cfg.block_n)
    assert ratio <= 2


def test_infeasible_budget_raises():
    with pytest.raises(ValueError, match="no feasible"):
        optimal_tiles("float32", vmem_budget=1000)


def test_small_problem_clamps():
    cfg = optimal_tiles("float32", vmem_budget=64 << 20, m=256, n=256, k=256)
    assert cfg.block_m <= 256
    assert cfg.block_n <= 256


def test_cli(capsys):
    main(["--dtype", "bfloat16", "--vmem-bytes", str(48 << 20),
          "--m", "4096", "--n", "4096", "--k", "4096"])
    out = capsys.readouterr().out
    assert "block_m=" in out and "io_volume_bytes=" in out
