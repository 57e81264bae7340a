from gemm_hls_tpu.tools.autotune import (
    _bucket, autotune, candidate_configs,
)


def test_bucket():
    assert _bucket(1000) == 1024
    assert _bucket(1024) == 1024
    assert _bucket(1025) == 2048


def test_candidates_feasible_and_clamped():
    cands = candidate_configs(256, 256, 256, "float32", "plus_times")
    assert cands
    for c in cands:
        assert c.block_m <= 256 and c.block_n <= 256 and c.block_k <= 256
        c.validate()
    vpu = candidate_configs(4096, 4096, 4096, "float32", "min_plus")
    assert all(not_cfg.block_n >= 512 for not_cfg in vpu)


def test_autotune_caches(tmp_path, monkeypatch):
    # Force interpret-mode runs so this works on CPU; tiny problem.
    import gemm_hls_tpu.tools.autotune as at

    def tiny_candidates(m, n, k, dtype, semiring, max_candidates=6):
        from gemm_hls_tpu.config import GemmConfig
        return [GemmConfig(dtype=dtype, semiring=semiring, block_m=16,
                           block_n=128, block_k=64, interpret=True),
                GemmConfig(dtype=dtype, semiring=semiring, block_m=32,
                           block_n=128, block_k=64, interpret=True)]

    monkeypatch.setattr(at, "candidate_configs", tiny_candidates)
    cache = str(tmp_path / "cache.json")
    cfg1 = autotune(64, 128, 64, dtype="float32", cache_path=cache, iters=1)
    assert cfg1.block_m in (16, 32)
    # Second call hits the cache (candidates not consulted).
    monkeypatch.setattr(at, "candidate_configs",
                        lambda *a, **kw: (_ for _ in ()).throw(AssertionError))
    cfg2 = autotune(64, 128, 64, dtype="float32", cache_path=cache)
    assert (cfg2.block_m, cfg2.block_n, cfg2.block_k) == (
        cfg1.block_m, cfg1.block_n, cfg1.block_k)
