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


def test_cached_config_lookup_and_guards(tmp_path, monkeypatch):
    """cached_config returns cached winners without measuring, skips
    entries whose padding overhead would exceed 30%, and returns None on
    a miss."""
    import json

    import gemm_hls_tpu.tools.autotune as at
    from gemm_hls_tpu.models.perf_model import detect_chip

    chip = detect_chip().name
    cache = str(tmp_path / "cache.json")
    entry = {"block_m": 16, "block_n": 128, "block_k": 1024,
             "vmem_limit_bytes": 96 * 1024 * 1024}
    with open(cache, "w") as f:
        json.dump({f"{chip}/float32/plus_times/1024x1024x1024": entry}, f)

    hit = at.cached_config(1024, 1024, 1024, dtype="float32",
                           cache_path=cache)
    assert hit is not None and (hit.block_m, hit.block_n, hit.block_k) == (
        16, 128, 1024)
    # K=600 buckets to 1024; bk=1024 pads it 1.7x -> entry rejected.
    assert at.cached_config(1024, 1024, 600, dtype="float32",
                            cache_path=cache) is None
    # Unknown bucket -> miss (seed has no cpu entries for this shape).
    assert at.cached_config(48, 48, 48, dtype="float32",
                            cache_path=cache) is None


def test_cached_config_layout_buckets(tmp_path):
    """Transposed layouts consult their own /tn buckets and carry the
    transpose flags; NN lookups never see layout-tagged entries."""
    import json

    import gemm_hls_tpu.tools.autotune as at
    from gemm_hls_tpu.models.perf_model import detect_chip

    chip = detect_chip().name
    cache = str(tmp_path / "cache.json")
    with open(cache, "w") as f:
        json.dump({f"{chip}/float32/plus_times/1024x1024x1024/tn":
                   {"block_m": 128, "block_n": 256, "block_k": 1024}}, f)
    hit = at.cached_config(1024, 1024, 1024, dtype="float32", layout="tn",
                           cache_path=cache)
    assert hit is not None and hit.transpose_a and not hit.transpose_b
    assert (hit.block_m, hit.block_n, hit.block_k) == (128, 256, 1024)
    assert at.cached_config(1024, 1024, 1024, dtype="float32",
                            cache_path=cache) is None
    assert at.cached_config(1024, 1024, 1024, dtype="float32", layout="nt",
                            cache_path=cache) is None


def test_matmul_adopts_tn_cached_winner(tmp_path, monkeypatch):
    """matmul(transpose_a=True, config=None) picks the /tn bucket winner."""
    import importlib
    import json

    import jax.numpy as jnp
    import numpy as np

    mm = importlib.import_module("gemm_hls_tpu.ops.matmul")
    import gemm_hls_tpu.tools.autotune as at
    from gemm_hls_tpu.models.perf_model import detect_chip

    chip = detect_chip().name
    cache = str(tmp_path / "cache.json")
    with open(cache, "w") as f:
        json.dump({f"{chip}/float32/plus_times/128x128x128/tn":
                   {"block_m": 128, "block_n": 128, "block_k": 128}}, f)
    monkeypatch.setattr(at, "DEFAULT_CACHE", cache)

    seen = {}
    orig = mm._mxu_padded

    def spy(a, b, config):
        seen["blocks"] = (config.block_m, config.block_n, config.block_k)
        seen["ta"] = config.transpose_a
        return orig(a, b, config)

    monkeypatch.setattr(mm, "_mxu_padded", spy)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(1, 2, (128, 128)).astype(np.float32))
    b = jnp.asarray(rng.uniform(1, 2, (128, 128)).astype(np.float32))
    out = mm.matmul(a, b, transpose_a=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(a).T @ np.asarray(b), rtol=1e-5)
    assert seen["blocks"] == (128, 128, 128) and seen["ta"]


def test_batch_block_candidates_bracket_quantum():
    import gemm_hls_tpu.tools.autotune as at

    # 512^3 bf16: bytes_ex = 2*(512*512)*2 + 512*512*2 = 1.5 MiB ->
    # quantum ~5; candidates bracket it and respect bsz / VMEM caps.
    cands = at.batch_block_candidates(64, 512, 512, 512, "bfloat16")
    assert cands == sorted(set(cands))
    assert 1 in cands and any(3 <= c <= 7 for c in cands)
    assert all(1 <= c <= 64 for c in cands)
    # Tiny batch: everything clamps into [1, bsz].
    assert at.batch_block_candidates(2, 512, 512, 512, "bfloat16") == [1, 2]


def test_cached_batch_block_lookup(tmp_path):
    import json

    import gemm_hls_tpu.tools.autotune as at
    from gemm_hls_tpu.models.perf_model import detect_chip

    chip = detect_chip().name
    cache = str(tmp_path / "cache.json")
    with open(cache, "w") as f:
        json.dump({f"{chip}/bfloat16/plus_times/64bx512x512x512":
                   {"batch_block": 6, "gflops": 150000.0}}, f)
    assert at.cached_batch_block(64, 512, 512, 512, dtype="bfloat16",
                                 cache_path=cache) == 6
    # Winner clamps to the (smaller, same-bucket) actual batch.
    assert at.cached_batch_block(40, 512, 512, 512, dtype="bfloat16",
                                 cache_path=cache) == 6
    assert at.cached_batch_block(33, 512, 500, 512, dtype="bfloat16",
                                 cache_path=cache) == 6  # in-bucket shapes
    assert at.cached_batch_block(64, 512, 512, 512, dtype="float32",
                                 cache_path=cache) is None
    assert at.cached_batch_block(128, 512, 512, 512, dtype="bfloat16",
                                 cache_path=cache) is None


def test_autotune_batched_caches(tmp_path, monkeypatch):
    import gemm_hls_tpu.tools.autotune as at

    monkeypatch.setattr(at, "batch_block_candidates",
                        lambda *a, **kw: [1, 2])
    cache = str(tmp_path / "cache.json")
    bb = at.autotune_batched(4, 64, 128, 64, dtype="float32",
                             cache_path=cache, iters=1, rounds=1,
                             interpret=True)
    assert bb in (1, 2)
    # Second call hits the cache (candidates not consulted).
    monkeypatch.setattr(at, "batch_block_candidates",
                        lambda *a, **kw: (_ for _ in ()).throw(AssertionError))
    assert at.autotune_batched(4, 64, 128, 64, dtype="float32",
                               cache_path=cache) == bb


def test_matmul_batched_adopts_cached_batch_block(tmp_path, monkeypatch):
    """The batched dispatch passes the cached batch_block to the kernel."""
    import importlib
    import json

    import jax.numpy as jnp
    import numpy as np

    mm = importlib.import_module("gemm_hls_tpu.ops.matmul")
    import gemm_hls_tpu.tools.autotune as at
    from gemm_hls_tpu.models.perf_model import detect_chip

    chip = detect_chip().name
    cache = str(tmp_path / "cache.json")
    with open(cache, "w") as f:
        json.dump({f"{chip}/float32/plus_times/8bx64x64x64":
                   {"batch_block": 3}}, f)
    monkeypatch.setattr(at, "DEFAULT_CACHE", cache)

    seen = {}
    orig = mm.pallas_mxu.mxu_matmul_batched

    def spy(a, b, *eps, **kw):
        seen["batch_block"] = kw.get("batch_block")
        return orig(a, b, *eps, **kw)

    monkeypatch.setattr(mm.pallas_mxu, "mxu_matmul_batched", spy)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(1, 2, (8, 64, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(1, 2, (8, 64, 64)).astype(np.float32))
    out = mm.matmul(a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(a) @ np.asarray(b), rtol=1e-5)
    assert seen["batch_block"] == 3


def test_matmul_adopts_cached_winner(tmp_path, monkeypatch):
    """matmul(config=None) picks the cached autotune winner's blocks."""
    import json

    import importlib

    import numpy as np

    # `gemm_hls_tpu.ops.matmul` the *module* (the package re-exports a
    # same-named function, which `import ... as` would bind instead).
    mm = importlib.import_module("gemm_hls_tpu.ops.matmul")
    import gemm_hls_tpu.tools.autotune as at
    from gemm_hls_tpu.models.perf_model import detect_chip
    from gemm_hls_tpu.utils import make_operands, reference_matmul, \
        verify_matmul

    chip = detect_chip().name
    cache = str(tmp_path / "cache.json")
    with open(cache, "w") as f:
        json.dump({f"{chip}/float32/plus_times/128x128x128":
                   {"block_m": 64, "block_n": 128, "block_k": 128}}, f)
    monkeypatch.setattr(at, "DEFAULT_CACHE", cache)

    seen = {}
    orig = mm._mxu_padded

    def spy(a, b, config):
        seen["blocks"] = (config.block_m, config.block_n, config.block_k)
        return orig(a, b, config)

    monkeypatch.setattr(mm, "_mxu_padded", spy)
    import jax.numpy as jnp
    a, b = make_operands(128, 128, 128, "float32")
    out = mm.matmul(jnp.asarray(a), jnp.asarray(b))
    verify_matmul(np.asarray(out), reference_matmul(a, b))
    assert seen["blocks"] == (64, 128, 128)


# ---------------------------------------------------------------------------
# Kernel-family buckets (flash / quantized / grouped)
# ---------------------------------------------------------------------------


def test_family_key_and_cached_entry(tmp_path):
    import json

    from gemm_hls_tpu.models.perf_model import detect_chip
    from gemm_hls_tpu.tools import autotune as at

    chip = detect_chip().name
    cache = tmp_path / "fam.json"
    key = at._key_family(chip, "flash", "bfloat16", (32, 1000, 1000, 128),
                         "causal")
    # Dims bucket to powers of two.
    assert key == f"{chip}/flash/bfloat16/32x1024x1024x128/causal"
    cache.write_text(json.dumps(
        {key: {"block_q": 1024, "block_kv": 1024, "gflops": 1.0}}))
    e = at.cached_family_entry("flash", (32, 1000, 1000, 128),
                               dtype="bfloat16", tag="causal",
                               cache_path=str(cache))
    assert e["block_q"] == 1024
    assert at.cached_family_entry("flash", (32, 1000, 1000, 128),
                                  dtype="bfloat16", tag="full",
                                  cache_path=str(cache)) is None


def test_tune_family_picks_fastest_and_caches(tmp_path):
    from gemm_hls_tpu.tools import autotune as at

    cache = tmp_path / "fam.json"
    times = {1: 0.2, 2: 0.1, 3: 0.5}

    def measure(entry):
        return times[entry["block_q"]]

    cands = [{"block_q": q} for q in (1, 2, 3)]
    e = at._tune_family("flash", (8, 64, 64, 16), "bfloat16", "full",
                        cands, measure, flops=1e9, ceiling=None,
                        cache_path=str(cache), rounds=3, force=False,
                        verbose=False)
    assert e["block_q"] == 2
    # Second call hits the cache (measure would KeyError on block_q=9).
    e2 = at._tune_family("flash", (8, 64, 64, 16), "bfloat16", "full",
                         [{"block_q": 9}], lambda e: times[e["block_q"]],
                         flops=1e9, ceiling=None, cache_path=str(cache),
                         rounds=3, force=False, verbose=False)
    assert e2["block_q"] == 2


def test_tune_family_ceiling_drops_impossible(tmp_path):
    from gemm_hls_tpu.tools import autotune as at

    cache = tmp_path / "fam.json"
    # Candidate 1 reads impossibly fast (above ceiling) every time ->
    # dropped; candidate 2 wins despite being slower.
    def measure(entry):
        return {1: 1e-6, 2: 1e-1}[entry["block_q"]]  # 1e6 vs 10 GFLOP/s

    e = at._tune_family("flash", (8, 64, 64, 16), "bfloat16", "full",
                        [{"block_q": 1}, {"block_q": 2}], measure,
                        flops=1e9, ceiling=100.0,   # GFLOP/s
                        cache_path=str(cache), rounds=2, force=False,
                        verbose=False)
    assert e["block_q"] == 2


def test_flash_dispatch_adopts_cached_blocks(tmp_path, monkeypatch):
    """flash_attention with no blocks must adopt the family winner."""
    import json

    import jax.numpy as jnp

    from gemm_hls_tpu.models.perf_model import detect_chip
    from gemm_hls_tpu.ops import pallas_flash as pf
    from gemm_hls_tpu.ops.attention import flash_attention
    from gemm_hls_tpu.tools import autotune as at

    chip = detect_chip().name
    cache = tmp_path / "fam.json"
    key = f"{chip}/flash/float32/8x128x128x32/full"
    cache.write_text(json.dumps(
        {key: {"block_q": 64, "block_kv": 32, "gflops": 1.0}}))
    monkeypatch.setattr(at, "DEFAULT_CACHE", str(cache))

    seen = {}
    real = pf.flash_mha_diff

    def spy(qs, k, v, qseg, kvseg, cfg, causal, bq, bkv, *a, **kw):
        seen["blocks"] = (bq, bkv)
        return real(qs, k, v, qseg, kvseg, cfg, causal, bq, bkv, *a, **kw)

    monkeypatch.setattr("gemm_hls_tpu.ops.attention.flash_mha_diff", spy,
                        raising=False)
    import gemm_hls_tpu.ops.attention as attn_mod
    monkeypatch.setattr(pf, "flash_mha_diff", spy)

    q = jnp.ones((8, 128, 32), jnp.float32) * 0.1
    out = flash_attention(q, q, q, interpret=True)
    assert out.shape == q.shape
    assert seen["blocks"] == (64, 32)


def test_quant_dispatch_adopts_cached_blocks(tmp_path, monkeypatch):
    import json

    import jax.numpy as jnp
    import numpy as np

    from gemm_hls_tpu.models.perf_model import detect_chip
    from gemm_hls_tpu.ops.quant import matmul_quantized, quantize_weights
    from gemm_hls_tpu.tools import autotune as at

    chip = detect_chip().name
    cache = tmp_path / "fam.json"
    key = f"{chip}/dequant8/float32/32x256x256/chan"
    cache.write_text(json.dumps({key: {
        "block_m": 32, "block_n": 128, "block_k": 128, "gflops": 1.0}}))
    monkeypatch.setattr(at, "DEFAULT_CACHE", str(cache))

    rng = np.random.default_rng(5)
    w = (rng.standard_normal((256, 256)) / 16).astype(np.float32)
    wq, s = quantize_weights(w, bits=8)
    x = jnp.asarray(rng.standard_normal((32, 256)), jnp.float32)
    y = np.asarray(matmul_quantized(x, jnp.asarray(wq), jnp.asarray(s),
                                    bits=8, interpret=True))
    ref = np.asarray(x) @ w
    assert np.abs(y - ref).max() / np.abs(ref).max() < 0.02


def test_derived_cross_chip_priors(tmp_path, monkeypatch):
    """VERDICT r4 #9: an unmeasured chip (v5p) starts from a derived
    v5e-scaled prior shipped in the packaged seed, which a measured
    winner in the user cache then overrides."""
    import json

    import pytest

    import gemm_hls_tpu.tools.autotune as at
    from gemm_hls_tpu.models import perf_model
    from gemm_hls_tpu.tools.autotune import derive_seed_priors

    # Derivation: blocks copy, gflops scales by the engine-peak ratio,
    # measured target entries are never clobbered.
    seed = {
        "v5e/bfloat16/plus_times/1024x1024x1024": {
            "block_m": 512, "block_n": 1024, "block_k": 1024,
            "gflops": 100000.0},
        "v5p/bfloat16/plus_times/2048x2048x2048": {
            "block_m": 512, "block_n": 512, "block_k": 2048,
            "gflops": 1.0},  # pre-existing measured v5p entry
    }
    out = derive_seed_priors(seed, "v5e", ("v5p",))
    dk = "v5p/bfloat16/plus_times/1024x1024x1024"
    assert out[dk]["derived"] is True
    assert out[dk]["block_n"] == 1024
    ratio = (perf_model.get_chip("v5p").peak_for("bfloat16")
             / perf_model.get_chip("v5e").peak_for("bfloat16"))
    assert out[dk]["gflops"] == pytest.approx(100000.0 * ratio, rel=1e-6)
    assert out["v5p/bfloat16/plus_times/2048x2048x2048"]["gflops"] == 1.0
    assert "derived" not in out["v5p/bfloat16/plus_times/2048x2048x2048"]

    # The packaged seed ships these priors, and the lookup consults them
    # on the fake chip...
    monkeypatch.setattr(perf_model, "detect_chip",
                        lambda: perf_model.get_chip("v5p"))
    fake_seed = str(tmp_path / "seed.json")
    json.dump(out, open(fake_seed, "w"))
    monkeypatch.setattr(at, "SEED_CACHE", fake_seed)
    user_cache = str(tmp_path / "user.json")
    cfg = at.cached_config(1024, 1024, 1024, dtype="bfloat16",
                           cache_path=user_cache)
    assert cfg is not None and cfg.block_n == 1024

    # ...until a measured winner lands in the user cache, which wins.
    json.dump({"v5p/bfloat16/plus_times/1024x1024x1024": {
        "block_m": 256, "block_n": 512, "block_k": 512,
        "gflops": 123.0}}, open(user_cache, "w"))
    cfg2 = at.cached_config(1024, 1024, 1024, dtype="bfloat16",
                            cache_path=user_cache)
    assert (cfg2.block_m, cfg2.block_n, cfg2.block_k) == (256, 512, 512)


def test_packaged_seed_contains_derived_priors():
    """The shipped seed has v5p/v6e twins for every v5e entry."""
    import json

    from gemm_hls_tpu.tools.autotune import SEED_CACHE

    seed = json.load(open(SEED_CACHE))
    v5e = [k for k in seed if k.startswith("v5e/")]
    assert v5e, "packaged seed lost its v5e winners"
    for chip in ("v5p", "v6e"):
        for k in v5e:
            tk = chip + k[len("v5e"):]
            # Every v5e winner has a twin: derived, or measured later.
            assert tk in seed, f"missing derived prior {tk}"
