"""run CLI, cache packaging, profiler tooling."""

import json
import os
import tarfile

import pytest

from gemm_hls_tpu.tools.cache import (
    enable_persistent_cache, package, unpackage,
)
from gemm_hls_tpu.tools.run import main as run_main
from gemm_hls_tpu.tools.profile import profile_matmul


def test_run_cli_verify_pass(capsys):
    rc = run_main(["48", "128", "64", "--iters", "1", "--backend", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "GOp/s" in out
    assert "Results verified" in out


def test_run_cli_power_estimate(capsys):
    rc = run_main(["32", "128", "64", "--iters", "1", "--power",
                   "--verify", "off", "--backend", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "GOp/J" in out


def test_run_cli_semiring(capsys):
    rc = run_main(["16", "128", "32", "--semiring", "min_plus", "--iters",
                   "1", "--backend", "xla"])
    assert rc == 0
    assert "Results verified" in capsys.readouterr().out


def test_cache_package_roundtrip(tmp_path):
    cache = tmp_path / "cache"
    enable_persistent_cache(str(cache))
    # Populate with a fake compiled artifact (the cache itself is exercised
    # by any jit compile; here we test the packaging mechanics).
    (cache / "sub").mkdir(parents=True)
    (cache / "sub" / "entry.bin").write_bytes(b"executable")
    archive = tmp_path / "kernels.tar.gz"
    package(str(archive), str(cache))
    assert tarfile.is_tarfile(archive)

    dest = tmp_path / "cache2"
    unpackage(str(archive), str(dest))
    assert (dest / "sub" / "entry.bin").read_bytes() == b"executable"


def test_cache_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        package(str(tmp_path / "x.tar.gz"), str(tmp_path / "nope"))


def test_profile_matmul_vs_model():
    from gemm_hls_tpu.config import GemmConfig
    r = profile_matmul(32, 128, 64, dtype="float32", iters=2,
                       config=GemmConfig(block_m=16, block_n=128, block_k=64,
                                         interpret=True))
    assert r["measured_seconds"] > 0
    assert r["expected_seconds"] > 0
    assert r["bound"] in ("compute", "memory")
