"""Multi-chip decompositions on the virtual 8-device CPU mesh — the same
philosophy as hlslib's thread-based dataflow simulation (SURVEY.md §4): the
real decomposition logic runs, only the transport is simulated."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.parallel import (
    cannon_matmul, make_mesh, matmul_25d, mesh_25d, shard_operands_2d,
    shard_operands_25d, streamed_matmul, summa_matmul,
)
from gemm_hls_tpu.utils import make_operands, reference_matmul, verify_matmul

CFG = GemmConfig(block_m=16, block_n=128, block_k=64, interpret=False)


def small_cfg():
    # XLA local backend on CPU; blocks get clamped by _local_config.
    return None


def test_make_mesh_auto_square():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.shape == {"x": 2, "y": 4}


def test_make_mesh_too_many():
    with pytest.raises(ValueError, match="needs"):
        make_mesh((4, 4))


def test_summa_plus_times():
    mesh = make_mesh((2, 4))
    a, b = make_operands(64, 128, 64, "float32")
    exp = reference_matmul(a, b)
    a_s, b_s = shard_operands_2d(jnp.asarray(a), jnp.asarray(b), mesh)
    out = summa_matmul(a_s, b_s, mesh)
    verify_matmul(np.asarray(out), exp)


def test_summa_min_plus():
    mesh = make_mesh((2, 4))
    a, b = make_operands(32, 64, 32, "float32")
    exp = reference_matmul(a, b, semiring="min_plus")
    a_s, b_s = shard_operands_2d(jnp.asarray(a), jnp.asarray(b), mesh)
    out = summa_matmul(a_s, b_s, mesh, semiring="min_plus")
    verify_matmul(np.asarray(out), exp)


def test_summa_shape_validation():
    mesh = make_mesh((2, 4))
    a = jnp.zeros((66, 64), jnp.float32)
    b = jnp.zeros((64, 130), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        summa_matmul(a, b, mesh)


def test_cannon_square_mesh():
    mesh = make_mesh((2, 2))
    a, b = make_operands(64, 64, 64, "float32")
    exp = reference_matmul(a, b)
    a_s, b_s = shard_operands_2d(jnp.asarray(a), jnp.asarray(b), mesh)
    out = cannon_matmul(a_s, b_s, mesh)
    verify_matmul(np.asarray(out), exp)


def test_cannon_min_plus():
    mesh = make_mesh((2, 2))
    a, b = make_operands(32, 32, 64, "float32")
    exp = reference_matmul(a, b, semiring="min_plus")
    a_s, b_s = shard_operands_2d(jnp.asarray(a), jnp.asarray(b), mesh)
    out = cannon_matmul(a_s, b_s, mesh, semiring="min_plus")
    verify_matmul(np.asarray(out), exp)


def test_cannon_rejects_rectangular():
    mesh = make_mesh((2, 4))
    a = jnp.zeros((8, 8), jnp.float32)
    with pytest.raises(ValueError, match="square"):
        cannon_matmul(a, a, mesh)


def test_25d_plus_times():
    mesh = mesh_25d(c=2)
    assert dict(mesh.shape) == {"z": 2, "x": 2, "y": 2}
    a, b = make_operands(64, 64, 128, "float32")
    exp = reference_matmul(a, b)
    a_s, b_s = shard_operands_25d(jnp.asarray(a), jnp.asarray(b), mesh)
    out = matmul_25d(a_s, b_s, mesh)
    verify_matmul(np.asarray(out), exp)


def test_25d_generic_semiring():
    mesh = mesh_25d(c=2)
    a, b = make_operands(32, 64, 64, "float32")
    exp = reference_matmul(a, b, semiring="max_plus")
    a_s, b_s = shard_operands_25d(jnp.asarray(a), jnp.asarray(b), mesh)
    out = matmul_25d(a_s, b_s, mesh, semiring="max_plus")
    verify_matmul(np.asarray(out), exp)


def test_25d_under_jit():
    mesh = mesh_25d(c=2)
    a, b = make_operands(32, 32, 64, "float32")
    exp = reference_matmul(a, b)
    a_s, b_s = shard_operands_25d(jnp.asarray(a), jnp.asarray(b), mesh)
    f = jax.jit(lambda x, y: matmul_25d(x, y, mesh))
    out = f(a_s, b_s)
    verify_matmul(np.asarray(out), exp)


def test_streamed_matmul_out_of_core():
    # Host-staged GEMM with host tiles much smaller than the problem.
    a, b = make_operands(96, 80, 112, "float32")
    exp = reference_matmul(a, b)
    out = streamed_matmul(a, b, tile_m=32, tile_n=48, tile_k=64)
    verify_matmul(out, exp)


def test_streamed_matmul_prefetch_matches_sync():
    # The double-buffered staging path must be bit-identical to the
    # synchronous one (same panel order, same accumulation).
    a, b = make_operands(80, 64, 96, "float32")
    exp = streamed_matmul(a, b, tile_m=32, tile_n=32, tile_k=32,
                          prefetch=False)
    got = streamed_matmul(a, b, tile_m=32, tile_n=32, tile_k=32,
                          prefetch=True)
    np.testing.assert_array_equal(got, exp)


def test_prefetched_helper_order_and_depth():
    from gemm_hls_tpu.parallel.staging import _prefetched
    calls = []
    jobs = list(range(7))
    got = [(j, v) for j, v in _prefetched(jobs, lambda j: calls.append(j)
                                          or j * 10, depth=2)]
    assert got == [(j, j * 10) for j in jobs]
    assert calls == jobs  # staged in order, each exactly once


def test_prefetch_residency_cap():
    # Prefetch triples panel residency; near-HBM-sized panels must fall
    # back to sequential staging rather than OOM.
    from gemm_hls_tpu.parallel.staging import _prefetch_fits

    class Dev:
        def memory_stats(self):
            return {"bytes_limit": 1000}

    assert _prefetch_fits(100, 100, Dev())          # 400 <= 600
    assert not _prefetch_fits(300, 100, Dev())      # 1000 > 600

    class NoStats:
        def memory_stats(self):
            raise RuntimeError("unsupported")

    assert _prefetch_fits(1 << 30, 1 << 28, NoStats())  # 16 GiB default


def test_streamed_matmul_min_plus():
    a, b = make_operands(48, 40, 56, "float32")
    exp = reference_matmul(a, b, semiring="min_plus")
    out = streamed_matmul(a, b, semiring="min_plus", tile_m=16, tile_n=16,
                          tile_k=32)
    verify_matmul(out, exp)


def test_distributed_streamed_summa():
    from gemm_hls_tpu.parallel import distributed_streamed_matmul
    mesh = make_mesh((2, 4))
    a, b = make_operands(32, 64, 128, "float32")
    exp = reference_matmul(a, b)
    out = distributed_streamed_matmul(a, b, mesh, tile_m=16, tile_n=32,
                                      tile_k=64)
    verify_matmul(out, exp)


def test_distributed_streamed_25d_min_plus():
    from gemm_hls_tpu.parallel import distributed_streamed_matmul
    mesh = mesh_25d(c=2)
    a, b = make_operands(32, 32, 128, "float32")
    exp = reference_matmul(a, b, semiring="min_plus")
    out = distributed_streamed_matmul(a, b, mesh, algorithm="25d",
                                      semiring="min_plus", tile_m=16,
                                      tile_n=16, tile_k=64)
    verify_matmul(out, exp)


def test_streamed_ozaki_f64_class():
    """Out-of-HBM f64-class streaming: host tiles through the fused
    Ozaki-int8 kernel, cross-panel sums in host float64."""
    from gemm_hls_tpu.parallel.staging import streamed_ozaki_matmul
    rng = np.random.default_rng(11)
    a = rng.uniform(-5, 5, (300, 700))
    b = rng.uniform(-5, 5, (700, 260))
    got = streamed_ozaki_matmul(a, b, tile_m=128, tile_n=128, tile_k=256)
    exp = a @ b
    normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                 * np.linalg.norm(b, axis=0)[None, :])
    assert normw.max() < 1e-13, f"normwise {normw.max():.2e}"


def test_distributed_streamed_bf16_accumulates_wide():
    """Self-review r2: cross-K-panel partials must accumulate in the acc
    dtype (f32), not bf16 — one bf16 rounding per panel breaches 1e-3."""
    from gemm_hls_tpu.parallel import distributed_streamed_matmul

    mesh = make_mesh((2, 4))
    m, n, k = 16, 32, 512
    a, b = make_operands(m, n, k, "bfloat16")
    out = distributed_streamed_matmul(a, b, mesh, tile_m=16, tile_n=32,
                                      tile_k=64, out_dtype="float32",
                                      config=small_cfg())
    exp = a.astype(np.float64) @ b.astype(np.float64)
    rel = np.abs(np.asarray(out, np.float64) - exp) / np.abs(exp)
    assert rel.max() < 1e-3, f"cross-panel accumulation err {rel.max():.2e}"


def test_distributed_streamed_ragged_tiles():
    """Self-review r2: remainder host tiles that are not mesh-divisible
    must be padded, not crash mid-scan."""
    from gemm_hls_tpu.parallel import distributed_streamed_matmul

    mesh = make_mesh((2, 4))
    m, n, k = 17, 19, 23
    a, b = make_operands(m, n, k, "float32")
    out = distributed_streamed_matmul(a, b, mesh, tile_m=16, tile_n=16,
                                      tile_k=16, config=small_cfg())
    verify_matmul(np.asarray(out), a.astype(np.float64) @ b,
                  what="ragged streamed")
