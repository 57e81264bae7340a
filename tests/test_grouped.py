"""Grouped (ragged) MoE GEMM: forward vs ragged_dot/naive oracle, VJP vs
dense autodiff, dynamic-routing recompile-freedom, dtype coverage.

Mirrors the reference's verification philosophy (``test/TestSimulation.cpp``:
same kernel code on CPU, deliberately unaligned sizes, exact/1e-3 compare)
applied to the ragged row partition the reference never had.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.grouped import grouped_matmul
from gemm_hls_tpu.ops.pallas_grouped import _group_metadata

CFG = GemmConfig(dtype="float32", block_m=32, block_n=32, block_k=16,
                 interpret=True)


def naive(lhs, rhs, gs, transpose_rhs=False):
    out = np.zeros((lhs.shape[0], rhs.shape[1] if transpose_rhs
                    else rhs.shape[2]), np.float64)
    s = 0
    for g, sz in enumerate(np.asarray(gs)):
        w = rhs[g].T if transpose_rhs else rhs[g]
        out[s:s + sz] = lhs[s:s + sz].astype(np.float64) @ w.astype(np.float64)
        s += sz
    return out


def rel_err(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)


@pytest.mark.parametrize("m,k,n,gs,bm", [
    (64, 32, 48, [16, 16, 16, 16], 16),      # aligned boundaries
    (100, 33, 48, [10, 0, 55, 35], 32),      # empty group + unaligned all
    (100, 33, 48, [10, 7, 55, 8], 32),       # sum < m: zero tail
    (7, 130, 129, [3, 3, 1], 8),             # tiny m, K/N edges
    (256, 64, 64, [256], 64),                # one group == dense
    (50, 16, 16, [0, 0, 0, 0, 0], 16),       # all groups empty
    (96, 24, 40, [1, 1, 1, 93], 32),         # many boundaries in one tile
])
def test_forward_vs_naive(m, k, n, gs, bm):
    rng = np.random.default_rng(5)
    lhs = rng.uniform(1, 10, (m, k)).astype(np.float32)
    rhs = rng.uniform(1, 10, (len(gs), k, n)).astype(np.float32)
    cfg = dataclasses.replace(CFG, block_m=bm)
    got = grouped_matmul(jnp.array(lhs), jnp.array(rhs),
                         jnp.array(gs, jnp.int32), cfg)
    want = naive(lhs, rhs, gs)
    assert rel_err(got, want) < 1e-5
    # Rows past sum(group_sizes) are defined-zero.
    total = int(np.sum(gs))
    assert np.all(np.asarray(got)[total:] == 0)


def test_matches_ragged_dot_on_assigned_rows():
    rng = np.random.default_rng(11)
    m, k, n, G = 64, 32, 48, 3
    gs = jnp.array([20, 30, 14], jnp.int32)
    lhs = jnp.array(rng.uniform(-1, 1, (m, k)), jnp.float32)
    rhs = jnp.array(rng.uniform(-1, 1, (G, k, n)), jnp.float32)
    got = grouped_matmul(lhs, rhs, gs, CFG)
    want = jax.lax.ragged_dot(lhs, rhs, gs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_transpose_rhs():
    rng = np.random.default_rng(3)
    m, k, n, G = 80, 40, 33, 4
    gs = [25, 25, 25, 5]
    lhs = rng.uniform(-1, 1, (m, k)).astype(np.float32)
    rhs = rng.uniform(-1, 1, (G, n, k)).astype(np.float32)
    got = grouped_matmul(jnp.array(lhs), jnp.array(rhs),
                         jnp.array(gs, jnp.int32), CFG, transpose_rhs=True)
    assert rel_err(got, naive(lhs, rhs, gs, transpose_rhs=True)) < 1e-5


def test_bfloat16():
    rng = np.random.default_rng(9)
    m, k, n, G = 64, 64, 64, 2
    gs = [40, 24]
    lhs = jnp.array(rng.uniform(-1, 1, (m, k)), jnp.bfloat16)
    rhs = jnp.array(rng.uniform(-1, 1, (G, k, n)), jnp.bfloat16)
    cfg = dataclasses.replace(CFG, dtype="bfloat16", out_dtype="float32")
    got = grouped_matmul(lhs, rhs, jnp.array(gs, jnp.int32), cfg)
    want = naive(np.asarray(lhs, np.float32), np.asarray(rhs, np.float32), gs)
    assert rel_err(got, want) < 2e-2


def _dense_oracle(lhs, rhs, gs, transpose_rhs=False):
    """Differentiable masked-dense formulation (autodiff oracle)."""
    ends = jnp.cumsum(gs)
    starts = ends - gs
    rows = jnp.arange(lhs.shape[0])
    onehot = ((rows[:, None] >= starts[None])
              & (rows[:, None] < ends[None])).astype(lhs.dtype)
    r = jnp.swapaxes(rhs, 1, 2) if transpose_rhs else rhs
    per = jnp.einsum("mk,gkn->gmn", lhs, r)
    return jnp.einsum("gmn,mg->mn", per, onehot)


@pytest.mark.parametrize("transpose_rhs", [False, True])
def test_vjp_vs_dense_autodiff(transpose_rhs):
    rng = np.random.default_rng(7)
    m, k, n, G = 96, 40, 56, 4
    gs = jnp.array([30, 0, 41, 25], jnp.int32)
    lhs = jnp.array(rng.uniform(-1, 1, (m, k)), jnp.float32)
    shape = (G, n, k) if transpose_rhs else (G, k, n)
    rhs = jnp.array(rng.uniform(-1, 1, shape), jnp.float32)

    def loss(f):
        return lambda a, b: jnp.sum(jnp.sin(f(a, b)))

    ours = loss(lambda a, b: grouped_matmul(a, b, gs, CFG,
                                            transpose_rhs=transpose_rhs))
    ref = loss(lambda a, b: _dense_oracle(a, b, gs, transpose_rhs))
    g1 = jax.grad(ours, argnums=(0, 1))(lhs, rhs)
    g0 = jax.grad(ref, argnums=(0, 1))(lhs, rhs)
    assert rel_err(g1[0], g0[0]) < 1e-5
    assert rel_err(g1[1], g0[1]) < 1e-5
    # Empty group's weights get exactly zero gradient.
    assert np.all(np.asarray(g1[1])[1] == 0)


def test_no_recompile_across_routings():
    """One compilation serves every routing outcome (static-shape schedule)."""
    m, k, n, G = 64, 32, 32, 4
    rng = np.random.default_rng(1)
    lhs = jnp.array(rng.uniform(-1, 1, (m, k)), jnp.float32)
    rhs = jnp.array(rng.uniform(-1, 1, (G, k, n)), jnp.float32)

    traces = []

    @jax.jit
    def run(gs):
        traces.append(1)
        return grouped_matmul(lhs, rhs, gs, CFG)

    for gs in ([16, 16, 16, 16], [64, 0, 0, 0], [0, 1, 2, 61]):
        got = run(jnp.array(gs, jnp.int32))
        assert rel_err(got, naive(np.asarray(lhs), np.asarray(rhs), gs)) < 1e-5
    assert len(traces) == 1


def test_metadata_covers_every_tile_once_per_group_span():
    """Property: the logical-tile schedule covers [0, sum) exactly and each
    M-tile's first visit is flagged exactly once."""
    rng = np.random.default_rng(2)
    for _ in range(50):
        G = int(rng.integers(1, 6))
        bm = int(rng.choice([8, 16, 32]))
        m = int(rng.integers(1, 200))
        gs = rng.multinomial(rng.integers(0, m + 1), np.ones(G) / G)
        gids, mids, fmid, lo, hi, first = jax.tree.map(
            np.asarray,
            _group_metadata(jnp.array(gs, jnp.int32), m, bm, G))
        covered = np.zeros(m, bool)
        seen_tiles = set()
        for t in range(len(gids)):
            if hi[t] > lo[t]:
                tile_rows = np.arange(mids[t] * bm, min((mids[t] + 1) * bm, m))
                span = tile_rows[(tile_rows >= lo[t]) & (tile_rows < hi[t])]
                assert not covered[span].any(), "row written twice"
                covered[span] = True
            if first[t]:
                assert mids[t] not in seen_tiles, "tile re-initialized"
                seen_tiles.add(int(mids[t]))
        assert covered[:int(np.sum(gs))].all(), "assigned row never written"


def test_validation_errors():
    lhs = jnp.zeros((8, 4), jnp.float32)
    rhs = jnp.zeros((2, 4, 4), jnp.float32)
    with pytest.raises(ValueError):
        grouped_matmul(lhs, rhs, jnp.array([4, 4, 0], jnp.int32), CFG)
    with pytest.raises(ValueError):
        grouped_matmul(lhs, rhs, jnp.array([4.0, 4.0]), CFG)
    with pytest.raises(ValueError):
        grouped_matmul(lhs[None], rhs, jnp.array([4, 4], jnp.int32), CFG)
    with pytest.raises(ValueError):
        grouped_matmul(lhs, jnp.zeros((2, 5, 4), jnp.float32),
                       jnp.array([4, 4], jnp.int32), CFG)
