"""Semiring-GEMM graph applications vs classic dense algorithms."""

import numpy as np
import jax.numpy as jnp

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.models.graph import (
    all_pairs_shortest_paths, distance_product, transitive_closure,
    widest_paths,
)

CFG = GemmConfig(block_m=8, block_n=16, block_k=8, interpret=True)


def _random_graph(n, density=0.3, seed=7):
    rng = np.random.default_rng(seed)
    w = rng.uniform(1, 10, (n, n)).astype(np.float32)
    mask = rng.uniform(size=(n, n)) < density
    adj = np.where(mask, w, np.inf).astype(np.float32)
    np.fill_diagonal(adj, 0.0)
    return adj


def _floyd_warshall(adj):
    d = adj.copy()
    n = d.shape[0]
    for k in range(n):
        d = np.minimum(d, d[:, k:k + 1] + d[k:k + 1, :])
    return d


def test_apsp_matches_floyd_warshall():
    adj = _random_graph(24)
    exp = _floyd_warshall(adj)
    got = all_pairs_shortest_paths(jnp.asarray(adj), config=CFG)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5)


def test_distance_product_single_step():
    adj = _random_graph(10)
    exp = np.minimum.reduce(adj[:, :, None] + adj[None, :, :], axis=1)
    got = distance_product(jnp.asarray(adj), jnp.asarray(adj), config=CFG)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-6)


def test_transitive_closure():
    n = 16
    rng = np.random.default_rng(3)
    adj = rng.uniform(size=(n, n)) < 0.15
    # numpy closure by boolean repeated squaring with identity
    r = adj | np.eye(n, dtype=bool)
    for _ in range(n):
        r = r | (r @ r)
    got = transitive_closure(jnp.asarray(adj), config=CFG)
    np.testing.assert_array_equal(np.asarray(got), r)


def test_widest_paths():
    n = 12
    rng = np.random.default_rng(9)
    cap = np.where(rng.uniform(size=(n, n)) < 0.3,
                   rng.uniform(1, 100, (n, n)), 0.0).astype(np.float32)
    w = cap.copy()
    np.fill_diagonal(w, np.inf)
    # reference: repeated squaring in numpy
    exp = w.copy()
    for _ in range(n):
        exp = np.maximum(exp, np.max(
            np.minimum(exp[:, :, None], exp[None, :, :]), axis=1))
    got = widest_paths(jnp.asarray(cap), config=CFG)
    np.testing.assert_allclose(np.asarray(got), exp)


def test_pagerank_matches_networkx_style_reference():
    from gemm_hls_tpu.models.graph import pagerank
    n = 32
    rng = np.random.default_rng(11)
    adj = (rng.uniform(size=(n, n)) < 0.2).astype(np.float32)
    np.fill_diagonal(adj, 0.0)
    r = np.asarray(pagerank(jnp.asarray(adj), config=CFG, iters=100))
    # Reference power iteration in numpy.
    out_deg = np.maximum((adj != 0).sum(axis=1, keepdims=True), 1)
    t = np.where(adj != 0, 1.0 / out_deg, 0.0)
    dangling = ((adj != 0).sum(axis=1) == 0).astype(np.float64)
    exp = np.full(n, 1.0 / n)
    for _ in range(100):
        leak = (dangling * exp).sum() / n
        exp = 0.85 * (t.T @ exp + leak) + 0.15 / n
    np.testing.assert_allclose(r, exp, rtol=1e-4)
    np.testing.assert_allclose(r.sum(), 1.0, rtol=1e-3)
