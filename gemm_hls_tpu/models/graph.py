"""Graph algorithms on semiring GEMM — the application layer.

The reference motivates its configurable semiring with the distance product
("e.g., the distance product, by setting the operators to addition and
minimum", reference ``README.md:50``).  This module provides the actual
applications, built entirely on the framework's CA-GEMM:

* :func:`distance_product` — one (min, +) relaxation step.
* :func:`all_pairs_shortest_paths` — APSP by repeated squaring of the
  adjacency matrix in the tropical semiring: D_{2h} = D_h (min,+) D_h,
  ceil(log2(n)) GEMMs, each MXU-impossible but VPU-tiled.
* :func:`transitive_closure` — boolean reachability by (or, and) squaring.
* :func:`widest_paths` — bottleneck shortest paths in the (max, min)
  semiring.

Each is a pure jittable function; on a mesh, pass a distributed matmul
(e.g. ``functools.partial(summa_matmul, mesh=mesh, semiring=...)``) via the
``matmul_fn`` hook to scale past one chip.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.matmul import matmul


def distance_product(d1, d2, *, config: Optional[GemmConfig] = None,
                     matmul_fn: Optional[Callable] = None):
    """(min, +) product: out[i,j] = min_k d1[i,k] + d2[k,j]."""
    if matmul_fn is not None:
        return matmul_fn(d1, d2)
    return matmul(d1, d2, semiring="min_plus", config=config)


def _square_until_fixed(x, n: int, semiring: str, config, matmul_fn):
    """Repeated semiring squaring: ceil(log2(n-1)) steps cover all simple
    paths of an n-node graph (shared by APSP / closure / widest paths)."""
    for _ in range(max(1, math.ceil(math.log2(max(n - 1, 2))))):
        if matmul_fn is not None:
            x = matmul_fn(x, x)
        else:
            x = matmul(x, x, semiring=semiring, config=config)
    return x


def all_pairs_shortest_paths(adj, *, config: Optional[GemmConfig] = None,
                             matmul_fn: Optional[Callable] = None):
    """APSP via repeated squaring in the tropical semiring.

    Args:
      adj: (n, n) edge-weight matrix; +inf where no edge; the diagonal is
        forced to 0 (paths of length 0).
    Returns the shortest-path distance matrix after ceil(log2(n)) squarings.
    """
    n = adj.shape[0]
    d = jnp.where(jnp.eye(n, dtype=bool), jnp.zeros_like(adj), adj)
    return _square_until_fixed(d, n, "min_plus", config, matmul_fn)


def transitive_closure(adj, *, config: Optional[GemmConfig] = None,
                       matmul_fn: Optional[Callable] = None):
    """Boolean reachability closure via (or, and) repeated squaring."""
    n = adj.shape[0]
    r = jnp.logical_or(jnp.asarray(adj, bool), jnp.eye(n, dtype=bool))
    return _square_until_fixed(r, n, "or_and", config, matmul_fn)


def pagerank(adj, *, damping: float = 0.85, iters: int = 50,
             config: Optional[GemmConfig] = None,
             matmul_fn: Optional[Callable] = None):
    """PageRank by power iteration on the (+, x) semiring.

    Args:
      adj: (n, n) adjacency matrix (adj[i, j] != 0 means an edge i -> j).
    Returns the stationary rank vector (n,).
    """
    n = adj.shape[0]
    adj = jnp.asarray(adj, jnp.float32)
    out_deg = jnp.maximum(jnp.sum(adj != 0, axis=1, keepdims=True), 1)
    # Column-stochastic transition matrix, dangling nodes -> uniform.
    t = jnp.where(adj != 0, 1.0 / out_deg, 0.0).astype(jnp.float32)
    dangling = (jnp.sum(adj != 0, axis=1) == 0).astype(jnp.float32)
    r = jnp.full((n, 1), 1.0 / n, jnp.float32)
    mm = matmul_fn or (lambda x, y: matmul(x, y, config=config))
    for _ in range(iters):
        flow = mm(t.T, r)  # (n, 1)
        leak = jnp.sum(dangling[:, None] * r) / n
        r = damping * (flow + leak) + (1.0 - damping) / n
    return r[:, 0]


def widest_paths(cap, *, config: Optional[GemmConfig] = None,
                 matmul_fn: Optional[Callable] = None):
    """All-pairs bottleneck (maximum-capacity) paths in (max, min).

    Args:
      cap: (n, n) capacity matrix; 0 (or -inf) where no edge; the diagonal
        is forced to +inf (a node reaches itself with unlimited capacity).
    """
    n = cap.shape[0]
    w = jnp.where(jnp.eye(n, dtype=bool),
                  jnp.full_like(cap, jnp.inf), cap)
    return _square_until_fixed(w, n, "max_min", config, matmul_fn)
