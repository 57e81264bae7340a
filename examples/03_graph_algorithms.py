"""Graph algorithms on the semiring GEMM: APSP, reachability, widest paths.

    python examples/03_graph_algorithms.py
"""

import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu.models.graph import (
    all_pairs_shortest_paths, transitive_closure, widest_paths,
)

rng = np.random.default_rng(42)
n = 64
w = rng.uniform(1, 10, (n, n)).astype(np.float32)
adj = np.where(rng.uniform(size=(n, n)) < 0.1, w, np.inf).astype(np.float32)
np.fill_diagonal(adj, 0.0)

dist = np.asarray(all_pairs_shortest_paths(jnp.asarray(adj)))
reach = np.isfinite(dist)
print(f"APSP on a {n}-node sparse digraph (min_plus repeated squaring):")
print(f"  reachable pairs: {reach.sum()} / {n * n}")
print(f"  longest shortest path: {dist[np.isfinite(dist)].max():.2f}")

closure = np.asarray(transitive_closure(jnp.asarray(adj < np.inf)))
assert np.array_equal(closure, reach), "closure must match APSP reachability"
print("transitive closure (or_and): consistent with APSP reachability")

cap = np.where(adj < np.inf, 100.0 / np.maximum(adj, 1e-3), 0.0).astype(np.float32)
bw = np.asarray(widest_paths(jnp.asarray(cap)))
print(f"widest paths (max_min): median bottleneck "
      f"{np.median(bw[np.isfinite(dist) & (dist > 0)]):.1f}")
