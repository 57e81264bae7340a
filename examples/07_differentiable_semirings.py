"""Differentiable semirings: gradients through shortest paths.

min_plus matmuls are piecewise linear — their subgradients route loss
signals to the edges on shortest paths, enabling learning graph weights
from path-cost objectives (the discrete analogue; log_plus gives the smooth
version).

    python examples/07_differentiable_semirings.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu import matmul

rng = np.random.default_rng(0)
n = 24
w = rng.uniform(1, 10, (n, n)).astype(np.float32)
adj = np.where(rng.uniform(size=(n, n)) < 0.3, w, 1e6).astype(np.float32)
np.fill_diagonal(adj, 0.0)
adj = jnp.asarray(adj)

target = 3.0  # desired two-hop distance between node 0 and node n-1


def loss(edges):
    two_hop = matmul(edges, edges, semiring="min_plus")
    return (two_hop[0, -1] - target) ** 2


print(f"initial 2-hop dist(0 -> {n - 1}): "
      f"{float(matmul(adj, adj, semiring='min_plus')[0, -1]):.3f} "
      f"(target {target})")

edges = adj
for step in range(40):
    val, grad = jax.value_and_grad(loss)(edges)
    edges = edges - 0.2 * grad  # subgradient descent on the active path
print(f"after 40 subgradient steps: "
      f"{float(matmul(edges, edges, semiring='min_plus')[0, -1]):.3f}, "
      f"loss {float(loss(edges)):.4f}")

# Smooth version: log-semiring with exact softmax gradients.
soft = jax.grad(lambda e: matmul(-e, -e, semiring="log_plus")[0, -1])(adj)
print(f"log_plus (soft-min) gradient: {int((np.asarray(soft) != 0).sum())} "
      f"edges receive signal (vs the single hard argmin path)")
