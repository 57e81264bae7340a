"""Gradients for additive-map semiring matmuls.

* ``min_plus`` / ``max_plus``: C[i,j] = min_k (A[i,k] + B[k,j]) is
  piecewise linear; the subgradient routes each output's cotangent to the
  argmin index, with ties sharing it equally:

      dA[i,k] = sum_j g[i,j] * 1[k attains the reduce for (i,j)] / ties[i,j]

  — the standard choice that makes differentiable shortest paths / DTW
  losses work.

* ``log_plus``: C[i,j] = logsumexp_k (A[i,k] + B[k,j]) is smooth; the
  gradient is the softmax weight of each term:

      dA[i,k] = sum_j g[i,j] * exp(A[i,k] + B[k,j] - C[i,j])

  — the soft relaxation of the tropical case (HMM forward/backward).

* ``max_min`` / ``min_max``: the map itself selects an operand, so the
  chain rule has two selection stages — which k attains the reduce, and
  which operand attains the map: dA gets the cotangent only where k is
  selected AND A[i,k] is the min (resp. max) of the mapped pair; map-level
  ties split the weight 0.5/0.5.

The forward pass is the regular VPU kernel; the backward pass recomputes
the map in K-chunks (memory O(M * ck * N)) against the stored output — no
(M, K, N) materialization and no index storage in the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.semiring import get_semiring

_SUPPORTED = ("min_plus", "max_plus", "log_plus", "max_min", "min_max")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tropical_matmul(a, b, semiring_name: str, config: GemmConfig):
    """Differentiable C = reduce_k (A[i,k] + B[k,j]) for min/max reduce."""
    return _forward(a, b, semiring_name, config)


def _forward(a, b, semiring_name, config):
    from gemm_hls_tpu.ops.matmul import _vpu_dispatch

    if semiring_name not in _SUPPORTED:
        raise ValueError(
            f"tropical_matmul supports {_SUPPORTED}, got {semiring_name!r}")
    return _vpu_dispatch(a, b, config, get_semiring(semiring_name))


def _fwd(a, b, semiring_name, config):
    c = _forward(a, b, semiring_name, config)
    return c, (a, b, c)


def _bwd(semiring_name, config, res, g):
    a, b, c = res
    sr = get_semiring(semiring_name)
    m, k = a.shape
    n = b.shape[1]
    ck = 128 if k >= 128 else k

    kp = -(-k // ck) * ck
    pad_val = sr.identity_for(a.dtype)  # padding never attains the reduce
    a_p = jnp.pad(a, ((0, 0), (0, kp - k)), constant_values=pad_val)
    b_p = jnp.pad(b, ((0, kp - k), (0, 0)), constant_values=0)
    a_chunks = a_p.reshape(m, kp // ck, ck).transpose(1, 0, 2)  # (nc, m, ck)
    b_chunks = b_p.reshape(kp // ck, ck, n)                     # (nc, ck, n)

    soft = semiring_name == "log_plus"
    selective_map = semiring_name in ("max_min", "min_max")

    def weight_chunk(a_c, b_c):
        """Per-term routing weights (w_a, w_b): softmax for log_plus,
        arg-reduce equality mask for the tropical cases, times the
        map-operand selection for min/max maps."""
        a3 = a_c[:, :, None]                                     # (m, ck, 1)
        b3 = b_c[None, :, :]                                     # (1, ck, n)
        mapped = (jnp.minimum(a3, b3) if semiring_name == "max_min"
                  else jnp.maximum(a3, b3) if semiring_name == "min_max"
                  else a3 + b3)                                  # (m, ck, n)
        if soft:
            w = jnp.exp(mapped - c[:, None, :]).astype(jnp.float32)
            return w, w
        w = (mapped == c[:, None, :]).astype(jnp.float32)
        if not selective_map:
            return w, w
        # Map-level selection: route to the operand attaining the map,
        # splitting ties 0.5/0.5.
        a_sel = (a3 < b3) if semiring_name == "max_min" else (a3 > b3)
        b_sel = (b3 < a3) if semiring_name == "max_min" else (b3 > a3)
        tie = 0.5 * (a3 == b3)
        return (w * (a_sel + tie).astype(jnp.float32),
                w * (b_sel + tie).astype(jnp.float32))

    if soft:
        # Softmax weights already sum to 1 over k.
        g_shared = g.astype(jnp.float32)
    else:
        # Pass 1: reduce-level tie counts per output (shared cotangent).
        # w_a + w_b sums to the reduce mask for selective maps and to
        # twice it for additive maps.
        count_factor = 1.0 if selective_map else 0.5

        def count_step(acc, operands):
            a_c, b_c = operands
            w_a, w_b = weight_chunk(a_c, b_c)
            return acc + count_factor * jnp.sum(w_a + w_b, axis=1), None

        ties, _ = jax.lax.scan(count_step, jnp.zeros((m, n), jnp.float32),
                               (a_chunks, b_chunks))
        g_shared = (g / jnp.maximum(ties, 1.0)).astype(jnp.float32)

    # Pass 2: route cotangents through the weights.
    def grad_step(_, operands):
        a_c, b_c = operands
        w_a, w_b = weight_chunk(a_c, b_c)                        # (m, ck, n)
        da_c = jnp.einsum("mkn,mn->mk", w_a, g_shared)
        db_c = jnp.einsum("mkn,mn->kn", w_b, g_shared)
        return None, (da_c, db_c)

    _, (da_chunks, db_chunks) = jax.lax.scan(grad_step, None,
                                             (a_chunks, b_chunks))
    da = da_chunks.transpose(1, 0, 2).reshape(m, kp)[:, :k].astype(a.dtype)
    db = db_chunks.reshape(kp, n)[:k, :].astype(b.dtype)
    return da, db


tropical_matmul.defvjp(_fwd, _bwd)
