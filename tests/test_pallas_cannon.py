"""Fused-RDMA 2-D Cannon on the virtual mesh (real remote-DMA protocol
under the interpreter)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu.ops.pallas_cannon import cannon_matmul_fused
from gemm_hls_tpu.utils import make_operands, verify_matmul


def test_cannon_fused_2x2():
    m, n, k = 32, 48, 64
    a, b = make_operands(m, n, k, "float32")
    out = cannon_matmul_fused(jnp.asarray(a), jnp.asarray(b), p=2)
    verify_matmul(np.asarray(out), a.astype(np.float64) @ b,
                  what="fused-cannon 2x2")


def test_cannon_fused_identity_skew():
    # Structured data catches mis-skews that random data might mask.
    p, ml = 2, 8
    a = np.kron(np.arange(1, p * p + 1).reshape(p, p),
                np.ones((ml, ml))).astype(np.float32)
    b = np.eye(p * ml, dtype=np.float32)
    out = cannon_matmul_fused(jnp.asarray(a), jnp.asarray(b), p=p)
    np.testing.assert_allclose(np.asarray(out), a, rtol=1e-6)


def test_cannon_fused_rejects_bad_grid():
    a = jnp.zeros((9, 8), jnp.float32)
    b = jnp.zeros((8, 8), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        cannon_matmul_fused(a, b, p=2)
    with pytest.raises(ValueError, match="need"):
        cannon_matmul_fused(jnp.zeros((8, 8), jnp.float32),
                            jnp.zeros((8, 8), jnp.float32), p=4)
