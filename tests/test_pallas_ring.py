"""Pallas-native RDMA ring matmul on the virtual 8-device mesh — the real
remote-DMA/semaphore protocol runs under the interpreter (the hlslib-style
simulation of the inter-chip dataflow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu.ops.pallas_ring import ring_matmul, shard_operands_ring
from gemm_hls_tpu.parallel.mesh import make_mesh
from gemm_hls_tpu.utils import make_operands, verify_matmul

from jax.sharding import Mesh


def _ring_mesh(n):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("x",))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_ring_matmul_matches_oracle(n_dev):
    mesh = _ring_mesh(n_dev)
    m, n, k = 8 * n_dev, 16 * n_dev, 32
    a, b = make_operands(m, n, k, "float32")
    a_s, b_s = shard_operands_ring(jnp.asarray(a), jnp.asarray(b), mesh)
    out = ring_matmul(a_s, b_s, mesh)
    exp = a.astype(np.float64) @ b
    verify_matmul(np.asarray(out), exp, what=f"ring({n_dev})")


def test_ring_output_sharding():
    mesh = _ring_mesh(4)
    a, b = make_operands(16, 32, 24, "float32")
    a_s, b_s = shard_operands_ring(jnp.asarray(a), jnp.asarray(b), mesh)
    out = ring_matmul(a_s, b_s, mesh)
    assert out.shape == (16, 32)
    assert out.sharding.spec == jax.sharding.PartitionSpec("x", None)


def test_ring_rejects_indivisible():
    mesh = _ring_mesh(4)
    a = jnp.zeros((10, 8), jnp.float32)
    b = jnp.zeros((8, 16), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        ring_matmul(a, b, mesh)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_tiled_ring_matmul(n_dev):
    # K streamed through VMEM tiles inside each ring step (out-of-VMEM path).
    mesh = _ring_mesh(n_dev)
    m, n, k = 8 * n_dev, 16 * n_dev, 256
    a, b = make_operands(m, n, k, "float32")
    a_s, b_s = shard_operands_ring(jnp.asarray(a), jnp.asarray(b), mesh)
    out = ring_matmul(a_s, b_s, mesh, block_k=128)
    exp = a.astype(np.float64) @ b
    verify_matmul(np.asarray(out), exp, what=f"tiled-ring({n_dev})")


def test_tiled_ring_rejects_bad_block_k():
    mesh = _ring_mesh(2)
    a = jnp.zeros((8, 100), jnp.float32)
    b = jnp.zeros((100, 16), jnp.float32)
    with pytest.raises(ValueError, match="divisible by block_k"):
        ring_matmul(a, b, mesh, block_k=30)
    a = jnp.zeros((8, 128), jnp.float32)
    b = jnp.zeros((128, 16), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        ring_matmul(a, b, mesh, block_k=64, interpret=False)
