"""Fuzz for the fused-RDMA kernels (VERDICT r2 #7): the in-kernel
remote-DMA/semaphore protocol of the ring (both the VMEM fast path and
the HBM/block_k streamed path) and the fused 2-D Cannon, across ring
sizes, dtypes, and divisible shapes, verified against the host oracle
under interpretation — the mesh-level analogue of the reference's
adversarial simulation sizes (``CMakeLists.txt:155-159``).

The ack-ordering stress runs the same protocol over *permuted* device
orders: the logical ring neighbors then live on arbitrary physical
(virtual) devices, so any hidden assumption that logical index == mesh
position would deadlock or corrupt the handoff buffers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh

from gemm_hls_tpu.ops.pallas_cannon import cannon_matmul_fused
from gemm_hls_tpu.ops.pallas_ring import ring_matmul, shard_operands_ring
from gemm_hls_tpu.utils import check_result, make_operands, tolerance_for

RNG = np.random.default_rng(2024)
DTYPES = ["float32", "bfloat16", "int8"]


def _mesh(n_dev, permute=False, seed=0):
    devs = np.array(jax.devices()[:n_dev])
    if permute:
        devs = devs[np.random.default_rng(seed).permutation(n_dev)]
    return Mesh(devs.reshape(n_dev), ("x",))


def _tol(dtype):
    return 2e-2 if dtype == "bfloat16" else tolerance_for("float32")


RING_CASES = []
for i in range(14):
    n_dev = int(RNG.choice([2, 4, 8]))
    # Divisible shapes (the ring's contract); nl need not be 128-aligned
    # in interpreter mode, so exercise odd multiples too.
    m = n_dev * int(RNG.integers(1, 6)) * 4
    n = n_dev * int(RNG.integers(1, 6)) * 8
    k = int(RNG.integers(1, 5)) * 64
    dtype = DTYPES[int(RNG.integers(0, len(DTYPES)))]
    tiled = bool(RNG.integers(0, 2))
    block_k = None
    if tiled:
        divisors = [d for d in (32, 64, 128) if k % d == 0]
        block_k = int(RNG.choice(divisors))
    permute = i % 3 == 0
    RING_CASES.append((i, n_dev, m, n, k, dtype, block_k, permute))


@pytest.mark.parametrize("i,n_dev,m,n,k,dtype,block_k,permute", RING_CASES)
def test_ring_fuzz(i, n_dev, m, n, k, dtype, block_k, permute):
    mesh = _mesh(n_dev, permute=permute, seed=100 + i)
    a, b = make_operands(m, n, k, dtype, seed=500 + i)
    a_s, b_s = shard_operands_ring(jnp.asarray(a), jnp.asarray(b), mesh)
    out = ring_matmul(a_s, b_s, mesh, block_k=block_k)
    exp = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    ok, err = check_result(np.asarray(out), exp, rtol=_tol(dtype))
    assert ok, (f"ring case {i}: n_dev={n_dev} {m}x{n}x{k} {dtype} "
                f"block_k={block_k} permuted={permute}: err {err:.3e}")


CANNON_CASES = []
for i in range(8):
    p = 2  # 8 virtual devices -> 2x2 is the fusable grid
    m = p * int(RNG.integers(1, 8)) * 4
    n = p * int(RNG.integers(1, 8)) * 8
    k = p * int(RNG.integers(1, 8)) * 4
    dtype = DTYPES[int(RNG.integers(0, len(DTYPES)))]
    permute = i % 2 == 0
    CANNON_CASES.append((i, p, m, n, k, dtype, permute))


@pytest.mark.parametrize("i,p,m,n,k,dtype,permute", CANNON_CASES)
def test_cannon_fused_fuzz(i, p, m, n, k, dtype, permute):
    devices = list(jax.devices())[: p * p]
    if permute:
        order = np.random.default_rng(200 + i).permutation(p * p)
        devices = [devices[j] for j in order]
    a, b = make_operands(m, n, k, dtype, seed=900 + i)
    out = cannon_matmul_fused(jnp.asarray(a), jnp.asarray(b), p,
                              devices=devices)
    exp = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    ok, err = check_result(np.asarray(out), exp, rtol=_tol(dtype))
    assert ok, (f"cannon case {i}: p={p} {m}x{n}x{k} {dtype} "
                f"permuted={permute}: err {err:.3e}")


def test_ring_both_paths_agree():
    # The VMEM fast path and the HBM-streamed path must agree bitwise on
    # identical inputs (same accumulation order per device).
    mesh = _mesh(4)
    a, b = make_operands(32, 64, 128, "float32", seed=77)
    a_s, b_s = shard_operands_ring(jnp.asarray(a), jnp.asarray(b), mesh)
    fast = ring_matmul(a_s, b_s, mesh)
    tiled = ring_matmul(a_s, b_s, mesh, block_k=64)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(tiled),
                               rtol=1e-6, atol=1e-6)
