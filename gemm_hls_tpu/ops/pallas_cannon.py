"""Fused 2-D Cannon: skew + torus shifts as in-kernel RDMA on a p x p grid.

The complete Cannon algorithm (``parallel/summa.py`` runs it with XLA
collectives) inside ONE Pallas kernel per chip: the initial operand skew is
a single arbitrary-destination RDMA per operand (device (i,j) sends A to
(i, j-i) and B to (i-j, j)), then p steps of MXU multiply-accumulate while
both blocks shift along the torus via neighbor RDMA — A left, B up — the
2-D generalization of the reference PE chain's forward/relay dataflow
(``kernel/Compute.cpp:84-106``).

The device grid is addressed through a FLAT mesh axis (one named axis of
p*p devices, 2-D coordinates derived in-kernel) — matching how logical ICI
ids address the physical torus, and the only multi-device layout the Pallas
interpreter can execute.  Operands arrive pre-blocked as (p*p, ml, kl) /
(p*p, kl, nl) stacks sharded on the flat axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cannon_kernel(a_ref, b_ref, o_ref, comm_a, comm_b, a_vmem, b_vmem, acc,
                   stage_sem, sa_send, sa_recv, sb_send, sb_recv, out_sem,
                   ack_a, ack_b, *, p, axis_name, precision, use_barrier):
    d = jax.lax.axis_index(axis_name)
    i, j = d // p, d % p

    def flat(ii, jj):
        return ii * p + jj

    # ---- skew: one arbitrary-destination RDMA per operand ----------------
    rs_a = pltpu.make_async_remote_copy(
        src_ref=a_ref.at[0], dst_ref=comm_a.at[0],
        send_sem=sa_send.at[0], recv_sem=sa_recv.at[0],
        device_id=flat(i, (j - i + p) % p),
        device_id_type=pltpu.DeviceIdType.LOGICAL)
    rs_b = pltpu.make_async_remote_copy(
        src_ref=b_ref.at[0], dst_ref=comm_b.at[0],
        send_sem=sb_send.at[0], recv_sem=sb_recv.at[0],
        device_id=flat((i - j + p) % p, j),
        device_id_type=pltpu.DeviceIdType.LOGICAL)
    if use_barrier:
        # All peers must be inside the kernel before arbitrary-destination
        # writes land; a full barrier via the left/right flat neighbors
        # chained p*p times is overkill — signal every device once.
        barrier = pltpu.get_barrier_semaphore()
        for dst in range(p * p):
            pltpu.semaphore_signal(barrier, inc=1, device_id=dst,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, p * p)
    rs_a.start()
    rs_b.start()
    rs_a.wait()
    rs_b.wait()

    acc[:] = jnp.zeros_like(acc)
    left = flat(i, (j - 1 + p) % p)
    up = flat((i - 1 + p) % p, j)
    right = flat(i, (j + 1) % p)
    down = flat((i + 1) % p, j)

    for s in range(p):
        cur, nxt = s % 2, (s + 1) % 2
        # Stage current blocks into VMEM for the MXU.
        cp_a = pltpu.make_async_copy(comm_a.at[cur], a_vmem, stage_sem.at[0])
        cp_b = pltpu.make_async_copy(comm_b.at[cur], b_vmem, stage_sem.at[1])
        cp_a.start()
        cp_b.start()
        cp_a.wait()
        cp_b.wait()
        if s + 1 < p:
            if s >= 1 and use_barrier:
                pltpu.semaphore_wait(ack_a, 1)
                pltpu.semaphore_wait(ack_b, 1)
            # Shift while multiplying: A left, B up (torus neighbors).
            ra = pltpu.make_async_remote_copy(
                src_ref=comm_a.at[cur], dst_ref=comm_a.at[nxt],
                send_sem=sa_send.at[nxt], recv_sem=sa_recv.at[nxt],
                device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL)
            rb = pltpu.make_async_remote_copy(
                src_ref=comm_b.at[cur], dst_ref=comm_b.at[nxt],
                send_sem=sb_send.at[nxt], recv_sem=sb_recv.at[nxt],
                device_id=up, device_id_type=pltpu.DeviceIdType.LOGICAL)
            ra.start()
            rb.start()
        acc[:] += jnp.dot(a_vmem[:], b_vmem[:],
                          preferred_element_type=acc.dtype,
                          precision=precision)
        if s + 1 < p:
            ra.wait()
            rb.wait()
        if s <= p - 3 and use_barrier:
            # Backpressure acks: comm_[ab][cur] are free only after BOTH
            # the staging copy into VMEM and our own outbound shift from
            # them (ra/rb.wait above) complete — the ack releases the
            # upstream peer's next send into exactly these buffers, so an
            # earlier signal would let a fast sender overwrite a buffer
            # still being relayed.  A arrives from the right neighbor, B
            # from below; each consumes one ack before its send from step
            # 1 on.
            pltpu.semaphore_signal(ack_a, inc=1, device_id=right,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(ack_b, inc=1, device_id=down,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)

    cp_o = pltpu.make_async_copy(acc, o_ref.at[0], out_sem)
    cp_o.start()
    cp_o.wait()


def cannon_matmul_fused(a, b, p: int, *, devices=None, interpret: bool = None,
                        precision=None, out_dtype=jnp.float32):
    """C = A . B via fused-RDMA Cannon on a p x p grid of p*p devices.

    A: (M, K), B: (K, N) host/global arrays with M, N, K divisible by p.
    Returns the assembled (M, N) result.
    """
    devices = list(devices if devices is not None else jax.devices())[: p * p]
    if len(devices) < p * p:
        raise ValueError(f"need {p * p} devices for a {p}x{p} grid, "
                         f"have {len(devices)}")
    m, k = a.shape
    k2, n = b.shape
    if k != k2 or m % p or n % p or k % p:
        raise ValueError(f"shape ({m},{n},{k}) not divisible by grid {p}")
    ml, nl, kl = m // p, n // p, k // p
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    precision = precision or jax.lax.Precision.HIGHEST

    # Pre-block: stack of (p*p, ml, kl) blocks, flat index = i*p + j.
    a_blocks = jnp.asarray(a).reshape(p, ml, p, kl).transpose(0, 2, 1, 3)
    a_blocks = a_blocks.reshape(p * p, ml, kl)
    b_blocks = jnp.asarray(b).reshape(p, kl, p, nl).transpose(0, 2, 1, 3)
    b_blocks = b_blocks.reshape(p * p, kl, nl)

    mesh = Mesh(np.array(devices).reshape(p * p), ("xy",))
    a_s = jax.device_put(a_blocks, NamedSharding(mesh, P("xy", None, None)))
    b_s = jax.device_put(b_blocks, NamedSharding(mesh, P("xy", None, None)))

    kernel = functools.partial(_cannon_kernel, p=p, axis_name="xy",
                               precision=precision,
                               use_barrier=not interpret)

    def local(a_blk, b_blk):
        out, _, _ = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, ml, nl), jnp.dtype(out_dtype)),
                jax.ShapeDtypeStruct((2, ml, kl), a_blk.dtype),  # A ring buf
                jax.ShapeDtypeStruct((2, kl, nl), b_blk.dtype),  # B ring buf
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(3)),
            scratch_shapes=[
                pltpu.VMEM((ml, kl), a_blk.dtype),
                pltpu.VMEM((kl, nl), b_blk.dtype),
                pltpu.VMEM((ml, nl), jnp.dtype(out_dtype)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.REGULAR,
                pltpu.SemaphoreType.REGULAR,
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                                 collective_id=9),
            name=f"ca_gemm_cannon_fused_{p}x{p}",
        )(a_blk, b_blk)
        return out

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P("xy", None, None), P("xy", None, None)),
                       out_specs=P("xy", None, None), check_vma=False)
    out_blocks = fn(a_s, b_s)  # (p*p, ml, nl)
    out = out_blocks.reshape(p, p, ml, nl).transpose(0, 2, 1, 3)
    return out.reshape(m, n)
