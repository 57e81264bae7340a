"""Pallas-native ring matmul: inter-chip RDMA fused with the MXU loop.

This is the reference's PE chain lifted *literally* to chips: the linear
systolic array forwards B to its neighbor while computing with the block it
holds (``kernel/Compute.cpp:103-106``); here each chip RDMAs its current B
column-block to the next chip over ICI (``make_async_remote_copy``) while
the MXU multiplies the block it just received — communication hidden inside
the compute loop of a single Pallas kernel, instead of XLA-scheduled
collectives between kernels.

Layout (1-D ring of n devices over mesh axis ``x``):

    A: row-sharded   (M/n, K)  per device
    B: column-sharded (K, N/n) per device
    C: row-sharded   (M/n, N)  per device (full N)

Step s: device d multiplies A_local with the B block originating from
device (d - s) mod n, writing C's matching column block, while sending the
block onward.  n steps complete C with (n-1) neighbor transfers of |B|/n —
the bandwidth-optimal all-gather volume, fully overlapped.

Validated end-to-end on the virtual CPU mesh (interpret mode executes the
real RDMA/semaphore protocol); single-chip-pool environments cannot measure
ICI overlap — see docs/ROADMAP.md.

Backpressure: the double buffer alone bounds sender run-ahead to one step —
exactly the step that races a slow reader — so compiled mode adds a
receiver-to-sender "buffer consumed" ack semaphore per step.  The ack path
is compiled-mode only (the interpreter cannot lower remote semaphore
signals and serializes devices, so the race cannot occur there); its
signal/wait counts balance by construction (n_dev - 2 each).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gemm_hls_tpu.config import GemmConfig

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_kernel(a_ref, b_ref, o_ref, a_vmem, b_buf, o_vmem,
                 copy_sem, send_sem, recv_sem, ack_sem, *, n_dev, nl,
                 axis_name, precision, use_barrier=True):
    my = jax.lax.axis_index(axis_name)

    # Stage local operands into VMEM (the aBuffer-init analogue,
    # reference kernel/Compute.cpp:30-51).
    cp_a = pltpu.make_async_copy(a_ref, a_vmem, copy_sem)
    cp_a.start()
    cp_b = pltpu.make_async_copy(b_ref, b_buf.at[0], recv_sem.at[0])
    cp_b.start()
    cp_a.wait()
    cp_b.wait()

    # Neighbor barrier: both ring neighbors must have staged their comm
    # buffers before anyone RDMAs into them.  (The interpreter emulates
    # global ordering itself and cannot lower the barrier semaphore.)
    left = (my - 1 + n_dev) % n_dev
    right = (my + 1) % n_dev
    if use_barrier:
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    for s in range(n_dev):
        cur, nxt = s % 2, (s + 1) % 2
        if s + 1 < n_dev:
            if s >= 1 and use_barrier:
                # Backpressure: our step-s copy lands in the right
                # neighbor's b_buf[nxt] — the buffer it reads during its
                # step s-1.  Wait for its "consumed" ack so a fast sender
                # cannot run ahead and corrupt a slower reader (the
                # double-buffer alone bounds run-ahead to one step, which
                # is exactly the racing step).  Compiled mode only: the
                # interpreter cannot lower remote semaphore signals (and
                # emulates global ordering itself).
                pltpu.semaphore_wait(ack_sem, 1)
            # Forward the block we hold to the right neighbor while the MXU
            # works on it (the B-relay of the PE chain, Compute.cpp:103-106).
            rdma = pltpu.make_async_remote_copy(
                src_ref=b_buf.at[cur], dst_ref=b_buf.at[nxt],
                send_sem=send_sem.at[cur], recv_sem=recv_sem.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            rdma.start()
        src_dev = (my - s + n_dev) % n_dev
        o_vmem[:, pl.ds(src_dev * nl, nl)] = jnp.dot(
            a_vmem[:], b_buf[cur], preferred_element_type=o_vmem.dtype,
            precision=precision)
        if s + 1 < n_dev:
            rdma.wait()
        if s <= n_dev - 3 and use_barrier:
            # Tell the left neighbor we are done with b_buf[cur] — both the
            # compute read AND our own outbound send from it (the ack must
            # follow rdma.wait(): the left neighbor's released send targets
            # exactly this buffer, and signaling mid-send would let it be
            # overwritten while still in flight).  Each send from step 1 on
            # consumes one ack (signal count = wait count = n_dev - 2, so
            # the semaphore drains).  No deadlock: our wait at step s
            # depends only on the left neighbor's step-s send, never on
            # our own ack.
            pltpu.semaphore_signal(ack_sem, inc=1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)

    cp_o = pltpu.make_async_copy(o_vmem, o_ref, copy_sem)
    cp_o.start()
    cp_o.wait()


def _ring_kernel_tiled(a_ref, b_ref, o_ref, comm_ref, a_tile, b_tile, acc,
                       out_tile, copy_sem, tile_sem, send_sem, recv_sem,
                       out_sem, ack_sem, *, n_dev, nl, bk, axis_name,
                       precision, use_barrier):
    """Out-of-VMEM variant: operands and the circulating B blocks stay in
    HBM; each ring step streams K in ``bk`` chunks through double-buffered
    VMEM tiles while the next B block arrives over the ring — the full
    three-level overlap (ICI ring / HBM->VMEM DMA / MXU), i.e. the
    reference's dataflow pipeline (``kernel/Top.cpp:24``) spanning chips."""
    my = jax.lax.axis_index(axis_name)
    k_dim = a_ref.shape[1]
    n_k = k_dim // bk
    left = (my - 1 + n_dev) % n_dev
    right = (my + 1) % n_dev

    # Stage the local B block into the HBM ring buffer.
    cp_b = pltpu.make_async_copy(b_ref, comm_ref.at[0], copy_sem)
    cp_b.start()
    cp_b.wait()

    if use_barrier:
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    for s in range(n_dev):
        cur, nxt = s % 2, (s + 1) % 2
        if s + 1 < n_dev:
            if s >= 1 and use_barrier:
                # Backpressure ack (see _ring_kernel): the right neighbor
                # must have finished streaming comm_ref[nxt] through its
                # step s-1 K loop before we overwrite it.
                pltpu.semaphore_wait(ack_sem, 1)
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm_ref.at[cur], dst_ref=comm_ref.at[nxt],
                send_sem=send_sem.at[cur], recv_sem=recv_sem.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            rdma.start()

        def tile_dma(slot, kb):
            da = pltpu.make_async_copy(
                a_ref.at[:, pl.ds(kb * bk, bk)], a_tile.at[slot],
                tile_sem.at[slot, 0])
            db = pltpu.make_async_copy(
                comm_ref.at[cur, pl.ds(kb * bk, bk), :], b_tile.at[slot],
                tile_sem.at[slot, 1])
            return da, db

        for d in tile_dma(0, 0):
            d.start()
        acc[:] = jnp.zeros_like(acc)

        def k_body(kb, _):
            slot, nslot = kb % 2, (kb + 1) % 2

            @pl.when(kb + 1 < n_k)
            def _():
                for d in tile_dma(nslot, kb + 1):
                    d.start()

            for d in tile_dma(slot, kb):
                d.wait()
            acc[:] += jnp.dot(a_tile[slot], b_tile[slot],
                              preferred_element_type=acc.dtype,
                              precision=precision)
            return ()

        jax.lax.fori_loop(0, n_k, k_body, ())

        src_dev = (my - s + n_dev) % n_dev
        out_tile[:] = acc[:].astype(out_tile.dtype)
        cp_o = pltpu.make_async_copy(
            out_tile, o_ref.at[:, pl.ds(src_dev * nl, nl)], out_sem)
        cp_o.start()
        cp_o.wait()

        if s + 1 < n_dev:
            rdma.wait()
        if s <= n_dev - 3 and use_barrier:
            # Release the left neighbor's next send into comm_ref[cur] —
            # only after both the K-loop reads AND our own outbound send
            # from it (rdma.wait above) are done; an earlier ack would let
            # the incoming write overwrite a buffer still being sent.
            pltpu.semaphore_signal(ack_sem, inc=1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)


def ring_matmul(a, b, mesh: Mesh, *, axis: str = "x",
                config: GemmConfig = None, interpret: bool = None,
                out_dtype=jnp.float32, block_k: int = None):
    """C[P(x), full-N] = A[P(x), K] . B[K, P(x)] on a 1-D ring.

    With ``block_k=None`` the local operands are held in VMEM (fast path
    for VMEM-sized locals); with ``block_k`` set, operands and the ring
    buffers stay in HBM and K streams through double-buffered VMEM tiles —
    out-of-VMEM locals with three-level overlap (ICI / DMA / MXU).
    A is row-sharded over ``axis``, B column-sharded; the result is
    row-sharded with full N per device.
    """
    n_dev = mesh.shape[axis]
    m, k = a.shape
    k2, n = b.shape
    if k != k2 or m % n_dev or n % n_dev:
        raise ValueError(f"shape ({m},{n},{k}) not divisible by ring size "
                         f"{n_dev}")
    ml, nl = m // n_dev, n // n_dev
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and nl % 128:
        raise ValueError(
            f"N/n_devices = {nl} must be a multiple of 128 in compiled mode "
            "(dynamic output slices land on the lane dimension)")
    precision = (jax.lax.Precision.HIGHEST
                 if (config and config.precision in ("high", "highest"))
                 else jax.lax.Precision.DEFAULT)

    if block_k is not None:
        if k % block_k:
            raise ValueError(f"K={k} must be divisible by block_k={block_k}")
        if block_k % 128 and not interpret:
            # Mosaic: HBM slices along the lane dimension must be
            # 128-aligned (interpreter mode is lenient).
            raise ValueError(f"block_k={block_k} must be a multiple of 128 "
                             "(HBM slices along the lane dim)")
        kernel = functools.partial(
            _ring_kernel_tiled, n_dev=n_dev, nl=nl, bk=block_k,
            axis_name=axis, precision=precision, use_barrier=not interpret)

        def local(a_blk, b_blk):
            out, _ = pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct((ml, n), jnp.dtype(out_dtype)),
                    # HBM ring buffer (RDMA target) — an output so the
                    # kernel may write it.
                    jax.ShapeDtypeStruct((2, k, nl), b_blk.dtype),
                ),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                           pl.BlockSpec(memory_space=pl.ANY)),
                scratch_shapes=[
                    pltpu.VMEM((2, ml, block_k), a_blk.dtype),
                    pltpu.VMEM((2, block_k, nl), b_blk.dtype),
                    pltpu.VMEM((ml, nl), jnp.float32),
                    pltpu.VMEM((ml, nl), jnp.dtype(out_dtype)),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA((2, 2)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.REGULAR,
                ],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                                     collective_id=7),
                name=f"ca_gemm_ring_tiled_{n_dev}",
            )(a_blk, b_blk)
            return out
    else:
        kernel = functools.partial(_ring_kernel, n_dev=n_dev, nl=nl,
                                   axis_name=axis, precision=precision,
                                   use_barrier=not interpret)

        def local(a_blk, b_blk):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ml, n), jnp.dtype(out_dtype)),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((ml, k), a_blk.dtype),        # A stationary
                    pltpu.VMEM((2, k, nl), b_blk.dtype),     # B double buffer
                    pltpu.VMEM((ml, n), jnp.dtype(out_dtype)),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.REGULAR,
                ],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                                     collective_id=7),
                name=f"ca_gemm_ring_{n_dev}",
            )(a_blk, b_blk)

    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(axis, None), P(None, axis)),
                       out_specs=P(axis, None), check_vma=False)
    return fn(a, b)


def shard_operands_ring(a, b, mesh: Mesh, axis: str = "x"):
    a_s = jax.device_put(a, NamedSharding(mesh, P(axis, None)))
    b_s = jax.device_put(b, NamedSharding(mesh, P(None, axis)))
    return a_s, b_s
