"""Grouped (ragged) GEMM Pallas kernels — the MoE expert-matmul core.

The reference computes one dense ``C = A x B`` per launch
(``include/MatrixMultiplication.h:155-171``); serving-scale TPU workloads
(mixture-of-experts FFNs) instead need *one GEMM per expert over a ragged
row partition of A*:

    out[rows(g), :] = lhs[rows(g), :] @ rhs[g]      for g in range(G)

with ``rows(g)`` the contiguous row span given by ``group_sizes`` — the
semantics of ``jax.lax.ragged_dot``.  This module implements it as a single
Pallas kernel so the ragged dimension never leaves the MXU pipeline:

* **Logical-tile schedule.** The (group x M-tile) intersection list is
  computed *inside jit* from the dynamic ``group_sizes`` (cumulative sums +
  ``jnp.repeat(total_repeat_length=...)``) and fed to the kernel as
  scalar-prefetch metadata: per logical tile ``t`` — its group id, its
  M-tile id, its valid row span, and a first-visit flag.  The grid is the
  *static upper bound* ``m_tiles + G`` (each group boundary splits at most
  one tile; padding steps are masked no-ops), so one compilation serves
  every routing outcome — the TPU answer to the reference's compile-time
  specialization (``CMakeLists.txt:7-36``): specialize on *shape*, never on
  *values*.
* **Boundary tiles merge by disjoint-row select.** An M-tile straddling a
  group boundary is visited once per group; visits after the first merge
  their rows into the resident output block with ``jnp.where`` (rows are
  disjoint, so the merge is exact in any dtype).  Consecutive logical tiles
  share the output index, so Mosaic keeps the block in VMEM between visits
  — the revisiting analogue of the PE's stationary ``cBuffer``
  (reference ``kernel/Compute.cpp:26``).
* **K streams innermost** into an fp32 VMEM accumulator, exactly like the
  dense kernel (``ops/pallas_mxu.py``); HBM traffic stays at the
  communication-avoiding ``M*N*(1 + K/bn + K/bm)`` words plus one ``rhs``
  sweep per group.

Rows beyond ``sum(group_sizes)`` are written as zeros (``jax.lax.ragged_dot``
leaves them unspecified).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gemm_hls_tpu.config import GemmConfig, cdiv
from gemm_hls_tpu.ops.pallas_mxu import _resolve_precision


def _group_metadata(group_sizes, m, bm, num_groups, *, cover_all_groups=False):
    """Logical-tile metadata for a ragged row partition, computed in-jit.

    Returns int32 arrays of static length ``T = cdiv(m, bm) + num_groups``:

      gids[t]:  group id owning logical tile t.  Steps that do no MXU work
                (padding slots, virtual-tail tiles) carry the id of the
                *last computing* step instead, so their rhs block index
                equals the block already resident in VMEM and Mosaic
                issues no DMA for them (forward path only).
      mids[t]:  M-tile index that tile t reads/writes.
      fmid[t]:  M-tile index for *fetching* lhs: equal to mids[t] on
                computing steps, forward-filled from the last computing
                step otherwise (so non-computing steps fetch nothing new).
      row_lo/row_hi[t]: global row span [lo, hi) of valid rows; empty for
                padding steps and for the virtual group covering rows past
                ``sum(group_sizes)`` (those rows are zero-filled).
      first[t]: 1 iff t is the first visit of its M-tile (forward kernel) —
                the visit that overwrites instead of merging.

    With ``cover_all_groups`` every *empty* group still gets one logical
    tile (empty row span, ``first``=1 per *group* rather than per M-tile) so
    a kernel writing per-group output blocks (the grad-of-rhs kernel) zeroes
    the blocks of experts that received no rows.
    """
    i32 = jnp.int32
    m_tiles = max(cdiv(m, bm), 1)
    t_cap = m_tiles + num_groups
    gs = group_sizes.astype(i32)
    total = jnp.sum(gs)
    if cover_all_groups:
        sizes = gs
        n_groups_x = num_groups
    else:
        # Virtual tail group: rows [total, m) — zero-filled output.
        sizes = jnp.concatenate([gs, jnp.maximum(m - total, 0)[None]])
        n_groups_x = num_groups + 1
    ends = jnp.minimum(jnp.cumsum(sizes), m)
    starts = jnp.clip(ends - sizes, 0, m)
    tile_lo = starts // bm
    tile_hi = -(-ends // bm)
    tiles_per = jnp.where(sizes > 0, tile_hi - tile_lo, 0)
    if cover_all_groups:
        tiles_per = jnp.maximum(tiles_per, 1)
    n_active = jnp.sum(tiles_per)

    t_idx = jnp.arange(t_cap, dtype=i32)
    active = t_idx < n_active
    rep = functools.partial(jnp.repeat, repeats=tiles_per,
                            total_repeat_length=t_cap)
    gids = rep(jnp.arange(n_groups_x, dtype=i32))
    # M-tile id = group's first tile + position within the group's tile run.
    cum_excl = jnp.cumsum(tiles_per) - tiles_per
    mids = rep(tile_lo) + t_idx - rep(cum_excl)
    mids = jnp.where(active, jnp.minimum(mids, m_tiles - 1), m_tiles - 1)

    row_lo = jnp.where(active, starts[gids], 0)
    row_hi = jnp.where(active, ends[gids], 0)
    if not cover_all_groups:
        # The virtual group only zero-fills: empty span, rhs id clamped.
        row_hi = jnp.where(gids == num_groups, row_lo, row_hi)
    gids = jnp.minimum(gids, num_groups - 1)

    if cover_all_groups:
        prev = jnp.concatenate([jnp.full((1,), -1, i32), gids[:-1]])
        first = ((gids != prev) & active).astype(i32)
        # Keep gids intact (they index per-group *output* blocks — empty
        # groups must still write their zero block) but forward-fill the
        # fetch mid so empty-group and padding slots fetch nothing new.
        computing = row_hi > row_lo
        fmid = jnp.maximum(
            jax.lax.cummax(jnp.where(computing, mids, -1)), 0)
    else:
        prev = jnp.concatenate([jnp.full((1,), -1, i32), mids[:-1]])
        first = ((mids != prev) & active).astype(i32)
        # Forward-fill gid/mid over non-computing steps (empty row span):
        # those steps skip the dot, so pinning their lhs/rhs block indices
        # to the last computing step's blocks makes their DMAs no-ops.
        # gids are nondecreasing across the schedule, so cummax is the
        # forward fill; all-empty routings fall back to block 0.
        computing = row_hi > row_lo
        gids = jnp.maximum(
            jax.lax.cummax(jnp.where(computing, gids, -1)), 0)
        fmid = jnp.maximum(
            jax.lax.cummax(jnp.where(computing, mids, -1)), 0)
    return gids, mids, fmid, row_lo, row_hi, first


def _mask_k_tail(val, axis, limit):
    idx = jax.lax.broadcasted_iota(jnp.int32, val.shape, axis)
    return jnp.where(idx < limit, val, jnp.zeros((), val.dtype))


def _row_mask(mid, bm, lo, hi, shape):
    rows = mid * bm + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (rows >= lo) & (rows < hi)


def _gmm_kernel(gids, mids, fmid, lo, hi, first, lhs_ref, rhs_ref, o_ref,
                acc_ref, *, n_k_grid, bm, k_rem, rhs_contract, precision,
                out_dtype):
    """One (bm x bn) output tile restricted to one group's rows.

    Grid (n, t, k): k accumulates into fp32 scratch; at the last K step the
    group's rows are merged into the output block — overwrite on the
    M-tile's first visit, disjoint-row ``where`` merge on revisits (the
    block is VMEM-resident between consecutive visits by construction).
    """
    t = pl.program_id(1)
    k_id = pl.program_id(2)

    # Padding steps (schedule slots past the routing's active tile count)
    # and the virtual tail group have an empty row span: skip the MXU work
    # entirely — at G groups the static schedule carries up to G such
    # slots, a full discarded dot each (measured 120 -> 188 TF at even
    # 8-expert routing).  Their block *index maps* clamp the K coordinate
    # to the final K step (see ``_clamped_k`` below), so consecutive
    # padding steps map to the block already resident in VMEM and Mosaic
    # issues no DMA at all — without the clamp every padding step fetched
    # a fresh (bm, bk) lhs block, which at 4096^3/G=8 made the schedule's
    # 50% padding slots cost full memory bandwidth (measured 101 TF = 53%
    # of the dense bound; clamped they are sub-microsecond no-ops).
    @pl.when(hi[t] > lo[t])
    def _compute():
        @pl.when(k_id == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a, b = lhs_ref[:], rhs_ref[0]
        if k_rem:
            k_axis_b = 1 if rhs_contract == 1 else 0
            if n_k_grid == 1:
                limit = k_rem
            else:
                limit = jnp.where(k_id == n_k_grid - 1, k_rem, a.shape[1])
            a = _mask_k_tail(a, 1, limit)
            b = _mask_k_tail(b, k_axis_b, limit)
        acc_ref[:] += jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (rhs_contract,)), ((), ())),
            preferred_element_type=acc_ref.dtype, precision=precision)

    # Store only on real visits: padding steps (first == 0 *and* empty
    # span) would otherwise pay a (bm, bn) VMEM read-modify-write per
    # step.  Virtual-tail first visits (first == 1, empty span) must still
    # store — that write is the zero-fill of rows past sum(group_sizes).
    @pl.when((k_id == n_k_grid - 1) & ((hi[t] > lo[t]) | (first[t] == 1)))
    def _store():
        keep = _row_mask(mids[t], bm, lo[t], hi[t], o_ref.shape)
        cur = o_ref[:]
        prev = jnp.where(first[t] == 1, jnp.zeros_like(cur), cur)
        o_ref[:] = jnp.where(keep, acc_ref[:].astype(out_dtype), prev)


@functools.partial(jax.jit, static_argnames=("cfg", "transpose_rhs",
                                             "interpret"))
def grouped_mxu(lhs, rhs, group_sizes, *, cfg: GemmConfig,
                transpose_rhs=False, interpret=False):
    """Ragged grouped matmul: (M, K) x (G, K, N) -> (M, N).

    ``group_sizes`` (G,) int32 partitions the M rows contiguously; row block
    g multiplies ``rhs[g]``.  With ``transpose_rhs`` each expert matrix is
    (N, K) — contraction over its last axis, no materialized transpose
    (used copy-free by the backward pass).  Rows past ``sum(group_sizes)``
    come back zero.
    """
    m, k_dim = lhs.shape
    num_groups = rhs.shape[0]
    if group_sizes.shape != (num_groups,):
        raise ValueError(
            f"group_sizes {group_sizes.shape} != ({num_groups},)")
    if transpose_rhs:
        n, kb = rhs.shape[1:]
        rhs_contract = 1
    else:
        kb, n = rhs.shape[1:]
        rhs_contract = 0
    if kb != k_dim:
        raise ValueError(f"contraction mismatch: {lhs.shape} x {rhs.shape}")
    if m == 0 or n == 0:
        return jnp.zeros((m, n), cfg.jout_dtype)

    bm = min(cfg.block_m, m)
    bn = min(cfg.block_n, n)
    bk = min(cfg.block_k, k_dim)
    meta = _group_metadata(group_sizes, m, bm, num_groups)
    t_cap = meta[0].shape[0]
    grid = (cdiv(n, bn), t_cap, cdiv(k_dim, bk))
    n_k = grid[2]

    kernel = functools.partial(
        _gmm_kernel, n_k_grid=n_k, bm=bm, k_rem=k_dim % bk,
        rhs_contract=rhs_contract, precision=_resolve_precision(cfg),
        out_dtype=cfg.jout_dtype)

    # Non-computing steps (empty row span) pin their K block index to the
    # last K step: combined with the forward-filled gid/fmid this makes
    # every padding/tail step's lhs and rhs blocks identical to the blocks
    # already in VMEM, so Mosaic's pipeline fetches nothing for them.
    def _clamped_k(t, kk, lo, hi):
        return jnp.where(hi[t] > lo[t], kk, n_k - 1)

    if transpose_rhs:
        rhs_block = (1, bn, bk)
        rhs_index = lambda j, t, kk, g, mi, fm, lo, hi, fi: (  # noqa: E731
            g[t], j, _clamped_k(t, kk, lo, hi))
    else:
        rhs_block = (1, bk, bn)
        rhs_index = lambda j, t, kk, g, mi, fm, lo, hi, fi: (  # noqa: E731
            g[t], _clamped_k(t, kk, lo, hi), j)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * n * k_dim,
            bytes_accessed=(lhs.size * lhs.dtype.itemsize
                            + rhs.size * rhs.dtype.itemsize
                            + m * n * jnp.dtype(cfg.jout_dtype).itemsize),
            transcendentals=0,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk),
                         lambda j, t, kk, g, mi, fm, lo, hi, fi: (
                             fm[t], _clamped_k(t, kk, lo, hi))),
            pl.BlockSpec(rhs_block, rhs_index),
        ],
        out_specs=pl.BlockSpec((bm, bn),
                               lambda j, t, kk, g, mi, *_: (mi[t], j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), cfg.jacc_dtype)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), cfg.jout_dtype),
        interpret=interpret,
        name=f"ca_gemm_grouped_{bm}x{bn}x{bk}x{num_groups}",
        **kwargs,
    )(*meta, lhs, rhs)


def _tgmm_kernel(gids, mids, fmid, lo, hi, first, lhs_ref, g_ref, o_ref,
                 acc_ref, *, t_grid, bm, precision, out_dtype):
    """One (bk x bn) block of one group's grad: sum over the group's row
    tiles of ``lhs_rows.T @ g_rows``.

    Grid (kb, jb, t) with t innermost: consecutive logical tiles of the
    same group keep the output block resident; the group's first tile
    zero-initializes the accumulator, later tiles read-modify-write.
    Rows are masked *before* the dot — the contraction runs over rows
    here, so a stale lane would pollute every output element (same
    reasoning as the K-tail mask in the dense kernel, reference
    ``kernel/Compute.cpp:112-137``).  Empty-span steps (empty groups,
    schedule padding) skip the dot entirely; their input blocks are
    fmid-pinned to the last computing step's, so they cost no DMA either.
    """
    t = pl.program_id(2)

    @pl.when(first[t] == 1)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(hi[t] > lo[t])
    def _compute():
        keep = _row_mask(mids[t], bm, lo[t], hi[t], (lhs_ref.shape[0], 1))
        a = jnp.where(keep, lhs_ref[:], jnp.zeros((), lhs_ref.dtype))
        g = jnp.where(keep, g_ref[:], jnp.zeros((), g_ref.dtype))
        acc_ref[:] += jax.lax.dot_general(
            a, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_ref.dtype, precision=precision)

    # Last visit of this group = next tile belongs to another group (or the
    # schedule ends).  Padding steps have first=0 and skip the compute.
    is_last = jnp.where(t == t_grid - 1, 1,
                        (gids[jnp.minimum(t + 1, t_grid - 1)] != gids[t])
                        .astype(jnp.int32))

    @pl.when(is_last == 1)
    def _store():
        o_ref[0] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "num_groups",
                                             "interpret"))
def grouped_update_mxu(lhs, g, group_sizes, *, cfg: GemmConfig,
                       num_groups: int, interpret=False):
    """Per-group outer-product GEMM: out[gg] = lhs[rows(gg)].T @ g[rows(gg)].

    The grad-of-rhs of :func:`grouped_mxu` ((M, K), (M, N) -> (G, K, N)).
    Groups that received zero rows get zero blocks (``cover_all_groups``
    metadata guarantees every group at least one — possibly empty —
    logical tile).
    """
    m, k_dim = lhs.shape
    mg, n = g.shape
    if mg != m:
        raise ValueError(f"row mismatch: {lhs.shape} x {g.shape}")
    if m == 0:
        return jnp.zeros((num_groups, k_dim, n), cfg.jout_dtype)

    bm = min(cfg.block_m, m)
    bk = min(cfg.block_k, k_dim)
    bn = min(cfg.block_n, n)
    meta = _group_metadata(group_sizes, m, bm, num_groups,
                           cover_all_groups=True)
    t_cap = meta[0].shape[0]
    grid = (cdiv(k_dim, bk), cdiv(n, bn), t_cap)

    kernel = functools.partial(
        _tgmm_kernel, t_grid=t_cap, bm=bm,
        precision=_resolve_precision(cfg), out_dtype=cfg.jout_dtype)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * n * k_dim,
            bytes_accessed=(lhs.size * lhs.dtype.itemsize
                            + g.size * g.dtype.itemsize
                            + num_groups * k_dim * n
                            * jnp.dtype(cfg.jout_dtype).itemsize),
            transcendentals=0,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk),
                         lambda kb, jb, t, gg, mi, fm, *_: (fm[t], kb)),
            pl.BlockSpec((bm, bn),
                         lambda kb, jb, t, gg, mi, fm, *_: (fm[t], jb)),
        ],
        out_specs=pl.BlockSpec((1, bk, bn),
                               lambda kb, jb, t, gg, mi, *_: (gg[t], kb, jb)),
        scratch_shapes=[pltpu.VMEM((bk, bn), cfg.jacc_dtype)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups, k_dim, n),
                                       cfg.jout_dtype),
        interpret=interpret,
        name=f"ca_gemm_grouped_update_{bk}x{bn}x{bm}x{num_groups}",
        **kwargs,
    )(*meta, lhs, g)
