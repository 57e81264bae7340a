"""Flash attention: one Pallas kernel, probabilities never touch HBM.

The CA-tiling idea taken to its limit for the attention workload: the
fused-scores path (``ops/attention.py``) already fuses the softmax into
the scores GEMM's writeback — this kernel fuses the *second* GEMM too,
streaming KV blocks through VMEM while the (block_q, head_dim) output
accumulator stays stationary, exactly the reference's stationary-C /
streamed-K schedule (``kernel/Compute.cpp:53-149``) applied twice in a
row.  HBM traffic drops from O(S²) (the probability matrix round trip)
to O(S·D): Q, K, V are read once and O written once.

Numerically this is the online-softmax recurrence (the max/sum carries
``m``/``l`` play the role of the accumulator's running normalization):

    m_new = max(m, rowmax(s_j))
    p     = exp(s_j - m_new)
    l     = exp(m - m_new) * l + rowsum(p)
    acc   = exp(m - m_new) * acc + p @ v_j

with everything in f32 except the two MXU contractions (operand dtype,
f32 accumulate).  Masked/padded score columns use a large *finite*
negative value (not -inf) so ``exp(m - m_new)`` can never produce
``inf - inf = nan`` on rows whose first blocks are fully masked.

Grid = (batch·heads, q-tiles, kv-tiles), kv innermost ("arbitrary" — the
carries live in VMEM scratch across kv steps).  When the whole KV
sequence fits one block the kernel takes a scratch-free single-pass
branch (the analogue of the 2-D GEMM kernel's whole-K fast path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.pallas_mxu import _resolve_precision

# Large finite "minus infinity" for masked scores: big enough that
# exp(x - m) underflows to 0 against any real score, small enough that
# (mask - mask) = 0 stays exact (no nan) if a row is ever fully masked.
_MASK = -0.7 * jnp.finfo(jnp.float32).max


def _lane_expand(x, w):
    """(bq, 128) lane-replicated carry -> (bq, w), by lane-tiling when
    possible.  Never materialize a (bq, 1) intermediate: a lane-1
    vector forces Mosaic relayouts (lane slice + splat) that measured
    ~25% of a whole flash step at block 1024²."""
    if w == 128:
        return x
    if w % 128 == 0:
        return jnp.tile(x, (1, w // 128))
    return jnp.broadcast_to(x[:, :1], (x.shape[0], w))


def _flash_kernel(q_ref, k_ref, v_ref, *refs, n_kv_grid, kv_rem,
                  block_q, block_kv, causal, precision, out_dtype,
                  window=None, logit_cap=None, has_kvlen=False,
                  has_segids=False, has_offsets=False, kv_group=1,
                  s_q_total=None, save_lse=False, scale=1.0):
    """One (q-tile, kv-tile) step of online-softmax attention.

    ``refs`` = ([len_ref,] [offs_ref,] o_ref[, lse_ref], acc_ref,
    m_ref, l_ref); with ``has_kvlen`` a per-example logical KV length
    arrives as an SMEM scalar (padded-cache decode: positions >= length
    are masked exactly like the physical overhang).  With
    ``has_offsets`` a (2,) int32 SMEM pair (q_offset, kv_offset) shifts
    the ABSOLUTE positions the causal/window masks compare — how ring
    attention tells the kernel where this KV shard sits in the global
    sequence.  With ``save_lse`` the per-row log-sum-exp ``m + log(l)``
    is emitted as a second output — the residual the backward kernels
    need to recompute probabilities without re-running the softmax
    reduction.
    """
    if has_kvlen:
        len_ref, *refs = refs
    else:
        len_ref = None
    if has_offsets:
        offs_ref, *refs = refs
        q_off, kv_off = offs_ref[0], offs_ref[1]
    else:
        q_off = kv_off = 0
    if has_segids:
        qseg_ref, kvseg_ref, *refs = refs
    if save_lse:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, acc_ref, m_ref, l_ref = refs
        lse_ref = None
    f32 = jnp.float32
    j = pl.program_id(2) if n_kv_grid > 1 else 0
    # Hoisted out of the pl.when body: program_id cannot lower inside a
    # lax.cond branch in interpreter mode.
    i = pl.program_id(1)

    # Causal block skip: the whole kv block is in the future of the whole
    # q tile — nothing to do (the grid still steps, but no MXU/VPU work).
    # A sliding window additionally skips blocks wholly OLDER than every
    # query's window start (q_pos - window + 1); a dynamic per-example
    # KV length skips blocks past the logical cache end.
    live = True
    if causal:
        live = kv_off + j * block_kv < q_off + (i + 1) * block_q
        if window is not None:
            live = live & (kv_off + (j + 1) * block_kv
                           > q_off + i * block_q - window + 1)
    if has_kvlen:
        kv_len = len_ref[pl.program_id(0) // kv_group, 0]
        # Causal decode anchoring: the s_q query positions are the LAST
        # s_q positions of the logical cache ("bottom-right" alignment),
        # so q index r sits at absolute position kv_len - s_q + r.
        causal_off = kv_len - s_q_total if causal else 0
        if causal:
            live = (j * block_kv
                    < causal_off + (i + 1) * block_q)
            if window is not None:
                live = live & ((j + 1) * block_kv
                               > causal_off + i * block_q - window + 1)
    else:
        causal_off = 0
    if has_kvlen and n_kv_grid > 1:
        live = live & (j * block_kv < kv_len)

    if n_kv_grid > 1:
        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, _MASK)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

    def step():
        q = q_ref[0]                       # (block_q, d)
        if scale != 1.0:
            # In-kernel scale fold, applied to the (block_q, d) q tile
            # in registers — w/d times cheaper than scaling the
            # (block_q, block_kv) scores, and it saves the external
            # q*scale pass's full HBM round trip (measured 74 -> 128 TF
            # on the S=1024 causal one-pass kernel).  Same numerics as
            # the old external fold (bf16 q·scale).
            q = q * scale
        k = k_ref[0]                       # (block_kv, d)
        v = v_ref[0]                       # (block_kv, d)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=precision)           # (block_q, block_kv)
        if logit_cap is not None:
            # Soft cap (Gemma-style): squash scores into (-cap, cap)
            # BEFORE masking, so the mask value stays dominant.
            s = logit_cap * jnp.tanh(s / logit_cap)

        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = None
        if kv_rem or has_kvlen:
            # The final kv block overhangs the logical sequence (and a
            # dynamic per-example length may end even earlier): stale /
            # out-of-length score columns are *replaced* (where()
            # discards any garbage, even nan), and v's rows beyond the
            # limit are zeroed — the masked p is exactly 0 there, but
            # 0 * nan would still poison the PV contraction (GEMM
            # kernel K-tail rule, ops/pallas_mxu.py::_mask_k_tail).
            if not kv_rem:
                limit = block_kv
            elif n_kv_grid == 1:
                limit = kv_rem
            else:
                limit = jnp.where(j == n_kv_grid - 1, kv_rem, block_kv)
            if has_kvlen:
                dyn = jnp.clip(kv_len - j * block_kv, 0, block_kv)
                limit = jnp.minimum(limit, dyn)
            valid = col < limit
            ridx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            v = jnp.where(ridx < limit, v, jnp.zeros((), v.dtype))
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            q_pos = causal_off + q_off + i * block_q + row
            kv_pos = kv_off + j * block_kv + col
            keep = kv_pos <= q_pos
            if window is not None:
                keep = keep & (kv_pos > q_pos - window)
            valid = keep if valid is None else valid & keep
        if has_segids:
            # Packed sequences: only same-segment pairs interact.
            seg_ok = qseg_ref[0] == kvseg_ref[0]  # (bq,1)==(1,bkv)
            valid = seg_ok if valid is None else valid & seg_ok
        if valid is not None:
            s = jnp.where(valid, s, _MASK)

        d_out = o_ref.shape[-1]

        def guard_p(p):
            # Segment masking can fully mask a block row (its segment
            # absent from this kv block) without the block being
            # skipped; m stays at _MASK there and exp(_MASK - _MASK)=1
            # would corrupt l/acc — zero those p entries explicitly.
            # Offsets can do the same: a window'd (or position-shifted)
            # ring shard may be live for only part of the q tile's rows.
            if has_segids or has_offsets:
                return jnp.where(valid, p, 0.0)
            return p

        # m/l carries stay (block_q, 128) lane-replicated end to end —
        # (block_q, 1) intermediates force Mosaic lane relayouts that
        # measured ~25% of the whole step (see _flash_kernel_tri).
        if n_kv_grid == 1:
            m128 = jax.lax.broadcast_in_dim(
                jnp.max(s, axis=-1), (s.shape[0], 128), (0,))
            p = guard_p(jnp.exp(s - _lane_expand(m128, s.shape[1])))
            l128 = jax.lax.broadcast_in_dim(
                jnp.sum(p, axis=-1), m128.shape, (0,))
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            # A fully-masked row (possible under segment ids, or a
            # window'd ring shard) has l = 0: emit o = 0, lse = -inf
            # (the "no contribution" partial) instead of 0/0 = nan.
            l_g = jnp.where(l128 == 0, 1.0, l128)
            o_ref[0] = (pv / _lane_expand(l_g, d_out)).astype(out_dtype)
            if save_lse:
                lse_ref[0] = (m128 + jnp.log(l128))[:, :1]
            return

        m_prev = m_ref[:]                               # (block_q, 128)
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=-1)[:, None]
        m_new = jnp.maximum(m_prev, m_cur)
        p = guard_p(jnp.exp(s - _lane_expand(m_new, s.shape[1])))
        corr = jnp.exp(m_prev - m_new)                  # (block_q, 128)
        l_new = corr * l_prev + jax.lax.broadcast_in_dim(
            jnp.sum(p, axis=-1), l_prev.shape, (0,))
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        acc_ref[:] = acc_ref[:] * _lane_expand(corr, d_out) + pv
        m_ref[:] = m_new
        l_ref[:] = l_new

    if (causal or has_kvlen) and n_kv_grid > 1:
        @pl.when(live)
        def _():
            step()
    else:
        step()

    if n_kv_grid > 1:
        @pl.when(j == n_kv_grid - 1)
        def _store():
            l_fin = l_ref[:]
            l_g = jnp.where(l_fin == 0, 1.0, l_fin)
            o_ref[0] = (acc_ref[:] / _lane_expand(l_g, o_ref.shape[-1])
                        ).astype(out_dtype)
            if save_lse:
                lse_ref[0] = (m_ref[:] + jnp.log(l_fin))[:, :1]


def _live_blocks(n_q, n_kv, block_q, block_kv, window):
    """Boolean (n_q, n_kv) causal(∩window) block-liveness matrix.

    Same tile-level predicate the rectangular kernel evaluates per step
    (block j holds any kv position <= some q position of tile i, and —
    with a sliding window — any position inside some row's window)."""
    ii = np.arange(n_q, dtype=np.int64)[:, None]
    jj = np.arange(n_kv, dtype=np.int64)[None, :]
    live = jj * block_kv < (ii + 1) * block_q
    if window is not None:
        live &= (jj + 1) * block_kv > ii * block_q - window + 1
    return live


def _tri_tables(n_q, n_kv, block_q, block_kv, window, kv_rem=0, *,
                order="qmajor"):
    """Flattened live-step tables for the triangular causal grid.

    Returns an int32 (3, T+1) array: row 0 = outer (stationary) tile
    index per flat step, row 1 = inner (streamed) tile index, row 2 =
    1 where the block straddles a mask edge (causal diagonal, window
    tail, kv overhang) and needs in-block masking — interior blocks
    skip the iota/compare/select VPU passes entirely, which at d=128
    is a double-digit share of the per-block time.  Column T is a
    sentinel outer index (n_outer) so the kernel's one-step lookahead
    fires the row-end store at the true last step.  ``order`` =
    "qmajor" (q tile stationary, kv streamed — forward / dq) or
    "kvmajor" (kv tile stationary, q streamed — dkv)."""
    live = _live_blocks(n_q, n_kv, block_q, block_kv, window)
    ii = np.arange(n_q, dtype=np.int64)[:, None]
    jj = np.arange(n_kv, dtype=np.int64)[None, :]
    # Interior = every (q_pos, kv_pos) pair in the block is unmasked:
    # kv_max <= q_min (fully past the diagonal) and — with a window —
    # kv_min > q_max - window (fully inside every row's window).
    interior = (jj + 1) * block_kv - 1 <= ii * block_q
    if window is not None:
        interior &= jj * block_kv > (ii + 1) * block_q - 1 - window
    need = ~interior
    if kv_rem:
        need |= jj == n_kv - 1
    if order == "qmajor":
        outer, inner = np.nonzero(live)
        flag = need[outer, inner]
        n_outer = n_q
    else:
        outer, inner = np.nonzero(live.T)
        flag = need[inner, outer]
        n_outer = n_kv
    t = len(outer)
    tabs = np.empty((3, t + 1), np.int32)
    tabs[0, :t] = outer
    tabs[1, :t] = inner
    tabs[2, :t] = flag
    tabs[:, t] = (n_outer, 0, 0)
    return tabs


def _flash_kernel_tri(tab_ref, q_ref, k_ref, v_ref, *refs, n_kv_grid,
                      s_kv, block_q, block_kv, bkv_compute, precision,
                      out_dtype, window=None, logit_cap=None,
                      has_segids=False, save_lse=False, scale=1.0):
    """Causal flash step on the FLATTENED live-block grid.

    Grid = (batch·heads, T) where T = #live (q-tile, kv-tile) pairs of
    the causal(∩window) block mask; the scalar-prefetched ``tab_ref``
    (3, T+1) maps flat step t to its (i, j) and flags mask-edge blocks.
    Dead KV blocks never enter the grid, so — unlike the rectangular
    grid whose ``pl.when`` predication still schedules their DMA and
    pays their grid latch — skipped work costs literally nothing.  The
    reference expresses the same thing as loop *bounds* rather than a
    masked full loop (``kernel/Compute.cpp:112-137``); here the bounds
    are the table.

    The second lever decouples DMA granularity from compute
    granularity (the splash-attention ``bkv_compute`` idea): interior
    blocks run one whole-(block_q, block_kv) unmasked pass at the
    full-mask kernel's per-block rate, while edge blocks straddling the
    diagonal / window tail / kv overhang run an unrolled sub-loop of
    (block_q, bkv_compute) slices, each skipped entirely when fully
    masked.  The triangular MXU waste drops from ~(block_q+block_kv)/2
    to ~(block_q+bkv_compute)/2 padded rows per q tile without paying
    small-block DMA or grid-latch costs.
    """
    if has_segids:
        qseg_ref, kvseg_ref, *refs = refs
    if save_lse:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, acc_ref, m_ref, l_ref = refs
        lse_ref = None
    f32 = jnp.float32
    t = pl.program_id(1)
    i = tab_ref[0, t]
    j = tab_ref[1, t]
    # j resets per q row, so row start/end are table lookups, not j==0 /
    # j==last: one-step lookback/lookahead against the sentinel column.
    row_start = (t == 0) | (tab_ref[0, jnp.maximum(t - 1, 0)] != i)
    row_end = tab_ref[0, t + 1] != i
    edge = tab_ref[2, t] != 0

    @pl.when(row_start)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _MASK)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                       # (block_q, d)
    if scale != 1.0:
        q = q * scale      # in-kernel scale fold, (bq, d) in registers
    seg_q = qseg_ref[0] if has_segids else None     # (bq, 1)
    d = q.shape[1]

    def scores(k_sub):
        s = jax.lax.dot_general(
            q, k_sub, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        if logit_cap is not None:
            s = logit_cap * jnp.tanh(s / logit_cap)
        return s

    expand = _lane_expand

    def update(s, v, valid):
        """Online-softmax accumulate of one (bq, W) score slab; m/l
        stay (bq, 128) lane-replicated end to end (splash-attention's
        shape discipline)."""
        m_prev = m_ref[:]                              # (bq, 128)
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=-1)[:, None]           # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)             # (bq, 128)
        p = jnp.exp(s - expand(m_new, s.shape[1]))
        if has_segids:
            # A row whose segment is absent from every visited kv block
            # keeps m = _MASK; exp(_MASK - _MASK) = 1 would corrupt
            # l/acc and — unlike the plain window case — no later real
            # score ever arrives to zero it out via the corr factor.
            p = jnp.where(valid, p, 0.0)
        corr = jnp.exp(m_prev - m_new)                 # (bq, 128)
        l_new = corr * l_prev + jax.lax.broadcast_in_dim(
            jnp.sum(p, axis=-1), l_prev.shape, (0,))
        pv = jax.lax.dot_general(
            p, v.astype(f32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        acc_ref[:] = acc_ref[:] * expand(corr, d) + pv
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(edge)
    def _edge_step():
        # Unrolled (block_q, bkv_compute) sub-slices: fully-masked subs
        # are skipped (no MXU/VPU work at all); live subs mask at fine
        # granularity, so the diagonal's dead-MAC waste shrinks by
        # block_kv/bkv_compute while DMA stays whole-block.
        for sub in range(block_kv // bkv_compute):
            lo = sub * bkv_compute
            kv_start = j * block_kv + lo
            live = kv_start < (i + 1) * block_q
            live &= kv_start < s_kv
            if window is not None:
                live &= kv_start + bkv_compute > i * block_q - window + 1

            @pl.when(live)
            def _(lo=lo, kv_start=kv_start):
                v = v_ref[0, lo:lo + bkv_compute, :]
                s = scores(k_ref[0, lo:lo + bkv_compute, :])
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                q_pos = i * block_q + row
                kv_pos = kv_start + col
                valid = kv_pos <= q_pos
                if s_kv % block_kv:
                    valid &= kv_pos < s_kv
                    ridx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
                    v = jnp.where(ridx < s_kv - kv_start, v,
                                  jnp.zeros((), v.dtype))
                if window is not None:
                    valid &= kv_pos > q_pos - window
                if has_segids:
                    valid &= seg_q == kvseg_ref[0, :, lo:lo + bkv_compute]
                update(jnp.where(valid, s, _MASK), v, valid)

    @pl.when(jnp.logical_not(edge))
    def _interior_step():
        # One whole-block unmasked pass: no iota/compare/select VPU
        # work, one online-softmax carry per block_kv columns.
        if has_segids:
            seg_ok = seg_q == kvseg_ref[0]
            update(jnp.where(seg_ok, scores(k_ref[0]), _MASK),
                   v_ref[0], seg_ok)
        else:
            update(scores(k_ref[0]), v_ref[0], None)

    @pl.when(row_end)
    def _store():
        l_fin = l_ref[:]                               # (bq, 128)
        l_g = jnp.where(l_fin == 0, 1.0, l_fin)
        o_ref[0] = (acc_ref[:] / expand(l_g, d)).astype(out_dtype)
        if save_lse:
            lse_ref[0] = m_ref[:][:, :1] + jnp.log(l_fin[:, :1])


def _flash_kernel_onepass(q_ref, k_ref, v_ref, *refs, s_kv, block_q,
                          wq, w, precision, out_dtype, window=None,
                          logit_cap=None, has_segids=False,
                          save_lse=False, scale=1.0):
    """Causal flash with ONE grid step per q tile (whole-row KV resident).

    At small S the flattened triangular grid is still bound by per-step
    fixed cost, not MXU work: tri_probe at S=1024 measures ~2.2 us per
    512-block step of which only ~1 us is MXU — skipping dead blocks
    shaves MACs but keeps the latch/init/store steps, capping causal at
    ~50-60%% of the full-mask rate.  This kernel collapses each q-tile
    row to a single step: the head's FULL KV stays VMEM-resident (its
    index map is constant along the row axis, so it is DMA'd once per
    batch-head), and every ``wq``-row q sub-tile runs a dynamic-bound
    ``fori_loop`` over (wq, w) score slabs up to its own diagonal with
    the online-softmax state carried in REGISTERS — no scratch inits,
    no separate store steps, no dead-block latches, and the in-block
    causal waste is (wq + w)/2 rows instead of (block_q + block_kv)/2.
    The reference analogue is the same one it was for the triangular
    tables — loop *bounds* instead of masked full loops
    (``kernel/Compute.cpp:112-137``) — taken to per-row granularity.
    """
    if has_segids:
        qseg_ref, kvseg_ref, *refs = refs
    if save_lse:
        o_ref, lse_ref = refs
    else:
        o_ref, = refs
        lse_ref = None
    f32 = jnp.float32
    i = pl.program_id(1)
    d = q_ref.shape[-1]
    n_j = s_kv // w
    expand = _lane_expand
    for qi in range(block_q // wq):
        q = q_ref[0, qi * wq:(qi + 1) * wq, :]
        if scale != 1.0:
            # (wq, d) in-register fold, amortized over the slab loop —
            # scaling the (wq, w) scores per slab instead measured ~20%
            # of the whole kernel.
            q = q * scale
        seg_q = (qseg_ref[0, qi * wq:(qi + 1) * wq, :]
                 if has_segids else None)
        q_lo = i * block_q + qi * wq

        def slab(j, m_prev, l_prev, acc, q=q, seg_q=seg_q, q_lo=q_lo):
            kv0 = j * w
            k_sub = k_ref[0, kv0:kv0 + w, :]
            v_sub = v_ref[0, kv0:kv0 + w, :]
            s = jax.lax.dot_general(
                q, k_sub, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            if logit_cap is not None:
                s = logit_cap * jnp.tanh(s / logit_cap)
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            q_pos = q_lo + row
            kv_pos = kv0 + col
            valid = kv_pos <= q_pos
            if window is not None:
                valid &= kv_pos > q_pos - window
            if has_segids:
                valid &= seg_q == kvseg_ref[0, :, kv0:kv0 + w]
            s = jnp.where(valid, s, _MASK)
            m_cur = jnp.max(s, axis=-1)[:, None]
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - expand(m_new, w))
            if has_segids:
                # Rows whose segment never appears keep m = _MASK;
                # exp(_MASK - _MASK) = 1 would corrupt l/acc (a plain
                # window's corruption is washed out by corr = 0 once a
                # real score arrives; a missing segment's never is).
                p = jnp.where(valid, p, 0.0)
            corr = jnp.exp(m_prev - m_new)
            l_new = corr * l_prev + jax.lax.broadcast_in_dim(
                jnp.sum(p, axis=-1), l_prev.shape, (0,))
            pv = jax.lax.dot_general(
                p.astype(v_sub.dtype), v_sub,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
            return m_new, l_new, acc * expand(corr, d) + pv

        m_f = jnp.full((wq, 128), _MASK, f32)
        l_f = jnp.zeros((wq, 128), f32)
        acc = jnp.zeros((wq, d), f32)
        # STATICALLY UNROLLED slab loop with value carries: dead slabs
        # are skipped through lax.cond on the (dynamic) diagonal/window
        # bounds.  Unrolling is the performance lever — Mosaic software
        # -pipelines the independent MXU dots of one slab against the
        # VPU softmax chain of the previous one, which a fori_loop's
        # sequential body cannot express (measured 2x at S=1024:
        # experiments/causal_legs_probe.py, 112 vs 56 TF).
        for j in range(n_j):
            live = j * w < q_lo + wq       # not wholly future
            if window is not None:
                live &= (j + 1) * w > q_lo - window + 1
            m_f, l_f, acc = jax.lax.cond(
                live,
                lambda m, l, a, j=j: slab(j, m, l, a),
                lambda m, l, a: (m, l, a),
                m_f, l_f, acc)
        l_g = jnp.where(l_f == 0, 1.0, l_f)
        o_ref[0, qi * wq:(qi + 1) * wq, :] = (
            acc / expand(l_g, d)).astype(out_dtype)
        if save_lse:
            lse_ref[0, qi * wq:(qi + 1) * wq, :] = (
                m_f + jnp.log(l_f))[:, :1]


@functools.partial(jax.jit, static_argnames=(
    "cfg", "causal", "block_q", "block_kv", "block_kv_compute",
    "block_q_compute", "interpret", "window", "logit_cap", "save_lse",
    "scale"))
def flash_mha(q, k, v, kv_lengths=None, q_segment_ids=None,
              kv_segment_ids=None, offsets=None, *, cfg: GemmConfig,
              causal=False, block_q=512, block_kv=2048,
              block_kv_compute=None, block_q_compute=None, interpret=False,
              window=None, logit_cap=None, save_lse=False, scale=1.0):
    """Fused attention o = softmax(q·kᵀ)·v per head, streaming KV.

    Args:
      q: (B, S_q, D).  ``scale`` (static float) is folded into the f32
        scores IN-KERNEL (s = scale·q·kᵀ) — callers must NOT pre-scale
        q when passing it: the external q*scale pass costs a full HBM
        round trip of q (measured 74 -> 103 TF on the S=1024 causal
        one-pass kernel) and is less accurate (bf16 rounding of q).
      k, v: (B, S_kv, D).
      causal: apply the autoregressive mask (position-aligned at 0; fully
        future kv blocks are skipped, halving work for S_q = S_kv).
      offsets: optional (2,) int32 (q_offset, kv_offset) — absolute
        positions of this call's first q / kv row in the GLOBAL
        sequence, shifting the causal/window masks.  How ring attention
        localizes masking per KV shard; requires ``causal=True`` and is
        incompatible with ``kv_lengths`` (which carries its own decode
        anchoring).  Traced (no recompilation across values).
      block_q / block_kv: VMEM tile sizes along the two sequence axes.

    Returns (B, S_q, D) in ``cfg.out_dtype``.

    Shapes need not be tile-aligned: Mosaic bounds-masks the q-edge
    stores, and overhanging kv rows get masked scores + zeroed V rows
    in-register (the GEMM kernel's edge rules).  The head dim is never
    gridded, so Mosaic's own logical-extent handling covers a non-128
    D.
    """
    bsz, s_q, d = q.shape
    if k.ndim != 3 or v.ndim != 3 or k.shape != v.shape or \
            k.shape[2] != d or bsz % k.shape[0]:
        raise ValueError(f"flash_mha shapes: {q.shape} x {k.shape} "
                         f"x {v.shape}")
    if not (q.dtype == k.dtype == v.dtype):
        raise ValueError(f"flash_mha dtype mismatch: {q.dtype} x "
                         f"{k.dtype} x {v.dtype}")
    # Grouped-query attention: k/v may carry fewer heads than q (their
    # batch divides q's); each group of `group` q heads reads the same
    # kv head via the BlockSpec index map — no materialized broadcast.
    group = bsz // k.shape[0]
    s_kv = k.shape[1]
    block_q = min(block_q, s_q)
    block_kv = min(block_kv, s_kv)
    n_q = pl.cdiv(s_q, block_q)
    n_kv = pl.cdiv(s_kv, block_kv)
    grid = (bsz, n_q, n_kv)

    if window is not None and not causal:
        raise ValueError("window requires causal=True (sliding-window "
                         "attention is an autoregressive mask)")
    has_kvlen = kv_lengths is not None
    if has_kvlen:
        if kv_lengths.shape != (k.shape[0],):
            raise ValueError(f"kv_lengths must be ({k.shape[0]},), got "
                             f"{kv_lengths.shape}")
        kv_lengths = kv_lengths.astype(jnp.int32).reshape(-1, 1)
    has_offsets = offsets is not None
    if has_offsets:
        if not causal:
            raise ValueError("offsets only shift the causal/window "
                             "masks; they require causal=True")
        if has_kvlen:
            raise ValueError("offsets are incompatible with kv_lengths "
                             "(which carries its own decode anchoring)")
        offsets = jnp.asarray(offsets, jnp.int32).reshape(2)
    has_segids = q_segment_ids is not None
    if has_segids != (kv_segment_ids is not None):
        raise ValueError("q_segment_ids and kv_segment_ids must be "
                         "passed together")
    if has_segids:
        if q_segment_ids.shape != (bsz, s_q) or \
                kv_segment_ids.shape != (k.shape[0], s_kv):
            raise ValueError(
                f"segment ids must be ({bsz},{s_q}) / "
                f"({k.shape[0]},{s_kv}), got {q_segment_ids.shape} / "
                f"{kv_segment_ids.shape}")
        # Layouts the kernel can compare without a transpose: q ids
        # sublane-major (bq, 1), kv ids lane-major (1, bkv).
        q_segment_ids = q_segment_ids.astype(jnp.int32)[..., None]
        kv_segment_ids = kv_segment_ids.astype(jnp.int32)[:, None, :]

    # Static causal with the caller's block_kv covering the whole KV:
    # one grid step per q tile, KV VMEM-resident, register-carried
    # online softmax over a dynamic-bound sub-slab loop (see
    # _flash_kernel_onepass).  Needs s_kv sliceable into lane-aligned
    # slabs and the KV working set to fit VMEM; otherwise the
    # triangular-table grid below streams KV.
    if causal and not has_kvlen and not has_offsets and block_kv >= s_kv:
        w = 0
        if s_kv % 128 == 0:
            r = s_kv // 128
            dmax = min((block_kv_compute or 512) // 128, r)
            while dmax >= 1 and r % dmax:
                dmax -= 1
            w = 128 * dmax
        itm = q.dtype.itemsize
        # One grid step per q tile is the lever (amortizes the per-step
        # latch + store over the whole row's MXU work), so widen the q
        # tile to the full sequence when VMEM allows — measured 2x over
        # per-512-row steps at S=1024.
        bq1 = s_q if s_q % 8 == 0 else block_q
        resident = (2 * (2 * s_kv * d * itm)     # double-buffered K + V
                    + 2 * 2 * bq1 * d * itm)     # q + o blocks
        wq = min(block_q_compute or 512, bq1)
        while bq1 % wq:
            wq -= 8
        n_bodies = (s_kv // max(w, 1)) * (bq1 // max(wq, 1))
        # <= 64 unrolled cond bodies AND S_kv <= 4096 is the measured
        # -compiling envelope (S=4096 @ 512x512 works and wins at
        # 150-171 TF; S=8192 exhausts Mosaic resources even at 64
        # bodies of 1024x1024) — past it the triangular streamed grid
        # takes over.
        if (w and resident <= 0.7 * cfg.vmem_limit_bytes
                and n_bodies <= 64 and s_kv <= 4096):
            block_q = bq1
            n_q = pl.cdiv(s_q, block_q)
            kernel = functools.partial(
                _flash_kernel_onepass,
                s_kv=s_kv,
                block_q=block_q,
                wq=wq,
                w=w,
                precision=_resolve_precision(cfg),
                out_dtype=cfg.jout_dtype,
                window=window,
                logit_cap=logit_cap,
                has_segids=has_segids,
                save_lse=save_lse,
                scale=scale,
            )
            kwargs = {}
            if not interpret:
                kwargs["compiler_params"] = pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                    vmem_limit_bytes=cfg.vmem_limit_bytes,
                )
                kwargs["cost_estimate"] = pl.CostEstimate(
                    flops=int(2.2 * bsz * s_q * s_kv * d),
                    bytes_accessed=(q.size + k.size + v.size) * itm
                    + q.size * jnp.dtype(cfg.jout_dtype).itemsize,
                    transcendentals=bsz * s_q * s_kv // 2,
                )
            qi1 = lambda b, i: (b, i, 0)                        # noqa: E731
            kvi1 = lambda b, i, g=group: (b // g, 0, 0)         # noqa: E731
            out_specs = pl.BlockSpec((1, block_q, d), qi1,
                                     memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((bsz, s_q, d), cfg.jout_dtype)
            if save_lse:
                out_specs = (out_specs,
                             pl.BlockSpec((1, block_q, 1), qi1,
                                          memory_space=pltpu.VMEM))
                out_shape = (out_shape,
                             jax.ShapeDtypeStruct((bsz, s_q, 1),
                                                  jnp.float32))
            in_specs = [
                pl.BlockSpec((1, block_q, d), qi1,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_kv, d), kvi1, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_kv, d), kvi1, memory_space=pltpu.VMEM),
            ]
            operands = [q, k, v]
            if has_segids:
                in_specs.append(pl.BlockSpec((1, block_q, 1), qi1,
                                             memory_space=pltpu.VMEM))
                in_specs.append(pl.BlockSpec(
                    (1, 1, s_kv), lambda b, i, g=group: (b // g, 0, 0),
                    memory_space=pltpu.VMEM))
                operands.extend((q_segment_ids, kv_segment_ids))
            return pl.pallas_call(
                kernel,
                grid=(bsz, n_q),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                interpret=interpret,
                name=f"flash_mha_onepass_{block_q}x{wq}x{w}x{d}",
                **kwargs,
            )(*operands)

    # Static causal (± window/segids) with streamed KV: flatten the live
    # (q-tile, kv-tile) pairs into one grid axis via scalar prefetch, so
    # dead blocks are never DMA'd or latched (vs ~2x their cost under the
    # rectangular grid's pl.when predication).  kv_lengths / offsets make
    # the live set value-dependent and keep the rectangular grid.
    if causal and not has_kvlen and not has_offsets:
        bkvc = min(block_kv_compute or 512, block_kv)
        while block_kv % bkvc:     # largest divisor <= the request
            bkvc -= 1
        tabs = _tri_tables(n_q, n_kv, block_q, block_kv, window,
                           s_kv % block_kv)
        n_t = tabs.shape[1] - 1
        kernel = functools.partial(
            _flash_kernel_tri,
            n_kv_grid=n_kv,
            s_kv=s_kv,
            block_q=block_q,
            block_kv=block_kv,
            bkv_compute=bkvc,
            precision=_resolve_precision(cfg),
            out_dtype=cfg.jout_dtype,
            window=window,
            logit_cap=logit_cap,
            has_segids=has_segids,
            save_lse=save_lse,
            scale=scale,
        )
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=cfg.vmem_limit_bytes,
            )
            kwargs["cost_estimate"] = pl.CostEstimate(
                flops=4 * bsz * n_t * block_q * block_kv * d,
                bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
                + q.size * jnp.dtype(cfg.jout_dtype).itemsize,
                transcendentals=bsz * n_t * block_q * block_kv,
            )
        qi = lambda b, t, tab: (b, tab[0, t], 0)                # noqa: E731
        kvi = lambda b, t, tab, g=group: (b // g, tab[1, t], 0)  # noqa: E731
        out_specs = pl.BlockSpec((1, block_q, d), qi,
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bsz, s_q, d), cfg.jout_dtype)
        if save_lse:
            out_specs = (out_specs,
                         pl.BlockSpec((1, block_q, 1), qi,
                                      memory_space=pltpu.VMEM))
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((bsz, s_q, 1), jnp.float32))
        in_specs = [
            pl.BlockSpec((1, block_q, d), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), kvi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), kvi, memory_space=pltpu.VMEM),
        ]
        operands = [q, k, v]
        if has_segids:
            in_specs.append(pl.BlockSpec((1, block_q, 1), qi,
                                         memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec(
                (1, 1, block_kv),
                lambda b, t, tab, g=group: (b // g, 0, tab[1, t]),
                memory_space=pltpu.VMEM))
            operands.extend((q_segment_ids, kv_segment_ids))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, n_t),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            name=f"flash_mha_tri_{block_q}x{block_kv}x{d}",
            **kwargs,
        )(jnp.asarray(tabs), *operands)

    kernel = functools.partial(
        _flash_kernel,
        n_kv_grid=n_kv,
        kv_rem=s_kv % block_kv,
        block_q=block_q,
        block_kv=block_kv,
        causal=causal,
        precision=_resolve_precision(cfg),
        out_dtype=cfg.jout_dtype,
        window=window,
        logit_cap=logit_cap,
        has_kvlen=has_kvlen,
        has_segids=has_segids,
        has_offsets=has_offsets,
        kv_group=group,
        s_q_total=s_q,
        save_lse=save_lse,
        scale=scale,
    )

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        )
        flops = 4 * bsz * s_q * s_kv * d // (2 if causal else 1)
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * jnp.dtype(cfg.jout_dtype).itemsize,
            transcendentals=bsz * s_q * s_kv,
        )

    out_specs = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bsz, s_q, d), cfg.jout_dtype)
    if save_lse:
        out_specs = (out_specs,
                     pl.BlockSpec((1, block_q, 1),
                                  lambda b, i, j: (b, i, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bsz, s_q, 1), jnp.float32))

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d),
                     lambda b, i, j, g=group: (b // g, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d),
                     lambda b, i, j, g=group: (b // g, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q, k, v]
    if has_kvlen:
        # Whole (B_kv, 1) array resident in SMEM; the kernel indexes its
        # own row (Mosaic rejects sub-(8,128) blocked SMEM specs).
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(kv_lengths)
    if has_offsets:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(offsets)
    if has_segids:
        in_specs.append(pl.BlockSpec(
            (1, block_q, 1), lambda b, i, j: (b, i, 0),
            memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (1, 1, block_kv), lambda b, i, j, g=group: (b // g, 0, j),
            memory_space=pltpu.VMEM))
        operands.extend((q_segment_ids, kv_segment_ids))
    operands = tuple(operands)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
        name=f"flash_mha_{block_q}x{block_kv}x{d}",
        **kwargs,
    )(*operands)


# ---------------------------------------------------------------------------
# Backward: the flash recipe — recompute score blocks from the saved
# (q·scale, k) and the forward's per-row log-sum-exp, so the O(S²)
# probability matrix is never stored for the backward either.  Two
# kernels, each a streamed accumulation in VMEM scratch:
#
#   dq_i  = Σ_j  ds_ij · k_j          (kv streamed, dq stationary)
#   dk_j  = Σ_i  ds_ijᵀ · qs_i        (q streamed, dk/dv stationary)
#   dv_j  = Σ_i  p_ijᵀ  · do_i
#
# with p = exp(s − lse) and ds = p ⊙ (do·vᵀ − Δ), Δ_i = Σ_d do·o (the
# softmax-Jacobian row term), computed once in XLA.  5 MXU contractions
# total vs the forward's 2 — the standard flash backward cost.
# ---------------------------------------------------------------------------


def _zero_rows(x, limit):
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(idx < limit, x, jnp.zeros((), x.dtype))


def _recompute_p_ds(qs, k, v, do, lse, delta, *, j, i, n_kv_grid, kv_rem,
                    block_q, block_kv, causal, precision, window=None,
                    logit_cap=None, qseg=None, kvseg=None, q_off=0,
                    kv_off=0, scale=1.0):
    """Shared block recompute: returns (p, ds, k, v) with p/ds f32
    (block_q, block_kv) and k/v row-zeroed at the kv overhang.

    Masked columns (kv overhang, causal future, outside the sliding
    window) get p = ds = 0 — stale k rows are discarded by the where()
    on s, and stale k/v rows are zeroed before they enter any further
    contraction (0·nan from a stale lane would otherwise poison whole
    gradient tiles; same rule as ``ops/pallas_mxu.py::_mask_k_tail``).
    With ``logit_cap`` the returned ds carries the soft-cap's tanh
    derivative, so downstream dq/dk are gradients w.r.t. the RAW scores.
    """
    f32 = jnp.float32
    if scale != 1.0:
        # Forward's in-kernel scale fold, replayed in the recompute at
        # the same cheap (block_q, d) granularity.  The returned ds is
        # dL/d(scale·q·kᵀ); the callers fold the extra
        # d(scale·q·kᵀ)/d{q,k} = scale factor into dq/dk.
        qs = qs * scale
    s = jax.lax.dot_general(
        qs, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=precision)
    if logit_cap is not None:
        s = logit_cap * jnp.tanh(s / logit_cap)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if kv_rem:
        if n_kv_grid == 1:
            limit = kv_rem
        else:
            limit = jnp.where(j == n_kv_grid - 1, kv_rem, block_kv)
        s = jnp.where(col < limit, s, _MASK)
        k = _zero_rows(k, limit)
        v = _zero_rows(v, limit)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        q_pos = q_off + i * block_q + row
        kv_pos = kv_off + j * block_kv + col
        keep = kv_pos <= q_pos
        if window is not None:
            keep = keep & (kv_pos > q_pos - window)
        s = jnp.where(keep, s, _MASK)
    if qseg is not None:
        s = jnp.where(qseg == kvseg, s, _MASK)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=precision)
    ds = p * (dp - delta)
    if logit_cap is not None:
        # d(cap·tanh(x/cap))/dx = 1 - tanh² = 1 - (s_capped/cap)²; on
        # masked entries ds is already exactly 0, so the stray factor
        # (computed from the MASKED s) cannot corrupt anything.
        ds = ds * (1.0 - jnp.square(jnp.where(s <= _MASK, 0.0,
                                              s / logit_cap)))
    return p, ds, k, v


def _flash_bwd_dq_kernel(qs_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         *refs, n_kv_grid, kv_rem, block_q,
                         block_kv, causal, precision, out_dtype,
                         window=None, logit_cap=None, has_segids=False,
                         has_offsets=False, scale=1.0):
    if has_offsets:
        offs_ref, *refs = refs
        q_off, kv_off = offs_ref[0], offs_ref[1]
    else:
        q_off = kv_off = 0
    if has_segids:
        qseg_ref, kvseg_ref, dq_ref, acc_ref = refs
    else:
        dq_ref, acc_ref = refs
    j = pl.program_id(2) if n_kv_grid > 1 else 0
    i = pl.program_id(1)

    if n_kv_grid > 1:
        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    def step():
        _, ds, kz, _ = _recompute_p_ds(
            qs_ref[0], k_ref[0], v_ref[0], do_ref[0].astype(jnp.float32),
            lse_ref[0], delta_ref[0], j=j, i=i, n_kv_grid=n_kv_grid,
            kv_rem=kv_rem, block_q=block_q, block_kv=block_kv,
            causal=causal, precision=precision, window=window,
            logit_cap=logit_cap,
            qseg=qseg_ref[0] if has_segids else None,
            kvseg=kvseg_ref[0] if has_segids else None,
            q_off=q_off, kv_off=kv_off, scale=scale)
        contrib = jax.lax.dot_general(
            ds.astype(kz.dtype), kz,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if scale != 1.0:
            contrib = contrib * scale      # dq = scale · (ds · k)
        if n_kv_grid == 1:
            dq_ref[0] = contrib.astype(out_dtype)
        else:
            acc_ref[:] += contrib

    if causal and n_kv_grid > 1:
        live = kv_off + j * block_kv < q_off + (i + 1) * block_q
        if window is not None:
            live = live & (kv_off + (j + 1) * block_kv
                           > q_off + i * block_q - window + 1)

        @pl.when(live)
        def _():
            step()
    else:
        step()

    if n_kv_grid > 1:
        @pl.when(j == n_kv_grid - 1)
        def _store():
            dq_ref[0] = acc_ref[:].astype(out_dtype)


def _flash_bwd_dkv_kernel(qs_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          *refs, n_q_grid,
                          n_kv_grid, q_rem, kv_rem, block_q, block_kv,
                          causal, precision, out_dtype, window=None,
                          logit_cap=None, has_segids=False,
                          has_offsets=False, scale=1.0):
    """Grid (batch, kv-tiles, q-tiles): q streamed innermost, the
    (block_kv, d) dk/dv accumulators stationary."""
    if has_offsets:
        offs_ref, *refs = refs
        q_off, kv_off = offs_ref[0], offs_ref[1]
    else:
        q_off = kv_off = 0
    if has_segids:
        qseg_ref, kvseg_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    else:
        dk_ref, dv_ref, dk_acc, dv_acc = refs
    j = pl.program_id(1)
    i = pl.program_id(2) if n_q_grid > 1 else 0

    if n_q_grid > 1:
        @pl.when(i == 0)
        def _init():
            dk_acc[:] = jnp.zeros_like(dk_acc)
            dv_acc[:] = jnp.zeros_like(dv_acc)

    def step():
        qs = qs_ref[0]
        do = do_ref[0].astype(jnp.float32)
        p, ds, _, _ = _recompute_p_ds(
            qs, k_ref[0], v_ref[0], do, lse_ref[0], delta_ref[0],
            j=j, i=i, n_kv_grid=n_kv_grid,
            kv_rem=kv_rem, block_q=block_q, block_kv=block_kv,
            causal=causal, precision=precision, window=window,
            logit_cap=logit_cap,
            qseg=qseg_ref[0] if has_segids else None,
            kvseg=kvseg_ref[0] if has_segids else None,
            q_off=q_off, kv_off=kv_off, scale=scale)
        if q_rem:
            # The q overhang is NOT row-local here: garbage q rows feed
            # the over-q contractions below.  Zero p/ds rows AND the
            # stale qs/do rows themselves — 0·nan in the contraction
            # would still poison the whole dk/dv tile.
            is_last = i == n_q_grid - 1
            limit = jnp.where(is_last, q_rem, block_q)
            row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
            keep = row < limit
            p = jnp.where(keep, p, 0.0)
            ds = jnp.where(keep, ds, 0.0)
            qs = _zero_rows(qs, limit)
            do = _zero_rows(do, limit)
        dv_c = jax.lax.dot_general(
            p.astype(do_ref.dtype), do.astype(do_ref.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dk_c = jax.lax.dot_general(
            ds.astype(qs.dtype), qs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if scale != 1.0:
            dk_c = dk_c * scale            # dk = scale · (dsᵀ · q)
        if n_q_grid == 1:
            dk_ref[0] = dk_c.astype(out_dtype)
            dv_ref[0] = dv_c.astype(out_dtype)
        else:
            dk_acc[:] += dk_c
            dv_acc[:] += dv_c

    if causal and n_q_grid > 1:
        live = q_off + (i + 1) * block_q > kv_off + j * block_kv
        if window is not None:
            live = live & (q_off + i * block_q - window + 1
                           < kv_off + (j + 1) * block_kv)

        @pl.when(live)
        def _():
            step()
    else:
        step()

    if n_q_grid > 1:
        @pl.when(i == n_q_grid - 1)
        def _store():
            dk_ref[0] = dk_acc[:].astype(out_dtype)
            dv_ref[0] = dv_acc[:].astype(out_dtype)


def _flash_bwd_dq_tri(tab_ref, qs_ref, k_ref, v_ref, do_ref, lse_ref,
                      delta_ref, *refs, n_kv_grid, kv_rem, block_q,
                      block_kv, precision, out_dtype, window=None,
                      logit_cap=None, has_segids=False, scale=1.0):
    """Causal dq on the FLATTENED live-block grid (q-major table).

    Same lever as the forward's triangular kernel: the rectangular
    grid's ``pl.when(live)`` predication still schedules dead blocks'
    DMA and pays their grid latch, which capped causal backward at
    47-69%% of the full-mask backward rate (autotune captures); here
    dead (q-tile, kv-tile) pairs never enter the grid.  Interior
    blocks additionally run the recompute UNMASKED (no iota/compare/
    select on the (bq, bkv) tile) — the table's edge flag marks the
    diagonal/window/kv-overhang stragglers.  Reference analogue: loop
    bounds instead of masked full loops (``kernel/Compute.cpp:112-137``).
    """
    if has_segids:
        qseg_ref, kvseg_ref, dq_ref, acc_ref = refs
    else:
        dq_ref, acc_ref = refs
    t = pl.program_id(1)
    i = tab_ref[0, t]
    j = tab_ref[1, t]
    row_start = (t == 0) | (tab_ref[0, jnp.maximum(t - 1, 0)] != i)
    row_end = tab_ref[0, t + 1] != i
    edge = tab_ref[2, t] != 0

    @pl.when(row_start)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def step(mask_block):
        _, ds, kz, _ = _recompute_p_ds(
            qs_ref[0], k_ref[0], v_ref[0], do_ref[0].astype(jnp.float32),
            lse_ref[0], delta_ref[0], j=j, i=i, n_kv_grid=n_kv_grid,
            kv_rem=kv_rem if mask_block else 0,
            block_q=block_q, block_kv=block_kv,
            causal=mask_block, precision=precision, window=window,
            logit_cap=logit_cap,
            qseg=qseg_ref[0] if has_segids else None,
            kvseg=kvseg_ref[0] if has_segids else None,
            scale=scale)
        contrib = jax.lax.dot_general(
            ds.astype(kz.dtype), kz,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if scale != 1.0:
            contrib = contrib * scale
        acc_ref[:] += contrib

    @pl.when(edge)
    def _edge():
        step(True)

    @pl.when(jnp.logical_not(edge))
    def _interior():
        step(False)

    @pl.when(row_end)
    def _store():
        dq_ref[0] = acc_ref[:].astype(out_dtype)


def _flash_bwd_dkv_tri(tab_ref, qs_ref, k_ref, v_ref, do_ref, lse_ref,
                       delta_ref, *refs, n_q_grid, n_kv_grid, q_rem,
                       kv_rem, block_q, block_kv, precision, out_dtype,
                       logit_cap=None, has_segids=False, scale=1.0):
    """Causal (dk, dv) on the flattened live grid (kv-major table):
    kv tile stationary, live q tiles streamed.  Pure causal only (a
    sliding window can leave kv columns with NO live q tile, whose
    dk/dv blocks the table would never visit/zero — those stay on the
    rectangular grid)."""
    if has_segids:
        qseg_ref, kvseg_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    else:
        dk_ref, dv_ref, dk_acc, dv_acc = refs
    t = pl.program_id(1)
    j = tab_ref[0, t]                      # stationary kv tile
    i = tab_ref[1, t]                      # streamed q tile
    col_start = (t == 0) | (tab_ref[0, jnp.maximum(t - 1, 0)] != j)
    col_end = tab_ref[0, t + 1] != j
    edge = tab_ref[2, t] != 0

    @pl.when(col_start)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def step(mask_block):
        qs = qs_ref[0]
        do = do_ref[0].astype(jnp.float32)
        p, ds, _, _ = _recompute_p_ds(
            qs, k_ref[0], v_ref[0], do, lse_ref[0], delta_ref[0],
            j=j, i=i, n_kv_grid=n_kv_grid,
            kv_rem=kv_rem if mask_block else 0,
            block_q=block_q, block_kv=block_kv,
            causal=mask_block, precision=precision,
            logit_cap=logit_cap,
            qseg=qseg_ref[0] if has_segids else None,
            kvseg=kvseg_ref[0] if has_segids else None,
            scale=scale)
        if q_rem:
            # q overhang: the last q tile's stale rows feed the over-q
            # contractions (see the rectangular kernel's rule).
            limit = jnp.where(i == n_q_grid - 1, q_rem, block_q)
            row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
            keep = row < limit
            p = jnp.where(keep, p, 0.0)
            ds = jnp.where(keep, ds, 0.0)
            qs = _zero_rows(qs, limit)
            do = _zero_rows(do, limit)
        dv_c = jax.lax.dot_general(
            p.astype(do_ref.dtype), do.astype(do_ref.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dk_c = jax.lax.dot_general(
            ds.astype(qs.dtype), qs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if scale != 1.0:
            dk_c = dk_c * scale
        dk_acc[:] += dk_c
        dv_acc[:] += dv_c

    @pl.when(edge)
    def _edge():
        step(True)

    @pl.when(jnp.logical_not(edge))
    def _interior():
        step(False)

    @pl.when(col_end)
    def _store():
        dk_ref[0] = dk_acc[:].astype(out_dtype)
        dv_ref[0] = dv_acc[:].astype(out_dtype)


def _bwd_common(q, k, v, cfg, block_q, block_kv):
    bsz, s_q, d = q.shape
    s_kv = k.shape[1]
    group = bsz // k.shape[0]          # GQA head-group factor (1 = MHA)
    block_q = min(block_q, s_q)
    block_kv = min(block_kv, s_kv)
    return bsz, s_q, s_kv, d, block_q, block_kv, group


@functools.partial(jax.jit, static_argnames=(
    "cfg", "causal", "block_q", "block_kv", "interpret", "window",
    "logit_cap", "scale"))
def flash_mha_bwd_dq(qs, k, v, do, lse, delta, q_segment_ids=None,
                     kv_segment_ids=None, offsets=None, *,
                     cfg: GemmConfig,
                     causal=False, block_q=512, block_kv=2048,
                     interpret=False, window=None, logit_cap=None,
                     scale=1.0):
    """dL/dq: grid (batch, q-tiles, kv-tiles), kv streamed.  ``scale``
    must match the forward's in-kernel fold (pass 1.0 when the caller
    pre-scaled q).

    ``q_segment_ids``/``kv_segment_ids`` arrive pre-shaped (B, S_q, 1) /
    (B_kv, 1, S_kv) int32 (the layouts the kernel compares without a
    transpose).  ``offsets`` is the forward's (2,) int32
    (q_offset, kv_offset) absolute-position pair."""
    bsz, s_q, s_kv, d, block_q, block_kv, group = _bwd_common(
        qs, k, v, cfg, block_q, block_kv)
    n_q = pl.cdiv(s_q, block_q)
    n_kv = pl.cdiv(s_kv, block_kv)

    # Static causal: flatten the live (q-tile, kv-tile) pairs into one
    # grid axis (the forward's triangular lever) — dead blocks never
    # DMA or latch.  Offsets make the live set value-dependent and keep
    # the rectangular grid.
    if causal and offsets is None and n_kv > 1:
        tabs = _tri_tables(n_q, n_kv, block_q, block_kv, window,
                           s_kv % block_kv)
        n_t = tabs.shape[1] - 1
        kernel = functools.partial(
            _flash_bwd_dq_tri,
            n_kv_grid=n_kv, kv_rem=s_kv % block_kv,
            block_q=block_q, block_kv=block_kv,
            precision=_resolve_precision(cfg), out_dtype=qs.dtype,
            window=window, logit_cap=logit_cap,
            has_segids=q_segment_ids is not None, scale=scale)
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=cfg.vmem_limit_bytes)
            kwargs["cost_estimate"] = pl.CostEstimate(
                flops=6 * bsz * n_t * block_q * block_kv * d,
                bytes_accessed=(qs.size + k.size + v.size + do.size)
                * qs.dtype.itemsize + qs.size * qs.dtype.itemsize,
                transcendentals=bsz * n_t * block_q * block_kv)
        qi = lambda b, t, tab: (b, tab[0, t], 0)                 # noqa: E731
        kvi = lambda b, t, tab, g=group: (b // g, tab[1, t], 0)  # noqa: E731
        in_specs = [
            pl.BlockSpec((1, block_q, d), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), kvi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), kvi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), qi, memory_space=pltpu.VMEM),
        ]
        operands = [qs, k, v, do, lse, delta]
        if q_segment_ids is not None:
            in_specs.append(pl.BlockSpec((1, block_q, 1), qi,
                                         memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec(
                (1, 1, block_kv),
                lambda b, t, tab, g=group: (b // g, 0, tab[1, t]),
                memory_space=pltpu.VMEM))
            operands.extend((q_segment_ids, kv_segment_ids))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, n_t),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, block_q, d), qi,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype),
            interpret=interpret,
            name=f"flash_bwd_dq_tri_{block_q}x{block_kv}x{d}",
            **kwargs,
        )(jnp.asarray(tabs), *operands)

    kernel = functools.partial(
        _flash_bwd_dq_kernel,
        n_kv_grid=n_kv, kv_rem=s_kv % block_kv,
        block_q=block_q, block_kv=block_kv, causal=causal,
        precision=_resolve_precision(cfg), out_dtype=qs.dtype,
        window=window, logit_cap=logit_cap,
        has_segids=q_segment_ids is not None,
        has_offsets=offsets is not None, scale=scale)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_bytes)
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=6 * bsz * s_q * s_kv * d // (2 if causal else 1),
            bytes_accessed=(qs.size + k.size + v.size + do.size) *
            qs.dtype.itemsize + qs.size * qs.dtype.itemsize,
            transcendentals=bsz * s_q * s_kv)

    qi = lambda b, i, j: (b, i, 0)                 # noqa: E731
    kvi = lambda b, i, j, g=group: (b // g, j, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, block_q, d), qi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d), kvi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d), kvi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, d), qi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 1), qi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 1), qi, memory_space=pltpu.VMEM),
    ]
    operands = [qs, k, v, do, lse, delta]
    if offsets is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(offsets, jnp.int32).reshape(2))
    if q_segment_ids is not None:
        in_specs.append(pl.BlockSpec((1, block_q, 1), qi,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (1, 1, block_kv), lambda b, i, j, g=group: (b // g, 0, j),
            memory_space=pltpu.VMEM))
        operands.extend((q_segment_ids, kv_segment_ids))
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_q, n_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), qi,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
        name=f"flash_bwd_dq_{block_q}x{block_kv}x{d}",
        **kwargs,
    )(*operands)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "causal", "block_q", "block_kv", "interpret", "window",
    "logit_cap", "scale"))
def flash_mha_bwd_dkv(qs, k, v, do, lse, delta, q_segment_ids=None,
                      kv_segment_ids=None, offsets=None, *,
                      cfg: GemmConfig,
                      causal=False, block_q=512, block_kv=2048,
                      interpret=False, window=None, logit_cap=None,
                      scale=1.0):
    """(dL/dk, dL/dv): grid (batch, kv-tiles, q-tiles), q streamed."""
    bsz, s_q, s_kv, d, block_q, block_kv, group = _bwd_common(
        qs, k, v, cfg, block_q, block_kv)
    n_q = pl.cdiv(s_q, block_q)
    n_kv = pl.cdiv(s_kv, block_kv)

    # Static pure-causal: flattened kv-major live grid (see
    # _flash_bwd_dkv_tri).  A window can leave kv columns with no live
    # q tile (their dk/dv must come back zero) — rectangular grid then.
    if causal and offsets is None and window is None and n_q > 1:
        tabs = _tri_tables(n_q, n_kv, block_q, block_kv, None,
                           s_kv % block_kv, order="kvmajor")
        n_t = tabs.shape[1] - 1
        kernel = functools.partial(
            _flash_bwd_dkv_tri,
            n_q_grid=n_q, n_kv_grid=n_kv,
            q_rem=s_q % block_q, kv_rem=s_kv % block_kv,
            block_q=block_q, block_kv=block_kv,
            precision=_resolve_precision(cfg), out_dtype=k.dtype,
            logit_cap=logit_cap,
            has_segids=q_segment_ids is not None, scale=scale)
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=cfg.vmem_limit_bytes)
            kwargs["cost_estimate"] = pl.CostEstimate(
                flops=8 * bsz * n_t * block_q * block_kv * d,
                bytes_accessed=(qs.size + k.size + v.size + do.size)
                * qs.dtype.itemsize + 2 * k.size * k.dtype.itemsize,
                transcendentals=bsz * n_t * block_q * block_kv)
        qi = lambda b, t, tab: (b, tab[1, t], 0)                 # noqa: E731
        kvin = lambda b, t, tab, g=group: (b // g, tab[0, t], 0)  # noqa: E731
        kvout = lambda b, t, tab: (b, tab[0, t], 0)              # noqa: E731
        in_specs = [
            pl.BlockSpec((1, block_q, d), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), kvin, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), kvin, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), qi, memory_space=pltpu.VMEM),
        ]
        operands = [qs, k, v, do, lse, delta]
        if q_segment_ids is not None:
            in_specs.append(pl.BlockSpec((1, block_q, 1), qi,
                                         memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec(
                (1, 1, block_kv),
                lambda b, t, tab, g=group: (b // g, 0, tab[0, t]),
                memory_space=pltpu.VMEM))
            operands.extend((q_segment_ids, kv_segment_ids))
        kv_out_spec = pl.BlockSpec((1, block_kv, d), kvout,
                                   memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, n_t),
            in_specs=in_specs,
            out_specs=(kv_out_spec, kv_out_spec),
            scratch_shapes=[pltpu.VMEM((block_kv, d), jnp.float32),
                            pltpu.VMEM((block_kv, d), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((bsz, s_kv, d), k.dtype),
                       jax.ShapeDtypeStruct((bsz, s_kv, d), v.dtype)),
            interpret=interpret,
            name=f"flash_bwd_dkv_tri_{block_q}x{block_kv}x{d}",
            **kwargs,
        )(jnp.asarray(tabs), *operands)

    kernel = functools.partial(
        _flash_bwd_dkv_kernel,
        n_q_grid=n_q, n_kv_grid=n_kv,
        q_rem=s_q % block_q, kv_rem=s_kv % block_kv,
        block_q=block_q, block_kv=block_kv, causal=causal,
        precision=_resolve_precision(cfg), out_dtype=k.dtype,
        window=window, logit_cap=logit_cap,
        has_segids=q_segment_ids is not None,
        has_offsets=offsets is not None, scale=scale)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_bytes)
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=10 * bsz * s_q * s_kv * d // (2 if causal else 1),
            bytes_accessed=(qs.size + k.size + v.size + do.size) *
            qs.dtype.itemsize + 2 * k.size * k.dtype.itemsize,
            transcendentals=bsz * s_q * s_kv)

    qi = lambda b, j, i: (b, i, 0)                    # noqa: E731
    kv_in = lambda b, j, i, g=group: (b // g, j, 0)   # noqa: E731
    kv_out = lambda b, j, i: (b, j, 0)                # noqa: E731
    kv_in_spec = pl.BlockSpec((1, block_kv, d), kv_in,
                              memory_space=pltpu.VMEM)
    kv_out_spec = pl.BlockSpec((1, block_kv, d), kv_out,
                               memory_space=pltpu.VMEM)
    # dk/dv come back per q-head (bsz rows); for GQA the caller sums each
    # group of `group` rows down to the kv heads (in XLA, one reshape+sum).
    in_specs = [
        pl.BlockSpec((1, block_q, d), qi, memory_space=pltpu.VMEM),
        kv_in_spec,
        kv_in_spec,
        pl.BlockSpec((1, block_q, d), qi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 1), qi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 1), qi, memory_space=pltpu.VMEM),
    ]
    operands = [qs, k, v, do, lse, delta]
    if offsets is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(offsets, jnp.int32).reshape(2))
    if q_segment_ids is not None:
        in_specs.append(pl.BlockSpec((1, block_q, 1), qi,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (1, 1, block_kv), lambda b, j, i, g=group: (b // g, 0, j),
            memory_space=pltpu.VMEM))
        operands.extend((q_segment_ids, kv_segment_ids))
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_kv, n_q),
        in_specs=in_specs,
        out_specs=(kv_out_spec, kv_out_spec),
        out_shape=(jax.ShapeDtypeStruct((bsz, s_kv, d), k.dtype),
                   jax.ShapeDtypeStruct((bsz, s_kv, d), v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_kv, d), jnp.float32),
                        pltpu.VMEM((block_kv, d), jnp.float32)],
        interpret=interpret,
        name=f"flash_bwd_dkv_{block_q}x{block_kv}x{d}",
        **kwargs,
    )(*operands)


# ---------------------------------------------------------------------------
# Differentiable front: custom VJP over the pre-scaled operands.  The
# scale fold (qs = q * scale) lives OUTSIDE this boundary, so plain
# autodiff routes d(qs) -> dq = d(qs) * scale for free.
# ---------------------------------------------------------------------------


def _seg3(q_seg, kv_seg):
    """Raw (B, S) int segment ids -> the kernel layouts."""
    if q_seg is None:
        return None, None
    return (q_seg.astype(jnp.int32)[..., None],
            kv_seg.astype(jnp.int32)[:, None, :])


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
                                    16))
def flash_mha_diff(qs, k, v, q_seg, kv_seg, cfg: GemmConfig, causal,
                   block_q, block_kv, interpret, window=None,
                   logit_cap=None, block_kv_compute=None,
                   block_q_compute=None, bwd_block_q=None,
                   bwd_block_kv=None, scale=1.0):
    return flash_mha(qs, k, v, None, q_seg, kv_seg, cfg=cfg,
                     causal=causal, block_q=block_q,
                     block_kv=block_kv,
                     block_kv_compute=block_kv_compute,
                     block_q_compute=block_q_compute,
                     interpret=interpret,
                     window=window, logit_cap=logit_cap, scale=scale)


def _flash_diff_fwd(qs, k, v, q_seg, kv_seg, cfg, causal, block_q,
                    block_kv, interpret, window=None, logit_cap=None,
                    block_kv_compute=None, block_q_compute=None,
                    bwd_block_q=None, bwd_block_kv=None, scale=1.0):
    o, lse = flash_mha(qs, k, v, None, q_seg, kv_seg, cfg=cfg,
                       causal=causal, block_q=block_q,
                       block_kv=block_kv,
                       block_kv_compute=block_kv_compute,
                       block_q_compute=block_q_compute,
                       interpret=interpret,
                       window=window, logit_cap=logit_cap, save_lse=True,
                       scale=scale)
    return o, (qs, k, v, o, lse, q_seg, kv_seg)


def _flash_diff_bwd(cfg, causal, block_q, block_kv, interpret, window,
                    logit_cap, block_kv_compute, block_q_compute,
                    bwd_block_q, bwd_block_kv, scale, res, do):
    qs, k, v, o, lse, q_seg, kv_seg = res
    # The backward kernels have their own block optima (dq streams KV
    # with a (block_q, d) accumulator; dkv streams Q with (block_kv, d)
    # accumulators) — autotuned separately from the forward blocks.
    block_q = bwd_block_q or block_q
    block_kv = bwd_block_kv or block_kv
    qseg3, kvseg3 = _seg3(q_seg, kv_seg)
    # Softmax-Jacobian row term Δ = Σ_d do ⊙ o, in f32 (one cheap
    # elementwise pass XLA fuses; the kernels read it per q-row).
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    do_c = do.astype(qs.dtype)
    dqs = flash_mha_bwd_dq(qs, k, v, do_c, lse, delta, qseg3, kvseg3,
                           cfg=cfg, causal=causal, block_q=block_q,
                           block_kv=block_kv, interpret=interpret,
                           window=window, logit_cap=logit_cap,
                           scale=scale)
    dk, dv = flash_mha_bwd_dkv(qs, k, v, do_c, lse, delta, qseg3, kvseg3,
                               cfg=cfg, causal=causal, block_q=block_q,
                               block_kv=block_kv, interpret=interpret,
                               window=window, logit_cap=logit_cap,
                               scale=scale)
    group = qs.shape[0] // k.shape[0]
    if group > 1:
        # GQA: the dkv kernel emits per-q-head tiles; fold each group of
        # q heads onto its shared kv head (accumulate in f32).
        dk = dk.astype(jnp.float32).reshape(
            k.shape[0], group, *k.shape[1:]).sum(axis=1).astype(k.dtype)
        dv = dv.astype(jnp.float32).reshape(
            v.shape[0], group, *v.shape[1:]).sum(axis=1).astype(v.dtype)
    # Integer segment-id inputs take float0 cotangents.
    import numpy as _np

    ct_seg = (None if q_seg is None else
              _np.zeros(q_seg.shape, jax.dtypes.float0))
    ct_kvseg = (None if kv_seg is None else
                _np.zeros(kv_seg.shape, jax.dtypes.float0))
    return dqs, dk, dv, ct_seg, ct_kvseg


flash_mha_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)
