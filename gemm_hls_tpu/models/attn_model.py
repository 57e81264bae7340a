"""Analytical runtime model for the flash-attention kernel.

The ``PrintSpecifications`` analogue (``src/PrintSpecifications.cpp:45-78``)
for the attention workload: closed-form legs for the two MXU contractions,
the VPU softmax, HBM traffic, and the per-grid-step latch, combined with
the same serial-plus-roofline structure as the GEMM model
(``models/perf_model.specifications``).

Leg derivation (per (b, i) q-tile, summed over the grid):

* **MXU**: ``4·B·Sq·Skv·D`` FLOPs (scores + PV), halved at block
  granularity under causal skipping (a q tile of index i runs
  ``ceil((i+1)·bq / bkv)`` of the ``n_kv`` steps).
* **VPU**: the softmax chain costs ~``K_SOFTMAX`` elementwise-op slots
  per score element (exp ≈ several slots on the transcendental path,
  plus the max/sum fold trees and the p-cast).  Calibrated against the
  two committed capture families (docs/BENCHMARKS.md, round-5 kernels
  with the in-kernel scale fold): the S=1024 single-kv-block shape
  implies ~1.6 slots, the S=8192 streaming shape ~2.0; the shipped 1.8
  puts both within ±2% of measured.  (The pre-round-5 value 5.5 was
  absorbing the since-removed external q·scale HBM pass — Mosaic
  overlaps most of the true softmax chain against the MXU dots.)
* **HBM**: Q, K, V read once, O written once — the O(S·D) traffic that
  defines flash attention; the probability matrix never contributes.
* **Latch**: one Mosaic scheduling latch per grid step
  (``ChipSpec.grid_step_overhead_s``), the measured term carried over
  from the GEMM model.

The MXU and VPU legs serialize within a step (scores → softmax → PV is
a data dependency) but the model lets HBM overlap fully — consistent
with the measured single-block captures (±15%); the streaming-carry
regime at short sequences (bkv ≪ S_kv with few kv steps) runs below
this model (see docs/BENCHMARKS.md block-sweep notes) and is *not* the
recommended configuration there.
"""

from __future__ import annotations

import math
from typing import Optional

from gemm_hls_tpu.models.perf_model import ChipSpec, detect_chip

# VPU elementwise-op slots consumed per score element by the softmax
# chain (exp + max/sum folds + rescale + cast) BEYOND what Mosaic
# overlaps against the MXU dots, calibrated on v5e (round-5 kernels).
K_SOFTMAX = 1.8

# Same convention for the two backward kernels' recompute chains
# (exp + the ds = p∘(dp−δ) arithmetic + operand casts), calibrated on
# the round-5 v5e captures (artifacts/flash_bwd_v5e.csv): the dq kernel
# overlaps nearly all of it against its 3 dots; the dkv kernel pays
# more VPU (the p→bf16 cast feeding the dv dot and the ds^T staging
# both sit on the store path of its 4 dots).
K_SOFTMAX_DQ = 0.3
K_SOFTMAX_DKV = 2.0


def attention_specifications(
        batch: int, s_q: int, s_kv: int, d: int, *,
        causal: bool = False, window: Optional[int] = None,
        dtype: str = "bfloat16", block_q: int = 512,
        block_kv: int = 2048, chip: Optional[ChipSpec] = None) -> dict:
    """Closed-form expectations for one flash-attention problem.

    Returns a dict shaped like ``perf_model.specifications``: the leg
    times, expected runtime / TFLOP/s, and which resource bounds the
    kernel.  FLOPs are counted as ``4·B·Sq·Skv·D`` scaled by the
    *unmasked fraction* (the convention of docs/BENCHMARKS.md and
    ``experiments/flash_bench.py``).
    """
    import jax.numpy as jnp

    chip = chip or detect_chip()
    block_q = min(block_q, s_q)
    block_kv = min(block_kv, s_kv)
    n_q = math.ceil(s_q / block_q)
    n_kv = math.ceil(s_kv / block_kv)

    # Live kv steps per q tile under block-granular skipping.
    if causal:
        live_steps = sum(
            max(0, min(n_kv, math.ceil(min((i + 1) * block_q, s_kv)
                                       / block_kv))
                - (0 if window is None else
                   max(0, (i * block_q - window + 1) // block_kv)))
            for i in range(n_q))
    else:
        live_steps = n_q * n_kv
    total_steps = batch * n_q * n_kv          # skipped steps still latch
    live_frac = live_steps / (n_q * n_kv)

    flops_full = 4 * batch * s_q * s_kv * d
    flops_live = flops_full * live_frac
    scores_live = batch * s_q * s_kv * live_frac

    in_b = jnp.dtype(dtype).itemsize
    hbm_bytes = (batch * s_q * d + 2 * batch * s_kv * d) * in_b \
        + batch * s_q * d * in_b              # O written once
    mxu_rate = chip.peak_for(dtype)

    t_mxu = flops_live / mxu_rate
    t_vpu = scores_live * K_SOFTMAX / chip.vpu_ops
    t_hbm = hbm_bytes / chip.hbm_bandwidth
    t_latch = total_steps * chip.grid_step_overhead_s
    t_expected = max(t_mxu + t_vpu, t_hbm) + t_latch

    # What the unmasked fraction makes "effective" throughput: callers
    # quote flops_effective / t (matching the bench convention where
    # causal halves the counted FLOPs).
    flops_counted = flops_full / (2 if causal else 1)
    return {
        "chip": chip.name,
        "problem": (batch, s_q, s_kv, d),
        "blocks": (block_q, block_kv),
        "grid": (batch, n_q, n_kv),
        "causal": causal,
        "window": window,
        "live_fraction": live_frac,
        "flops": flops_counted,
        "mxu_s": t_mxu,
        "vpu_softmax_s": t_vpu,
        "hbm_s": t_hbm,
        "latch_s": t_latch,
        "expected_runtime_s": t_expected,
        "expected_tflops": flops_counted / t_expected / 1e12,
        "bound": ("latch" if t_latch > max(t_mxu + t_vpu, t_hbm) else
                  "memory" if t_hbm > t_mxu + t_vpu else
                  "vpu" if t_vpu > t_mxu else "mxu"),
        "probability_bytes_saved": 2 * batch * s_q * s_kv * in_b,
    }


def attention_bwd_specifications(
        batch: int, s_q: int, s_kv: int, d: int, *, kernel: str = "dq",
        causal: bool = False, dtype: str = "bfloat16",
        block_q: int = 512, block_kv: int = 2048,
        chip: Optional[ChipSpec] = None) -> dict:
    """Closed-form legs for one flash BACKWARD kernel (``dq`` or ``dkv``).

    The ``PrintSpecifications`` expected-vs-ideal treatment
    (``src/PrintSpecifications.cpp:45-60``) applied to the gradient
    kernels: ``dq`` recomputes scores, forms ds, and contracts ds·k —
    3 MXU contractions over the live score area; ``dkv`` recomputes
    p and ds and contracts p^T·do and ds^T·q — 4.  TF-eff quoted by
    the bench (``experiments/flash_bwd_bench.py``) is
    ``n_contractions · live-area-FLOPs / t``, so ``expected_tflops``
    here is directly comparable.  Causal uses the flattened live-block
    tables (``ops/pallas_flash._tri_tables``), so dead blocks
    contribute neither MXU time nor grid latch.
    """
    import jax.numpy as jnp

    chip = chip or detect_chip()
    block_q = min(block_q, s_q)
    block_kv = min(block_kv, s_kv)
    n_q = math.ceil(s_q / block_q)
    n_kv = math.ceil(s_kv / block_kv)
    if kernel not in ("dq", "dkv"):
        raise ValueError(f"kernel must be dq|dkv, got {kernel!r}")
    n_con = 3 if kernel == "dq" else 4
    k_vpu = K_SOFTMAX_DQ if kernel == "dq" else K_SOFTMAX_DKV

    if causal:
        live_steps = sum(
            max(0, min(n_kv, math.ceil(min((i + 1) * block_q, s_kv)
                                       / block_kv)))
            for i in range(n_q))
    else:
        live_steps = n_q * n_kv
    live_frac = live_steps / (n_q * n_kv)
    total_steps = batch * live_steps          # tri grid: only live latch

    area = 2.0 * batch * s_q * s_kv * d
    flops_live = n_con * area * live_frac
    scores_live = batch * s_q * s_kv * live_frac

    in_b = jnp.dtype(dtype).itemsize
    reads = (2 * batch * s_q * d + 2 * batch * s_kv * d) * in_b \
        + 2 * batch * s_q * 4                 # q,do + k,v + lse,delta(f32)
    writes = (batch * s_q * d if kernel == "dq"
              else 2 * batch * s_kv * d) * in_b
    hbm_bytes = reads + writes
    mxu_rate = chip.peak_for(dtype)

    t_mxu = flops_live / mxu_rate
    t_vpu = scores_live * k_vpu / chip.vpu_ops
    t_hbm = hbm_bytes / chip.hbm_bandwidth
    t_latch = total_steps * chip.grid_step_overhead_s
    t_expected = max(t_mxu + t_vpu, t_hbm) + t_latch

    flops_counted = n_con * area / (2 if causal else 1)
    return {
        "chip": chip.name,
        "problem": (batch, s_q, s_kv, d),
        "kernel": kernel,
        "contractions": n_con,
        "blocks": (block_q, block_kv),
        "causal": causal,
        "live_fraction": live_frac,
        "flops": flops_counted,
        "mxu_s": t_mxu,
        "vpu_recompute_s": t_vpu,
        "hbm_s": t_hbm,
        "latch_s": t_latch,
        "expected_runtime_s": t_expected,
        "expected_tflops": flops_counted / t_expected / 1e12,
        "bound": ("latch" if t_latch > max(t_mxu + t_vpu, t_hbm) else
                  "memory" if t_hbm > t_mxu + t_vpu else
                  "vpu" if t_vpu > t_mxu else "mxu"),
    }
