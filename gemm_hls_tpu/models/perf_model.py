"""Analytical performance model — the ``PrintSpecifications`` port.

Re-implements the reference's closed-form expectations
(``src/PrintSpecifications.cpp``):

* expected runtime including non-overlapped overheads (:45-50),
* ideal runtime / peak performance and %-of-ideal (:51-60),
* tile census (:63-71),
* communication volume and I/O access fraction (:72-78),

re-derived for the TPU roofline: peak = MXU FLOP rate per dtype (the
``2 * PN * PM * f`` formula's analogue, reference ``README.md:62-64``),
memory bound = CA I/O volume / HBM bandwidth, expected time =
max(compute, memory) per the roofline model, plus a VPU roofline for
non-arithmetic semirings.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gemm_hls_tpu.config import GemmConfig


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """One TPU generation's roofline constants (per chip).

    ``peak_flops`` maps dtype name -> peak FLOP/s on the MXU;
    ``vpu_ops`` is the peak elementwise op rate (ops/s) for the VPU path.
    """

    name: str
    peak_flops: Dict[str, float]
    hbm_bandwidth: float          # bytes/s
    vmem_bytes: int               # per core
    vpu_ops: float                # elementwise ops/s
    ici_bandwidth: float = 0.0    # bytes/s per link, one direction
    ici_links: int = 0
    clock_hz: float = 940e6
    tdp_watts: float = 0.0        # chip TDP, for GOp/J estimates
    # Per-grid-step scheduling/latch overhead of the Mosaic pipeline —
    # the device-specific constant of the refined runtime model (the
    # reference's analogue is the clock frequency fed to
    # PrintSpecifications).  Calibrated on v5e against
    # artifacts/sweep_v5e_bf16_4096_r2.csv (220 ns brings all 12 configs
    # within +-14%); other generations inherit the value uncalibrated.
    grid_step_overhead_s: float = 2.2e-7

    def peak_for(self, dtype) -> float:
        d = str(jnp.dtype(dtype))
        if d in self.peak_flops:
            return self.peak_flops[d]
        if d == "float16":
            return self.peak_flops.get("bfloat16", 0.0)
        if d in ("int8", "uint8"):
            return self.peak_flops.get("int8", 0.0)
        if d == "float64":
            # f64 is software-emulated on TPU; rough 1/8 of fp32.
            return self.peak_flops.get("float32", 0.0) / 8
        return self.peak_flops.get("float32", 0.0)


# Public roofline constants per generation (datasheet values).
_CHIPS: Dict[str, ChipSpec] = {}


def _register(c: ChipSpec):
    _CHIPS[c.name] = c
    return c


_register(ChipSpec(
    name="v5e",
    tdp_watts=200.0,
    peak_flops={"bfloat16": 197e12, "float32": 197e12 / 4, "int8": 394e12},
    hbm_bandwidth=819e9,
    vmem_bytes=128 * 1024 * 1024,
    # Derived (not self-measured) VPU bound: 4 ALU ports x (8 sublanes x
    # 128 lanes) x clock.  The clock itself is derived from the published
    # MXU peak: 197e12 bf16 FLOP/s / (4 MXUs * 128*128 MACs * 2) =
    # 1.503 GHz, giving 4*8*128*1.503e9 = 6.16e12 elementwise ops/s.
    # A (map, reduce) semiring costs 2 VPU ops per contraction triple, so
    # the model's GOp/s ceiling (counting 2*M*N*K "ops" like the MXU path)
    # equals vpu_ops.  Measured min_plus sustains ~4.3e12 (~70% of this
    # bound; docs/BENCHMARKS.md discusses the gap).
    vpu_ops=4 * 8 * 128 * 1.503e9,
    ici_bandwidth=186e9 / 4,       # 4 links
    ici_links=4,
    clock_hz=1.503e9,
))

_register(ChipSpec(
    name="v5p",
    tdp_watts=400.0,
    peak_flops={"bfloat16": 459e12, "float32": 459e12 / 4, "int8": 918e12},
    hbm_bandwidth=2765e9,
    vmem_bytes=128 * 1024 * 1024,
    vpu_ops=4 * 8 * 128 * 1750e6,
    ici_bandwidth=600e9 / 6,
    ici_links=6,
    clock_hz=1750e6,
))

_register(ChipSpec(
    name="v4",
    tdp_watts=220.0,
    peak_flops={"bfloat16": 275e12, "float32": 275e12 / 4, "int8": 275e12},
    hbm_bandwidth=1228e9,
    vmem_bytes=128 * 1024 * 1024,
    vpu_ops=4 * 8 * 128 * 1050e6,
    ici_bandwidth=300e9 / 6,
    ici_links=6,
    clock_hz=1050e6,
))

_register(ChipSpec(
    name="v6e",
    tdp_watts=300.0,
    peak_flops={"bfloat16": 918e12, "float32": 918e12 / 4, "int8": 1836e12},
    hbm_bandwidth=1640e9,
    vmem_bytes=128 * 1024 * 1024,
    vpu_ops=4 * 8 * 128 * 1700e6,
    ici_bandwidth=448e9 / 4,
    ici_links=4,
))

# CPU fallback for the software-simulation path (rough laptop-class numbers;
# only used so the model stays runnable off-TPU).
_register(ChipSpec(
    name="cpu",
    tdp_watts=65.0,
    peak_flops={"bfloat16": 2e11, "float32": 2e11, "int8": 4e11},
    hbm_bandwidth=50e9,
    vmem_bytes=32 * 1024 * 1024,
    vpu_ops=1e11,
))


def get_chip(name: str) -> ChipSpec:
    try:
        return _CHIPS[name]
    except KeyError:
        raise KeyError(f"unknown chip {name!r}; available: {sorted(_CHIPS)}") from None


def available_chips():
    return sorted(_CHIPS)


def _calibrated_spec(kind: str) -> Optional[ChipSpec]:
    """ChipSpec for an unknown generation, built from a persisted
    self-calibration (``tools/calibrate.py``): the datasheet-shaped v5e
    roofline rescaled to the measured engine rate, with the measured
    per-grid-step latch.  Returns None when no calibration exists."""
    from gemm_hls_tpu.tools.calibrate import load_calibration

    e = load_calibration(kind)
    if not e:
        return None
    base = _CHIPS["v5e"]
    scale = e["measured_bf16_flops"] / base.peak_flops["bfloat16"]
    return dataclasses.replace(
        base,
        name=kind,
        peak_flops={d: p * scale for d, p in base.peak_flops.items()},
        vpu_ops=base.vpu_ops * scale,
        grid_step_overhead_s=e["grid_step_overhead_s"],
    )


def detect_chip() -> ChipSpec:
    """Best-effort detection of the local accelerator generation.

    Unknown ``device_kind``s consult the self-calibration cache
    (reference analogue: per-platform clock query,
    ``CMakeLists.txt:114-133``); without one, the v5e constants are used
    and a warning points at ``python -m gemm_hls_tpu.tools.calibrate``.
    """
    if jax.default_backend() != "tpu":
        return _CHIPS["cpu"]
    kind = jax.devices()[0].device_kind.lower()
    for name in ("v6e", "v5p", "v5e", "v4"):
        if name in kind:
            return _CHIPS[name]
    if "v5 lite" in kind or "v5lite" in kind:
        return _CHIPS["v5e"]
    if "v6 lite" in kind or "v6lite" in kind:
        return _CHIPS["v6e"]
    cal = _calibrated_spec(kind)
    if cal is not None:
        return cal
    import warnings

    warnings.warn(
        f"unknown TPU generation {kind!r}: using v5e roofline constants; "
        "run `python -m gemm_hls_tpu.tools.calibrate` for a 60 s "
        "self-calibration (engine rate + grid-step latch + autotune seed)",
        stacklevel=2)
    return _CHIPS["v5e"]


def specifications(cfg: GemmConfig, m: int, n: int, k: int,
                   chip: Optional[ChipSpec] = None,
                   semiring_is_mxu: bool = True) -> dict:
    """Closed-form expectations for one (config, problem, chip) triple.

    The TPU port of ``PrintSpecifications`` (``src/PrintSpecifications.cpp``):
    returns peak/expected performance, runtime, tile census, communication
    volume, and I/O fraction.
    """
    chip = chip or detect_chip()
    flops = cfg.flops(m, n, k)
    # The schedule-law volume (io_volume_bytes) is what the reference's
    # comm-volume printout reports; the runtime estimate uses the
    # Mosaic-reuse-refined traffic (A not re-fetched across the j sweep
    # when K fits one block) — measured: full-K-stream configs otherwise
    # model up to ~26% too slow.
    io_bytes = cfg.hbm_traffic_bytes(m, n, k)
    peak = chip.peak_for(cfg.dtype) if semiring_is_mxu else chip.vpu_ops

    t_compute = flops / peak
    t_memory = io_bytes / chip.hbm_bandwidth
    gm, gn, gk = cfg.grid(m, n, k)
    # Non-overlapped terms beyond the pure roofline — the analogue of the
    # reference's C-writeback drain model (PrintSpecifications.cpp:45-50):
    # the pipeline prologue (first A/B block fill, paid before the MXU can
    # start), the final C-tile drain, and a per-grid-step scheduling latch.
    in_b = jnp.dtype(cfg.dtype).itemsize
    out_b = jnp.dtype(cfg.jout_dtype).itemsize
    t_prologue = ((cfg.block_m * cfg.block_k + cfg.block_k * cfg.block_n)
                  * in_b / chip.hbm_bandwidth)
    t_drain = cfg.block_m * cfg.block_n * out_b / chip.hbm_bandwidth
    t_steps = gm * gn * gk * chip.grid_step_overhead_s
    # Prologue/drain extend the COMPUTE leg only (their bytes are already
    # part of io_bytes, so adding them to a memory-bound estimate would
    # double-count that traffic).
    t_expected = max(t_compute + t_prologue + t_drain, t_memory) + t_steps

    total_elems = m * k + k * n + m * n
    return {
        "chip": chip.name,
        "dtype": cfg.dtype,
        "problem": (m, n, k),
        "blocks": (cfg.block_m, cfg.block_n, cfg.block_k),
        "grid": (gm, gn, gk),
        "num_output_tiles": gm * gn,                    # "memory tiles" census
        "num_k_steps": gk,
        "flops": flops,
        "peak_flops": peak,
        "ideal_runtime_s": t_compute,                   # PrintSpecifications:51-54
        "expected_runtime_s": t_expected,               # :45-50 analogue
        "prologue_s": t_prologue,
        "drain_s": t_drain,
        "step_overhead_s": t_steps,
        "expected_gflops": flops / t_expected / 1e9,
        "percent_of_peak": 100.0 * t_compute / t_expected,  # :57-60
        "io_volume_words": cfg.io_volume_words(m, n, k),    # :72-75
        "io_volume_bytes": io_bytes,
        "io_fraction": cfg.io_volume_words(m, n, k) / total_elems,  # :76-78
        "arithmetic_intensity": flops / io_bytes,
        "ridge_intensity": peak / chip.hbm_bandwidth,
        "bound": "compute" if t_compute >= t_memory else "memory",
        "vmem_bytes": cfg.vmem_bytes(),
        "vmem_budget": chip.vmem_bytes,
    }


def format_specifications(spec: dict) -> str:
    """Human-readable report, mirroring the reference CLI's printout."""
    m, n, k = spec["problem"]
    lines = [
        f"Problem: C[{m},{n}] = A[{m},{k}] . B[{k},{n}]  ({spec['dtype']}, {spec['chip']})",
        f"Blocks (outer/memory tiles): {spec['blocks']}  grid {spec['grid']}"
        f"  -> {spec['num_output_tiles']} output tiles x {spec['num_k_steps']} K-steps",
        f"Total ops: {spec['flops']:.4g}  (2*M*N*K)",
        f"Peak performance: {spec['peak_flops'] / 1e9:.1f} GOp/s",
        f"Ideal runtime: {spec['ideal_runtime_s'] * 1e3:.3f} ms",
        f"Expected runtime (roofline + overheads): "
        f"{spec['expected_runtime_s'] * 1e3:.3f} ms  [{spec['bound']}-bound]",
        f"  non-overlapped: prologue {spec['prologue_s'] * 1e6:.1f} us, "
        f"drain {spec['drain_s'] * 1e6:.1f} us, "
        f"grid-step latch {spec['step_overhead_s'] * 1e6:.1f} us",
        f"Expected performance: {spec['expected_gflops']:.1f} GOp/s"
        f" ({spec['percent_of_peak']:.1f}% of peak)",
        f"Communication volume: {spec['io_volume_words']:.4g} words"
        f" ({spec['io_volume_bytes'] / 1e9:.3f} GB)",
        f"I/O fraction (vs single-read/write minimum): {spec['io_fraction']:.2f}x",
        f"Arithmetic intensity: {spec['arithmetic_intensity']:.1f} op/B"
        f" (ridge {spec['ridge_intensity']:.1f})",
        f"VMEM footprint: {spec['vmem_bytes'] / 1e6:.1f} MB"
        f" of {spec['vmem_budget'] / 1e6:.0f} MB",
    ]
    return "\n".join(lines)
