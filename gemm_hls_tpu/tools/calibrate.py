"""First-run self-calibration for chips without packaged constants.

The reference re-derives per-platform clocks from ``platforminfo`` at
configure time (``/root/reference/CMakeLists.txt:114-133``) so a new FPGA
part works without hand-edited constants.  The TPU analogue: the perf
model's chip table (``models/perf_model.py``) carries datasheet rooflines
plus one *measured* constant — the per-grid-step scheduling latch — and
the autotune seed ships measured winners, but both exist only for the
generations we have touched.  On an unknown ``device_kind`` this module
runs a ~60 s micro-calibration and persists it, so v5p/v6e/v7-whatever
support is not blocked on someone re-running the v5e methodology by hand:

1. **Engine-rate probe**: one large bf16 GEMM (winner blocks) → the
   sustained MXU rate, scaling the datasheet-shaped roofline.
2. **Latch probe**: the same total work at two grid densities; the time
   difference per added grid step fits ``grid_step_overhead_s`` (the
   two-point slope cancels the roofline terms exactly).
3. **Block probe**: 4 candidate block configs at 4096³ seed the autotune
   cache for this chip (``tools/autotune.py`` consults it on dispatch).

Results persist to ``~/.cache/gemm_hls_tpu/calibration.json``;
``models/perf_model.detect_chip`` consults that file for unknown kinds.

CLI:
    python -m gemm_hls_tpu.tools.calibrate [--force]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

CALIBRATION_CACHE = os.path.expanduser(
    "~/.cache/gemm_hls_tpu/calibration.json")


def fit_latch(t_sparse: float, steps_sparse: int, t_dense: float,
              steps_dense: int) -> float:
    """Per-grid-step latch from two timings of the *same total work* at
    different grid densities: the roofline terms cancel in the
    difference, leaving (extra steps) x latch."""
    if steps_dense <= steps_sparse:
        raise ValueError("dense probe must have more grid steps")
    return max(0.0, (t_dense - t_sparse) / (steps_dense - steps_sparse))


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _store(path: str, data: dict):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_calibration(kind: str, cache_path: str = None) -> dict | None:
    """The persisted calibration entry for a device kind, or None."""
    return _load(cache_path or CALIBRATION_CACHE).get(kind.lower())


def run_calibration(*, cache_path: str = None, force: bool = False,
                    n_probe: int = 2048, verbose: bool = False) -> dict:
    """Measure and persist this chip's calibration entry.

    Returns the entry: ``{measured_bf16_flops, grid_step_overhead_s,
    timestamp}``.  Also seeds the autotune cache with the best of 4 block
    configs at (n_probe*2)³.
    """
    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu.config import GemmConfig
    from gemm_hls_tpu.ops import pallas_mxu
    from gemm_hls_tpu.utils.benchmark import time_fn

    cache_path = cache_path or CALIBRATION_CACHE
    kind = jax.devices()[0].device_kind.lower()
    cache = _load(cache_path)
    if kind in cache and not force:
        return cache[kind]

    interpret = jax.default_backend() != "tpu"
    ka, kb = jax.random.split(jax.random.PRNGKey(5))
    n = n_probe
    a = jax.random.uniform(ka, (n, n), jnp.bfloat16, 1, 10)
    b = jax.random.uniform(kb, (n, n), jnp.bfloat16, 1, 10)
    jax.block_until_ready((a, b))
    flops = 2.0 * n * n * n

    def run_cfg(bm, bn, bk, iters=8):
        cfg = GemmConfig(dtype="bfloat16", out_dtype="bfloat16",
                         block_m=bm, block_n=bn, block_k=bk,
                         interpret=interpret)
        f = jax.jit(lambda x, y: pallas_mxu.mxu_matmul(
            x, y, cfg=cfg, interpret=interpret))
        secs = min(time_fn(f, [(a, b)], iters=iters, warmup=1)
                   for _ in range(2))
        return secs

    # 1) engine rate: full-K-stream winner shape.
    t_fast = run_cfg(512, 1024, n)
    measured = flops / t_fast
    if verbose:
        print(f"engine probe: {measured / 1e12:.1f} TF sustained bf16")

    # 2) latch: same work, sparse vs dense grids (block sizes scale with
    # the probe size so tiny CPU-test probes still produce valid grids).
    bm_s = bn_s = min(512, n // 2)
    steps_sparse = (n // bm_s) * (n // bn_s) * (n // n)
    t_sparse = run_cfg(bm_s, bn_s, n)
    bm_d = bn_d = bk_d = min(256, n // 8)
    steps_dense = (n // bm_d) * (n // bn_d) * (n // bk_d)
    t_dense = run_cfg(bm_d, bn_d, bk_d)
    latch = fit_latch(t_sparse, steps_sparse, t_dense, steps_dense)
    if verbose:
        print(f"latch probe: {latch * 1e9:.0f} ns/grid-step "
              f"({steps_sparse} vs {steps_dense} steps)")

    entry = {
        "measured_bf16_flops": measured,
        "grid_step_overhead_s": latch,
        "timestamp": time.time(),
    }
    cache[kind] = entry
    _store(cache_path, cache)

    # 3) autotune seed for the front door (best of 4 configs at 4096³ is
    # autotune's own job — delegate so winners land in its cache format).
    try:
        from gemm_hls_tpu.tools.autotune import autotune
        autotune(2 * n, 2 * n, 2 * n, dtype="bfloat16", rounds=1)
    except Exception as e:  # noqa: BLE001 — seed is best-effort
        if verbose:
            print(f"autotune seeding skipped: {e}")
    return entry


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--force", action="store_true",
                   help="re-measure even if a calibration exists")
    p.add_argument("--cache", default=CALIBRATION_CACHE)
    args = p.parse_args(argv)
    e = run_calibration(cache_path=args.cache, force=args.force,
                        verbose=True)
    print(f"calibrated: {e['measured_bf16_flops'] / 1e12:.1f} TF bf16, "
          f"latch {e['grid_step_overhead_s'] * 1e9:.0f} ns")


if __name__ == "__main__":
    main()
