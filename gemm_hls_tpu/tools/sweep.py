"""Configuration sweep manager — the ``build_manager.py`` port.

The reference scans cartesian products of CMake configurations, classifies
per-config hardware build outcomes by regexing Vivado logs (feasibility /
placement / routing / hold / timing / crash,
``scripts/build_manager.py:351-396``), benchmarks survivors with
timeout-and-retry (:611-669), and extracts results to CSV (:578-608).

TPU translation: a "build" is an XLA/Mosaic compile of one
:class:`GemmConfig` specialization, the failure taxonomy maps to

* ``invalid_config``   — eager validation rejected it (CMake fatal error),
* ``vmem_overflow``    — Mosaic/XLA RESOURCE_EXHAUSTED (placement failure),
* ``compile_failed``   — Mosaic/lowering error (synthesis crash),
* ``wrong_result``     — verification mismatch (hardware validation failure),
* ``crashed``          — anything else,
* ``ok``               — benchmarked, with seconds + GOp/s,

and results serialize to the same kind of CSV.

CLI:
    python -m gemm_hls_tpu.tools.sweep --m 2048 --n 2048 --k 2048 \
        --dtype float32 --block-m 256,512 --block-n 256,512 --block-k 256,512
    # config products (dtype x semiring x precision), like the reference's
    # cartesian CMake option scan (build_manager.py:417-431):
    python -m gemm_hls_tpu.tools.sweep --m 2048 --n 2048 --k 2048 \
        --dtype bfloat16,float32 --semiring plus_times,min_plus
    # merge result CSVs harvested on different machines/runs
    # (build_manager.py:671-693 ``merge_files`` analogue):
    python -m gemm_hls_tpu.tools.sweep merge a.csv b.csv -o all.csv
"""

from __future__ import annotations

import argparse
import contextlib
import csv
import dataclasses
import io
import itertools
import time
import traceback
from typing import Dict, List, Optional, Sequence

import numpy as np

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.semiring import get_semiring
from gemm_hls_tpu.utils.benchmark import gflops, time_fn
from gemm_hls_tpu.utils.verify import (
    check_result, make_operands, reference_matmul,
)


@dataclasses.dataclass
class SweepResult:
    """One configuration's outcome — the ``Consumption`` row analogue
    (``scripts/build_manager.py:210-213``)."""

    config: GemmConfig
    status: str
    seconds: Optional[float] = None
    gflops: Optional[float] = None
    max_rel_err: Optional[float] = None
    detail: str = ""
    # Problem dims, recorded so result CSVs are self-describing when
    # merged across runs/machines (``merge_files`` needs them to know
    # which rows are comparable).  Optional: older CSVs lack them.
    m: Optional[int] = None
    n: Optional[int] = None
    k: Optional[int] = None

    CSV_COLS = ("m", "n", "k", "dtype", "semiring", "block_m", "block_n",
                "block_k", "precision", "status", "seconds", "gflops",
                "max_rel_err", "detail")

    def csv_row(self) -> Dict:
        return {
            "m": self.m if self.m is not None else "",
            "n": self.n if self.n is not None else "",
            "k": self.k if self.k is not None else "",
            "dtype": self.config.dtype,
            "semiring": self.config.semiring,
            "block_m": self.config.block_m,
            "block_n": self.config.block_n,
            "block_k": self.config.block_k,
            "precision": self.config.precision,
            "status": self.status,
            "seconds": f"{self.seconds:.6f}" if self.seconds else "",
            "gflops": f"{self.gflops:.2f}" if self.gflops else "",
            "max_rel_err": f"{self.max_rel_err:.3e}"
                           if self.max_rel_err is not None else "",
            "detail": self.detail[:200],
        }


def _classify_exception(e: BaseException) -> str:
    text = f"{type(e).__name__}: {e}"
    low = text.lower()
    if "resource_exhausted" in low or "vmem" in low or "out of memory" in low:
        return "vmem_overflow"
    if "mosaic" in low or "lowering" in low or "unsupported" in low:
        return "compile_failed"
    return "crashed"


def expand_grid(**axes: Sequence) -> List[Dict]:
    """Cartesian product of configuration axes
    (``build_manager.py:417-431`` analogue)."""
    keys = list(axes)
    return [dict(zip(keys, vals))
            for vals in itertools.product(*(axes[k] for k in keys))]


class _Timeout(Exception):
    pass


@contextlib.contextmanager
def _alarm(seconds: Optional[float]):
    """SIGALRM-based wall-clock timeout (main thread only) — guards against
    compile/execution hangs, the analogue of the reference's benchmark
    timeout (``build_manager.py:649-669``)."""
    import signal
    if not seconds or not hasattr(signal, "SIGALRM"):
        yield
        return

    def handler(signum, frame):
        raise _Timeout(f"exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.setitimer(signal.ITIMER_REAL, seconds)
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def _child_main(payload_json: str) -> int:
    """Entry point of one isolated sweep child (fresh interpreter).

    Reads a JSON work order, prints a single JSON result line to stdout.
    Invoked as ``python -m gemm_hls_tpu.tools.sweep --child '<json>'``.
    """
    import json

    p = json.loads(payload_json)
    try:
        if p.get("platform"):
            # The in-process platform override must land before the first
            # backend query (env vars are overridden by platform plugins).
            import jax
            jax.config.update("jax_platforms", p["platform"])
        if p.get("setup_code"):
            # The configure.sh hook analogue (build_manager.py:224-234);
            # also the fault-injection point for the isolation tests.
            exec(p["setup_code"], {"__name__": "__sweep_child_setup__"})
        cfg = GemmConfig(**p["cfg"])
        res = _run_one_inner(cfg, p["m"], p["n"], p["k"],
                             verify=p["verify"], iters=p["iters"],
                             backend=p.get("backend"))
        out = {"status": res.status, "seconds": res.seconds,
               "gflops": res.gflops, "max_rel_err": res.max_rel_err,
               "detail": res.detail}
    except BaseException as e:  # noqa: BLE001 — taxonomy happens here
        out = {"status": _classify_exception(e),
               "detail": f"{type(e).__name__}: {e}"[:500]}
    print("SWEEP_RESULT " + json.dumps(out), flush=True)
    return 0


def _spawn_child(cfg: GemmConfig, m, n, k, *, verify, iters, backend,
                 platform, setup_code):
    """Launch one config in a fresh interpreter (real process isolation —
    survives segfaults and wedged native threads, unlike in-process
    SIGALRM)."""
    import json
    import subprocess
    import sys

    payload = json.dumps({
        "cfg": dataclasses.asdict(cfg), "m": m, "n": n, "k": k,
        "verify": verify, "iters": iters, "backend": backend,
        "platform": platform, "setup_code": setup_code,
    })
    return subprocess.Popen(
        [sys.executable, "-m", "gemm_hls_tpu.tools.sweep", "--child",
         payload],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _reap_child(cfg: GemmConfig, proc,
                timeout_s: Optional[float]) -> SweepResult:
    import json
    import subprocess

    try:
        stdout, stderr = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        # Hard wall-clock kill: a wedged Mosaic compile or a hang off the
        # main thread cannot take the scan down
        # (``build_manager.py:649-669`` semantics).
        proc.kill()
        proc.communicate()
        return SweepResult(cfg, "timeout",
                           detail=f"killed after {timeout_s}s")
    payload = None
    for line in (stdout or "").splitlines():
        if line.startswith("SWEEP_RESULT "):
            payload = json.loads(line[len("SWEEP_RESULT "):])
    if payload is None:
        tail = (stderr or "").strip().splitlines()[-1:] or [""]
        return SweepResult(
            cfg, "crashed",
            detail=f"subprocess died (exit {proc.returncode}) {tail[0]}"[:200])
    return SweepResult(cfg, payload["status"], seconds=payload.get("seconds"),
                       gflops=payload.get("gflops"),
                       max_rel_err=payload.get("max_rel_err"),
                       detail=payload.get("detail", ""))


def run_one(cfg: GemmConfig, m: int, n: int, k: int, *, verify: bool = True,
            iters: int = 5, backend: Optional[str] = None,
            timeout_s: Optional[float] = None,
            retries: int = 0, isolation: str = "none",
            platform: Optional[str] = None,
            setup_code: Optional[str] = None) -> SweepResult:
    """Compile + verify + benchmark one configuration, with timeout and
    retry (``build_manager.py:611-669`` semantics).

    ``isolation="process"`` runs the configuration in a spawned subprocess
    with a hard wall-clock kill — the analogue of the reference's
    per-config build processes (``build_manager.py:417-431``): a crash
    (even a segfault) or an unkillable hang is classified and the scan
    continues.  ``setup_code`` is executed in the child before the run
    (the ``configure.sh`` hook analogue; also the fault-injection point
    for tests).
    """
    def stamp(res):
        res.m, res.n, res.k = m, n, k
        return res

    last = None
    for attempt in range(retries + 1):
        if isolation == "process":
            proc = _spawn_child(cfg, m, n, k, verify=verify,
                                iters=iters, backend=backend,
                                platform=platform, setup_code=setup_code)
            res = _reap_child(cfg, proc, timeout_s)
            if res.status != "timeout":
                return stamp(res)
            last = res
            continue
        try:
            with _alarm(timeout_s):
                return stamp(_run_one_inner(cfg, m, n, k, verify=verify,
                                            iters=iters, backend=backend))
        except _Timeout as e:
            last = SweepResult(cfg, "timeout", detail=str(e))
    return stamp(last)


def _run_one_inner(cfg: GemmConfig, m: int, n: int, k: int, *,
                   verify: bool, iters: int,
                   backend: Optional[str]) -> SweepResult:
    import jax
    import jax.numpy as jnp
    from gemm_hls_tpu.ops.matmul import matmul

    try:
        cfg.validate()
    except ValueError as e:
        return SweepResult(cfg, "invalid_config", detail=str(e))

    sr = get_semiring(cfg.semiring)
    a, b = make_operands(m, n, k, cfg.dtype)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    fn = jax.jit(lambda x, y: matmul(x, y, semiring=sr, config=cfg,
                                     backend=backend))
    try:
        out = fn(aj, bj)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001 — taxonomy, like the log regexes
        return SweepResult(cfg, _classify_exception(e),
                           detail=traceback.format_exception_only(e)[-1].strip())

    err = None
    if verify:
        exp = reference_matmul(a, b, semiring=sr.name)
        ok, err = check_result(np.asarray(out), exp)
        if not ok:
            return SweepResult(cfg, "wrong_result", max_rel_err=err)

    # Physical-ceiling sanity (the bench.py protocol): slope readings on
    # the relay transport occasionally come back faster than the hardware
    # peak when an RTT hiccup lands on the short-loop measurement.
    # Re-measure up to twice; a reading that stays impossible is published
    # as unreliable_timing rather than as a record.
    ceiling = None
    if sr.is_mxu:
        try:
            from gemm_hls_tpu.models.perf_model import detect_chip
            chip = detect_chip()
            if cfg.precision in ("i8x2", "i8x3", "i8x4", "default"):
                # Precision tiers run on faster engines than the operand
                # dtype's own pass (fp32 i8x2 legitimately sustains ~100 TF
                # against a 49 TF fp32 peak on v5e) — bound by the int8
                # engine rate, the fastest any tier can touch.
                ceiling = chip.peak_for("int8") or None
            else:
                ceiling = chip.peak_for(cfg.dtype) or None
        except Exception:  # noqa: BLE001 — unknown chip/dtype: no ceiling
            ceiling = None
    try:
        secs = time_fn(fn, [(aj, bj)], iters=iters, warmup=1)
        retries = 2
        while (ceiling and gflops(m, n, k, secs) * 1e9 > ceiling
               and retries):
            secs = time_fn(fn, [(aj, bj)], iters=iters, warmup=1)
            retries -= 1
    except Exception as e:  # noqa: BLE001
        return SweepResult(cfg, "crashed",
                           detail=traceback.format_exception_only(e)[-1].strip())
    if ceiling and gflops(m, n, k, secs) * 1e9 > ceiling:
        return SweepResult(cfg, "unreliable_timing", seconds=secs,
                           gflops=gflops(m, n, k, secs), max_rel_err=err)
    return SweepResult(cfg, "ok", seconds=secs, gflops=gflops(m, n, k, secs),
                       max_rel_err=err)


def _config_key(cfg: GemmConfig) -> tuple:
    return (cfg.dtype, cfg.semiring, cfg.block_m, cfg.block_n, cfg.block_k,
            cfg.precision)


def _load_checkpoint(path: str) -> Dict[tuple, Dict]:
    import os
    done = {}
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for row in csv.DictReader(f):
            key = (row["dtype"], row["semiring"], int(row["block_m"]),
                   int(row["block_n"]), int(row["block_k"]), row["precision"])
            done[key] = row
    return done


def sweep(grid: List[Dict], m: int, n: int, k: int, *, base: Optional[GemmConfig] = None,
          verify: bool = True, iters: int = 5, progress: bool = False,
          checkpoint_csv: Optional[str] = None,
          timeout_s: Optional[float] = None,
          retries: int = 0, isolation: str = "none",
          backend: Optional[str] = None, platform: Optional[str] = None,
          workers: int = 1,
          setup_code: Optional[str] = None) -> List[SweepResult]:
    """Run every configuration in ``grid`` (dicts of GemmConfig overrides).

    ``checkpoint_csv``: append each result as it completes and skip
    configurations already present — crash/resume semantics like the
    reference's per-config build dirs (``build_manager.py:224-307``).

    ``isolation="process"``: each configuration runs in its own spawned
    subprocess (crashes/hangs are contained and classified), and up to
    ``workers`` children run concurrently — the ``mp.Pool`` scan of the
    reference (``build_manager.py:417-431``).  Keep ``workers=1`` on real
    TPU backends (one device client at a time); CPU compile scans
    parallelize freely.
    """
    import os
    base = base or GemmConfig()
    done = _load_checkpoint(checkpoint_csv) if checkpoint_csv else {}
    results: List[Optional[SweepResult]] = [None] * len(grid)
    pending = []  # (index, cfg) still to run

    def emit(i, res, cached=False):
        res.m, res.n, res.k = m, n, k
        results[i] = res
        if not cached and checkpoint_csv:
            new_file = not os.path.exists(checkpoint_csv)
            cols = SweepResult.CSV_COLS
            if not new_file:
                # Resume into a checkpoint written by an older schema:
                # honor ITS header so appended rows stay aligned.
                with open(checkpoint_csv) as f:
                    header = f.readline().strip()
                cols = header.split(",") if header else cols
            with open(checkpoint_csv, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=cols,
                                   extrasaction="ignore")
                if new_file:
                    w.writeheader()
                w.writerow(res.csv_row())
        if progress:
            print(f"[{i + 1}/{len(grid)}] {grid[i]} -> {res.status}"
                  + (f" {res.gflops:.1f} GOp/s" if res.gflops else "")
                  + (" (cached)" if cached else ""))

    for i, overrides in enumerate(grid):
        cfg = base.replace(**overrides)
        key = _config_key(cfg)
        if key in done:
            row = done[key]
            emit(i, SweepResult(
                cfg, row["status"],
                seconds=float(row["seconds"]) if row["seconds"] else None,
                gflops=float(row["gflops"]) if row["gflops"] else None,
                detail=row.get("detail", "") + " [resumed]"), cached=True)
            continue
        pending.append((i, cfg))

    if isolation == "process" and workers > 1:
        # Window of concurrently running children, reaped in launch order
        # (keeps checkpoint append order deterministic enough to resume).
        window = []  # (index, cfg, proc, retries_left)

        def reap_front():
            wi, wcfg, proc, tries = window.pop(0)
            res = _reap_child(wcfg, proc, timeout_s)
            if res.status == "timeout" and tries > 0:
                # Same retry semantics as the sequential path: respawn a
                # timed-out config until its retry budget is exhausted.
                window.append((wi, wcfg,
                               _spawn_child(wcfg, m, n, k, verify=verify,
                                            iters=iters, backend=backend,
                                            platform=platform,
                                            setup_code=setup_code),
                               tries - 1))
                return
            emit(wi, res)

        for i, cfg in pending:
            while len(window) >= workers:
                reap_front()
            proc = _spawn_child(cfg, m, n, k, verify=verify,
                                iters=iters, backend=backend,
                                platform=platform, setup_code=setup_code)
            window.append((i, cfg, proc, retries))
        while window:
            reap_front()
    else:
        for i, cfg in pending:
            emit(i, run_one(cfg, m, n, k, verify=verify, iters=iters,
                            timeout_s=timeout_s, retries=retries,
                            isolation=isolation, backend=backend,
                            platform=platform, setup_code=setup_code))
    return results


def to_csv(results: List[SweepResult], path: Optional[str] = None) -> str:
    """Serialize like ``extract_benchmarks`` (``build_manager.py:578-608``)."""
    buf = io.StringIO()
    writer = csv.DictWriter(buf, fieldnames=SweepResult.CSV_COLS)
    writer.writeheader()
    for r in results:
        writer.writerow(r.csv_row())
    text = buf.getvalue()
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def best_result(results: List[SweepResult]) -> Optional[SweepResult]:
    ok = [r for r in results if r.status == "ok" and r.gflops]
    return max(ok, key=lambda r: r.gflops) if ok else None


def merge_csvs(paths: Sequence[str], out: Optional[str] = None) -> str:
    """Merge sweep/benchmark CSVs harvested on different machines or runs
    into one — the ``merge_files`` verb of the reference manager
    (``scripts/build_manager.py:671-693,763-770``).

    Rows are keyed by (m, n, k, dtype, semiring, block_m, block_n,
    block_k, precision); duplicates collapse to the best evidence:
    an ``ok`` row beats any failure (a config that benchmarked on one
    machine and crashed on another IS buildable), and among ``ok`` rows
    the highest GOp/s wins (same keep-the-best rule the reference's
    benchmark extraction applies).  Key columns absent in older CSVs
    (m/n/k) merge as blank and still collapse consistently.
    """
    keyed: Dict[tuple, Dict] = {}
    order: List[tuple] = []
    cols = list(SweepResult.CSV_COLS)
    for path in paths:
        with open(path, newline="") as f:
            reader = csv.DictReader(f)
            for row in reader:
                for c in (reader.fieldnames or []):
                    if c not in cols:
                        cols.append(c)
                key = tuple(row.get(c, "") for c in
                            ("m", "n", "k", "dtype", "semiring", "block_m",
                             "block_n", "block_k", "precision"))
                prev = keyed.get(key)
                if prev is None:
                    keyed[key] = row
                    order.append(key)
                    continue

                def rank(r):
                    ok = r.get("status") == "ok"
                    gf = float(r["gflops"]) if r.get("gflops") else 0.0
                    return (1 if ok else 0, gf)

                if rank(row) > rank(prev):
                    keyed[key] = row
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=cols, restval="")
    w.writeheader()
    for key in order:
        w.writerow(keyed[key])
    text = buf.getvalue()
    if out:
        with open(out, "w") as f:
            f.write(text)
    return text


def _int_list(s: str) -> List[int]:
    return [int(x) for x in s.split(",")]


def _str_list(s: str) -> List[str]:
    return [x.strip() for x in s.split(",") if x.strip()]


def main(argv=None):
    import sys as _sys
    args_in = list(argv) if argv is not None else _sys.argv[1:]
    if args_in[:1] == ["--child"]:
        return _child_main(args_in[1])
    if args_in[:1] == ["merge"]:
        mp = argparse.ArgumentParser(
            prog="sweep merge",
            description="Merge sweep CSVs from different machines/runs "
                        "(reference merge_files analogue).")
        mp.add_argument("csvs", nargs="+", help="input CSV paths")
        mp.add_argument("-o", "--out", default=None, help="merged CSV path")
        margs = mp.parse_args(args_in[1:])
        text = merge_csvs(margs.csvs, margs.out)
        if not margs.out:
            print(text, end="")
        else:
            nrows = text.count("\n") - 1
            print(f"merged {len(margs.csvs)} files -> {margs.out} "
                  f"({nrows} unique configs)")
        return text
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--m", type=int, required=True)
    p.add_argument("--n", type=int, required=True)
    p.add_argument("--k", type=int, required=True)
    p.add_argument("--dtype", type=_str_list, default=["float32"],
                   help="comma list -> swept as a config-product axis")
    p.add_argument("--semiring", type=_str_list, default=["plus_times"],
                   help="comma list -> swept as a config-product axis")
    p.add_argument("--precision", type=_str_list, default=["default"],
                   help="comma list -> swept as a config-product axis")
    p.add_argument("--block-m", type=_int_list, default=None)
    p.add_argument("--block-n", type=_int_list, default=None)
    p.add_argument("--block-k", type=_int_list, default=None)
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--csv", default=None, help="output CSV path")
    p.add_argument("--checkpoint", default=None,
                   help="incremental CSV for crash/resume")
    p.add_argument("--timeout-s", type=float, default=None)
    p.add_argument("--retries", type=int, default=0)
    p.add_argument("--isolation", choices=("none", "process"), default="none",
                   help="'process' runs each config in its own subprocess "
                        "with a hard kill on timeout")
    p.add_argument("--workers", type=int, default=1,
                   help="concurrent isolated children (CPU scans only; "
                        "keep 1 on TPU)")
    p.add_argument("--backend", default=None,
                   help="compute path override passed to matmul (mxu/vpu)")
    p.add_argument("--platform", default=None,
                   help="jax platform forced in isolated children (e.g. cpu)")
    args = p.parse_args(argv)

    from gemm_hls_tpu.ops.semiring import get_semiring
    # Block defaults follow the first semiring's engine (mixed MXU+VPU
    # products should pass explicit --block-* lists).
    if get_semiring(args.semiring[0]).is_mxu:
        defaults = dict(block_m=[512, 1024], block_n=[512, 1024],
                        block_k=[1024, 4096])
    else:  # VPU path wants lane-wide tiles
        defaults = dict(block_m=[16, 32, 64], block_n=[1024, 2048],
                        block_k=[512])
    # Full cartesian config product — blocks x dtype x semiring x
    # precision, the reference's CMake-option scan shape
    # (build_manager.py:417-431).
    grid = expand_grid(block_m=args.block_m or defaults["block_m"],
                       block_n=args.block_n or defaults["block_n"],
                       block_k=args.block_k or defaults["block_k"],
                       dtype=args.dtype, semiring=args.semiring,
                       precision=args.precision)
    base = GemmConfig(dtype=args.dtype[0], semiring=args.semiring[0])
    results = sweep(grid, args.m, args.n, args.k, base=base,
                    verify=not args.no_verify, iters=args.iters, progress=True,
                    checkpoint_csv=args.checkpoint, timeout_s=args.timeout_s,
                    retries=args.retries, isolation=args.isolation,
                    workers=args.workers, backend=args.backend,
                    platform=args.platform)
    text = to_csv(results, args.csv)
    if not args.csv:
        print(text)
    best = best_result(results)
    if best:
        print(f"best: blocks ({best.config.block_m},{best.config.block_n},"
              f"{best.config.block_k}) -> {best.gflops:.1f} GOp/s")
    return results


if __name__ == "__main__":
    main()
