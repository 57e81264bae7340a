"""Verification harness: seeded operands, host oracle, exact comparison.

Re-implements the reference's test semantics:

* Deterministic fixtures: fixed seed 5, values U(1, 10) — small positive
  values so relative error is well-behaved
  (``test/TestSimulation.cpp:46-55``, ``include/MatrixMultiplication.h:14``).
* Oracle: BLAS when the semiring is (+, x) — here ``numpy.matmul`` in
  float64, which dispatches to the system BLAS exactly like the reference's
  ``CallBLAS`` (``include/Utility.h:76-103``) — and a generic blocked
  map/reduce sweep for every other semiring, the ``Naive`` fallback
  (``include/Utility.h:18-42``).
* Tolerance: relative 1e-3 for float32 (``test/TestSimulation.cpp:79-85``),
  exact for integers/bool, dtype-scaled for bf16/fp16/f64.
* Adversarial sizes: deliberately tile-unaligned dimensions exercising the
  bounds masking, after the reference's CMake-computed test dims
  ``N = 2*T_N + 1`` etc. (``CMakeLists.txt:155-159``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from gemm_hls_tpu.config import GemmConfig, LANE
from gemm_hls_tpu.ops.semiring import get_semiring

KSEED = 5  # reference kSeed (include/MatrixMultiplication.h:14)


def _kind(dtype) -> str:
    """numpy kind, mapping ml_dtypes extension floats (kind 'V') to 'f'."""
    k = np.dtype(dtype).kind
    return "f" if k == "V" else k


def make_operands(m: int, n: int, k: int, dtype="float32", *, seed: int = KSEED,
                  low: float = 1.0, high: float = 10.0,
                  transpose_a: bool = False, transpose_b: bool = False):
    """Seeded random (A, B) with the reference's U(1,10) distribution."""
    rng = np.random.default_rng(seed)
    d = np.dtype(dtype)
    a_shape = (k, m) if transpose_a else (m, k)
    b_shape = (n, k) if transpose_b else (k, n)

    def draw(shape):
        if _kind(d) == "f":
            return rng.uniform(low, high, shape).astype(d)
        if _kind(d) in "iu":
            return rng.integers(int(low), int(high), shape, endpoint=True).astype(d)
        if _kind(d) == "b":
            return rng.integers(0, 1, shape, endpoint=True).astype(bool)
        raise ValueError(f"unsupported dtype {d}")

    return draw(a_shape), draw(b_shape)


def reference_matmul(a: np.ndarray, b: np.ndarray, semiring="plus_times", *,
                     transpose_a: bool = False, transpose_b: bool = False,
                     block_bytes: int = 64 << 20) -> np.ndarray:
    """Host-side oracle in wide precision (float64 / int64 / bool).

    BLAS path for (+, x); generic blocked map/reduce sweep otherwise
    (``include/Utility.h:66-111`` ``ReferenceImplementation``).
    """
    sr = get_semiring(semiring)
    a_l = np.asarray(a).T if transpose_a else np.asarray(a)
    b_l = np.asarray(b).T if transpose_b else np.asarray(b)
    k = _kind(a_l.dtype)
    if k == "f":
        wide = np.float64
    elif k in "iu":
        wide = np.int64
    else:
        wide = np.bool_
    if sr.is_mxu:
        return a_l.astype(wide) @ b_l.astype(wide)  # cblas_dgemm analogue

    # Native C++ oracle when available (the CallBLAS-style fast path for
    # generic semirings); numpy blocked sweep otherwise.  It does its own
    # wide conversion, so the host-side float64 copies are only
    # materialized on the numpy fallback path.
    from gemm_hls_tpu.utils.native import native_reference_matmul
    native = native_reference_matmul(a_l, b_l, sr.name)
    if native is not None:
        return native

    a_w, b_w = a_l.astype(wide), b_l.astype(wide)
    m, k = a_w.shape
    n = b_w.shape[1]

    # Naive semiring sweep, blocked over rows to bound the (rows, K, N)
    # intermediate.
    itemsize = np.dtype(wide).itemsize if wide is not np.bool_ else 1
    rows = max(1, min(m, block_bytes // max(1, k * n * itemsize)))
    out = np.empty((m, n), dtype=wide)
    for r0 in range(0, m, rows):
        r1 = min(m, r0 + rows)
        mapped = sr.np_map(a_w[r0:r1, :, None], b_w[None, :, :])
        out[r0:r1] = sr.np_reduce.reduce(mapped, axis=1)
    return out


def tolerance_for(dtype) -> float:
    """Per-dtype relative tolerance; float32 matches the reference's 1e-3
    (``test/TestSimulation.cpp:79-85``), integers are exact."""
    d = np.dtype(dtype)
    if _kind(d) in "iub":
        return 0.0
    return {
        np.dtype("float64"): 1e-9,
        np.dtype("float32"): 1e-3,
        np.dtype("float16"): 1e-2,
    }.get(d, 2e-2)  # bfloat16 & friends


def check_result(result, expected, *, rtol: float = None) -> Tuple[bool, float]:
    """Element-wise comparison; returns (ok, max relative error).

    Integer comparison goes through a signed diff so unsigned types can't
    wrap — the reference's ``make_signed`` guard (``include/Utility.h:113-129``).
    """
    exp = np.asarray(expected)
    res = np.asarray(result,
                     dtype=np.float64 if _kind(exp.dtype) == "f" else np.int64)
    if rtol is None:
        rtol = tolerance_for(np.asarray(result).dtype)
    if _kind(exp.dtype) in "iub":
        diff = res.astype(np.int64) - exp.astype(np.int64)
        return bool(np.all(diff == 0)), float(np.max(np.abs(diff), initial=0))
    exp = exp.astype(np.float64)
    finite_mask = np.isfinite(exp)
    # +-inf entries (e.g. unreachable pairs in min_plus) must match exactly.
    inf_ok = bool(np.array_equal(res[~finite_mask], exp[~finite_mask]))
    denom = np.maximum(np.abs(exp[finite_mask]), 1e-30)
    rel = np.abs(res[finite_mask] - exp[finite_mask]) / denom
    max_rel = float(rel.max()) if rel.size else 0.0
    return inf_ok and max_rel <= rtol, max_rel


def verify_matmul(result, expected, *, rtol: float = None, what: str = "matmul"):
    ok, err = check_result(result, expected, rtol=rtol)
    if not ok:
        raise AssertionError(
            f"{what}: verification FAILED (max rel/abs err {err:.3e}, "
            f"rtol {rtol if rtol is not None else tolerance_for(np.asarray(result).dtype)})"
        )
    return err


def unaligned_sizes(cfg: GemmConfig) -> Tuple[int, int, int]:
    """Deliberately tile-unaligned (M, N, K) — reference ``CMakeLists.txt:155-159``:
    one past a tile boundary in M, a lane-width overhang in N, a sublane
    overhang in K."""
    return (
        2 * cfg.block_m + 1,
        2 * cfg.block_n + LANE // 2 + 3,
        2 * cfg.block_k + 7,
    )
