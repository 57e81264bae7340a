"""Configurable (map, reduce) semiring registry.

TPU-native equivalent of the reference's operator plug-in system: the
``MM_MAP_OP`` / ``MM_REDUCE_OP`` CMake variables bound to ``hlslib::op::*``
functors (reference ``include/Config.h.in:34-35``, ``README.md:50``), applied
per vector lane inside the processing element
(reference ``kernel/Compute.cpp:129-137``).

A semiring generalizes C[i,j] = reduce_k map(A[i,k], B[k,j]):

* ``plus_times``  -> ordinary GEMM (MXU fast path),
* ``min_plus``    -> distance product / APSP relaxation step,
* ``max_plus``    -> tropical algebra / critical path,
* ``max_min``     -> bottleneck (widest) path,
* ``or_and``      -> boolean reachability,
* ``max_times``   -> Viterbi on probabilities,
* anything user-registered via :func:`register_semiring`.

Only ``plus_times`` can use the MXU systolic array; every other semiring
compiles into a tiled VPU kernel (see ``ops/pallas_vpu.py``).  The reduce
operator must be associative + commutative with an identity — the same
contract the reference demands (``identity()``/``Apply()`` usage at
``include/Utility.h:29,37``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Semiring:
    """A (map, reduce) operator pair with reduce identity.

    Attributes:
      name: registry key.
      map_op: elementwise binary op applied to (A-element, B-element); must
        broadcast (jnp semantics).
      reduce_op: associative+commutative binary elementwise op used to fold
        the K dimension.
      identity: reduce identity as a Python scalar (cast to the accumulator
        dtype at use sites) — ``hlslib::op::*::identity()`` analogue.
      np_map / np_reduce: numpy equivalents for the host-side verification
        oracle (reference ``include/Utility.h:18-42`` ``Naive``); ``np_reduce``
        must be a numpy ufunc supporting ``.reduce``.
      reduce_axis: optional jnp axis-reduction (e.g. ``jnp.min``) matching
        ``reduce_op``; built-ins provide it so kernels use the natively
        vectorized reduction instead of a generic binary fold tree.
      is_mxu: True iff this is the arithmetic (+, *) semiring that can ride
        the 128x128 MXU; everything else takes the VPU path — the analogue of
        the reference's DSP-vs-LUT operator resource binding
        (``include/MatrixMultiplication.h:141-153``).
      absorbing: optional (pad_a, pad_b) scalars with
        ``map(pad_a, pad_b) == identity`` — values safe to K-pad operands
        with so padded contraction indices contribute the reduce identity
        (the algebraic form of the reference's K-tail masking,
        ``kernel/Compute.cpp:112-137``).  None = this semiring cannot be
        K-padded; callers must mask instead.
    """

    name: str
    map_op: Callable
    reduce_op: Callable
    identity: object
    np_map: Callable
    np_reduce: np.ufunc
    is_mxu: bool = False
    reduce_axis: Optional[Callable] = None
    absorbing: Optional[tuple] = None

    def reduce_along(self, x, axis: int):
        """Reduce ``x`` along ``axis``: native reduction when available,
        generic balanced fold otherwise."""
        if self.reduce_axis is not None:
            return self.reduce_axis(x, axis=axis)
        from gemm_hls_tpu.ops.pallas_vpu import fold_axis
        return fold_axis(x, self.reduce_op, axis)

    def identity_for(self, dtype):
        """Reduce identity cast to ``dtype`` (inf -> dtype max for ints)."""
        d = np.dtype(dtype)
        v = self.identity
        if d.kind in "iu" and isinstance(v, float) and np.isinf(v):
            info = np.iinfo(d)
            return info.max if v > 0 else info.min
        if d.kind == "b":
            return bool(v)
        return np.asarray(v, d)[()]

    def supports_dtype(self, dtype) -> bool:
        d = np.dtype(dtype)
        if d.kind == "b":
            return self.name in ("or_and",)
        return True

    def absorbing_for(self, dtype):
        """The (pad_a, pad_b) K-padding pair cast to ``dtype`` (inf ->
        integer extremes), or None when the semiring has no absorbing pair.

        For integer dtypes with an *additive* map, infinite pads are cast
        to half the integer extreme: ``map(pad, pad)`` then lands exactly
        on the extreme (min_plus: 2*(max//2) = max-1; max_plus:
        2*(min//2) = min) instead of wrapping around — a full-extreme pad
        would overflow under addition and corrupt every padded column
        (e.g. INT32_MAX + INT32_MAX = -2, which then wins the min)."""
        if self.absorbing is None:
            return None
        d = np.dtype(dtype)
        additive_map = self.np_map is np.add

        def cast(v):
            if d.kind in "iu" and isinstance(v, float) and np.isinf(v):
                info = np.iinfo(d)
                ext = info.max if v > 0 else info.min
                return ext // 2 if additive_map else ext
            if d.kind == "b":
                return bool(v)
            return np.asarray(v, d)[()]

        return cast(self.absorbing[0]), cast(self.absorbing[1])


_REGISTRY: Dict[str, Semiring] = {}


def register_semiring(sr: Semiring, overwrite: bool = False) -> Semiring:
    if sr.name in _REGISTRY and not overwrite:
        raise ValueError(f"semiring {sr.name!r} already registered")
    _REGISTRY[sr.name] = sr
    return sr


def get_semiring(sr) -> Semiring:
    """Resolve a name or pass through a Semiring instance."""
    if isinstance(sr, Semiring):
        return sr
    try:
        return _REGISTRY[sr]
    except KeyError:
        raise KeyError(
            f"unknown semiring {sr!r}; available: {sorted(_REGISTRY)}"
        ) from None


def available_semirings():
    return sorted(_REGISTRY)


# ---- built-ins (mirror of hlslib::op Multiply/Add/Min/Max combinations) ----

register_semiring(Semiring(
    name="plus_times",
    map_op=jnp.multiply, reduce_op=jnp.add, identity=0,
    np_map=np.multiply, np_reduce=np.add,
    reduce_axis=jnp.sum,
    is_mxu=True,
    absorbing=(0, 0),
))

register_semiring(Semiring(
    name="min_plus",
    map_op=jnp.add, reduce_op=jnp.minimum, identity=float("inf"),
    np_map=np.add, np_reduce=np.minimum,
    reduce_axis=jnp.min,
    absorbing=(float("inf"), float("inf")),
))

register_semiring(Semiring(
    name="max_plus",
    map_op=jnp.add, reduce_op=jnp.maximum, identity=float("-inf"),
    np_map=np.add, np_reduce=np.maximum,
    reduce_axis=jnp.max,
    absorbing=(float("-inf"), float("-inf")),
))

register_semiring(Semiring(
    name="max_min",
    map_op=jnp.minimum, reduce_op=jnp.maximum, identity=float("-inf"),
    np_map=np.minimum, np_reduce=np.maximum,
    reduce_axis=jnp.max,
    absorbing=(float("-inf"), float("-inf")),
))

register_semiring(Semiring(
    name="min_max",
    map_op=jnp.maximum, reduce_op=jnp.minimum, identity=float("inf"),
    np_map=np.maximum, np_reduce=np.minimum,
    reduce_axis=jnp.min,
    absorbing=(float("inf"), float("inf")),
))

register_semiring(Semiring(
    name="max_times",
    map_op=jnp.multiply, reduce_op=jnp.maximum, identity=float("-inf"),
    np_map=np.multiply, np_reduce=np.maximum,
    reduce_axis=jnp.max,
))

register_semiring(Semiring(
    name="or_and",
    map_op=jnp.logical_and, reduce_op=jnp.logical_or, identity=False,
    np_map=np.logical_and, np_reduce=np.logical_or,
    absorbing=(False, False),
))

def _absdiff(x, y):
    return jnp.abs(x - y)


def _np_absdiff(x, y):
    return np.abs(x - y)


def _sqdiff(x, y):
    d = x - y
    return d * d


def _np_sqdiff(x, y):
    d = x - y
    return d * d


register_semiring(Semiring(
    # Pairwise L1 distances: C[i,j] = sum_k |A[i,k] - B[k,j]| — the
    # arbitrary-map capability beyond algebraic semirings (the reference's
    # MM_MAP_OP accepts any binary functor, README.md:50).
    name="plus_absdiff",
    map_op=_absdiff, reduce_op=jnp.add, identity=0,
    np_map=_np_absdiff, np_reduce=np.add, reduce_axis=jnp.sum,
    absorbing=(0, 0),
))

register_semiring(Semiring(
    # Pairwise squared-L2 distances: C[i,j] = sum_k (A[i,k] - B[k,j])^2.
    name="plus_sqdiff",
    map_op=_sqdiff, reduce_op=jnp.add, identity=0,
    np_map=_np_sqdiff, np_reduce=np.add, reduce_axis=jnp.sum,
    absorbing=(0, 0),
))

register_semiring(Semiring(
    name="log_plus",
    # Log semiring: map = +, reduce = logaddexp — the numerically stable
    # sum-product in log space (HMM forward algorithm / marginalization).
    map_op=jnp.add, reduce_op=jnp.logaddexp, identity=float("-inf"),
    np_map=np.add, np_reduce=np.logaddexp,
    reduce_axis=None,
    absorbing=(float("-inf"), float("-inf")),
))
