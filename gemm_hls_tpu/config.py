"""Configuration and tiling math.

TPU-native equivalent of the reference's compile-time configuration system:
the ``MM_*`` CMake cache variables that generate ``Config.h``
(reference ``CMakeLists.txt:7-36``, ``include/Config.h.in``) and the derived
tile constants with eager divisibility validation
(reference ``include/MatrixMultiplication.h:68-133``).

Mapping of the two-level communication-avoiding tiling onto TPU hardware:

* Reference *outer / memory tile* ``kOuterTileSizeN/M`` (sized to fill BRAM)
  -> our ``block_m/block_n/block_k`` Pallas blocks (sized to fill VMEM).
* Reference *inner / compute tile* ``MM_PARALLELISM_N x MM_PARALLELISM_M``
  (the PE array x SIMD width) -> the fixed 128x128 MXU systolic array and
  8x128 VPU lanes; Mosaic tiles VMEM blocks onto these automatically, so the
  inner level is a hardware constant rather than a build knob.
* Reference ``MM_DYNAMIC_SIZES`` (bounds masking, ``kernel/Compute.cpp:112-137``)
  -> ``pad_policy`` ("pad" pads/masks unaligned shapes; "strict" rejects them
  like the static-size build).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

# Hardware tiling constraints (sublane x lane) per dtype — the TPU analogue
# of the reference's memory-bus-width divisibility rules
# (``CMakeLists.txt:54-67``).  Lane dimension is always 128.
LANE = 128
_SUBLANE = {
    4: 8,   # float32/int32: (8, 128)
    2: 16,  # bfloat16/float16: (16, 128)
    1: 32,  # int8/fp8: (32, 128)
    8: 8,   # float64 (emulated): treat as float32 pairs
}


def sublane(dtype) -> int:
    """Minimum second-to-last-dim tile for ``dtype``."""
    return _SUBLANE[np.dtype(dtype).itemsize]


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@dataclasses.dataclass(frozen=True)
class GemmConfig:
    """One GEMM specialization — the ``Config.h`` analogue.

    Hashable so it can key jit caches, exactly as the reference's generated
    header keys one hardware build.

    Attributes:
      dtype: element type of A and B (reference ``MM_DATA_TYPE``).
      out_dtype: element type of C (defaults to ``dtype``).
      acc_dtype: accumulator type held in VMEM scratch — the analogue of the
        PE's ``cBuffer`` "T^2 fast memory" (reference ``kernel/Compute.cpp:26``);
        float32 for float inputs, widened int for integer inputs.
      block_m/block_n: outer (memory) tile of C resident in VMEM — reference
        ``kOuterTileSizeN/M`` (``include/MatrixMultiplication.h:68-72``).
      block_k: K-streaming chunk per grid step. The reference streams K
        un-tiled (``kernel/Compute.cpp:58-60``); on TPU we stream it in
        VMEM-sized chunks, which is the same communication-avoiding scheme
        (C stationary, A/B streamed).
      semiring: name of the (map, reduce) operator pair — reference
        ``MM_MAP_OP``/``MM_REDUCE_OP`` (``include/Config.h.in:34-35``).
      transpose_a: A is supplied K-major, i.e. shape (K, M) — reference
        ``MM_TRANSPOSED_A``. Compiled kernels then need ``block_m`` to be a
        multiple of 128 (it lands on the lane dimension).
      transpose_b: B is supplied N-major, i.e. shape (N, K); contraction
        over its second axis (used copy-free by the custom-VJP backward).
      pad_policy: "pad" (mask/pad unaligned sizes, reference dynamic-size
        masking ``kernel/Compute.cpp:112-137``) or "strict" (reject).
      precision: MXU precision for float32 inputs. "high"/"highest"
        (default) = full fp32 accuracy (~3e-7), always within the
        reference's 1e-3 verification contract.  "default" = Mosaic's
        multi-pass bf16 decomposition: 2.85x faster (90 vs 32 TF on v5e)
        with ~5e-4 typical relative error, but the error scales with the
        *absolute* magnitude of the accumulation, so cancellation-heavy
        data can exceed 1e-3 element-wise — opt in for well-conditioned
        workloads.  "i8x2"/"i8x3"/"i8x4" run the integer-slice scheme on
        the int8 engine (``ops/int8_slices.py``): ~2^-14 normwise at
        ~100 TF / ~2^-21 at ~55 TF / ~2^-24.6 at ~30 TF on v5e — all with
        exact int32 accumulation (normwise-bounded error, unlike
        "default").  "i8x4" reaches the f32 *output* rounding floor
        (measured 3.9e-8; more slices change nothing), i.e. strictly
        tighter error than "highest" at ~0.95x its speed.
      interpret: force Pallas interpreter mode (None = auto: interpret
        off-TPU). The analogue of hlslib's software dataflow simulation —
        the *same kernel code* runs on CPU (reference ``test/TestSimulation.cpp``).
      vmem_limit_bytes: VMEM budget handed to the compiler; the BRAM-capacity
        analogue used by tile validation.
    """

    dtype: str = "float32"
    out_dtype: Optional[str] = None
    acc_dtype: Optional[str] = None
    block_m: int = 512
    block_n: int = 512
    block_k: int = 512
    semiring: str = "plus_times"
    transpose_a: bool = False
    transpose_b: bool = False
    pad_policy: str = "pad"
    precision: str = "high"
    interpret: Optional[bool] = None
    vmem_limit_bytes: int = 96 * 1024 * 1024
    # Per-output-tile progress prints from inside the kernel — the analogue
    # of the reference's simulation-mode progress output
    # (``kernel/Memory.cpp:384-389``) and MM_ENABLE_DEBUGGING.
    debug: bool = False

    # ---- resolved dtypes -------------------------------------------------

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def jout_dtype(self):
        return jnp.dtype(self.out_dtype if self.out_dtype is not None else self.dtype)

    @property
    def jacc_dtype(self):
        if self.acc_dtype is not None:
            return jnp.dtype(self.acc_dtype)
        d = jnp.dtype(self.dtype)
        if d == jnp.float64:
            return jnp.dtype("float64")
        if jnp.issubdtype(d, jnp.floating):
            return jnp.dtype("float32")
        if jnp.issubdtype(d, jnp.integer):
            return jnp.dtype("int32")
        if d == jnp.bool_:
            return jnp.dtype("bool")
        raise ValueError(f"no accumulator rule for dtype {d}")

    # ---- validation (CMakeLists.txt:54-67 / static_asserts analogue) -----

    def validate(self, strict_alignment: Optional[bool] = None) -> "GemmConfig":
        """Eager validation, mirroring the reference's fatal CMake checks and
        ``static_assert`` divisibility proofs (``MatrixMultiplication.h:73-83``).

        Alignment to hardware tiles is enforced only for compiled-mode
        configs; interpreter mode (the software-simulation path) accepts any
        block shape, like hlslib's thread-based simulation does.
        """
        if self.pad_policy not in ("pad", "strict"):
            raise ValueError(f"pad_policy must be 'pad' or 'strict', got {self.pad_policy!r}")
        if self.precision not in ("default", "high", "highest",
                                  "i8x2", "i8x3", "i8x4"):
            raise ValueError(
                f"precision must be one of 'default', 'high', 'highest', "
                f"'i8x2', 'i8x3', 'i8x4', got {self.precision!r}")
        for name in ("block_m", "block_n", "block_k"):
            v = getattr(self, name)
            if not (isinstance(v, int) and v > 0):
                raise ValueError(f"{name} must be a positive int, got {v!r}")
        if strict_alignment is None:
            strict_alignment = not bool(self.interpret)
        if strict_alignment:
            sub = sublane(self.dtype)
            # A transposed operand puts block_m on the lane dimension, which
            # Mosaic requires to be a multiple of 128.
            m_align = LANE if self.transpose_a else sub
            checks = [
                ("block_m", self.block_m, m_align),
                ("block_n", self.block_n, LANE),
                ("block_k", self.block_k, LANE),
            ]
            for name, v, m in checks:
                if v % m != 0:
                    raise ValueError(
                        f"{name}={v} must be a multiple of {m} for dtype "
                        f"{self.dtype} (TPU tiling constraint)"
                    )
            need = self.vmem_bytes()
            if need > self.vmem_limit_bytes:
                raise ValueError(
                    f"tile config needs ~{need} B of VMEM "
                    f"(> budget {self.vmem_limit_bytes} B); shrink blocks "
                    f"or raise vmem_limit_bytes"
                )
        return self

    # ---- derived tiling math (MatrixMultiplication.h:99-133 analogue) ----

    def vmem_bytes(self, n_buffers: int = 2) -> int:
        """Estimated VMEM footprint of one kernel instance.

        A/B blocks are multi-buffered by the Mosaic pipeline (the analogue of
        the PE's A double-buffer, reference ``kernel/Compute.cpp:19-26``);
        the accumulator and output tile are single instances.
        """
        in_b = np.dtype(self.dtype).itemsize
        acc_b = np.dtype(self.jacc_dtype).itemsize
        out_b = np.dtype(self.jout_dtype).itemsize
        a = self.block_m * self.block_k * in_b
        b = self.block_k * self.block_n * in_b
        acc = self.block_m * self.block_n * acc_b
        out = self.block_m * self.block_n * out_b
        return n_buffers * (a + b) + acc + n_buffers * out

    def grid(self, m: int, n: int, k: int) -> Tuple[int, int, int]:
        """Outer-tile counts — reference ``OuterTilesN/M``
        (``MatrixMultiplication.h:109-117``), plus the K-stream count."""
        return (cdiv(m, self.block_m), cdiv(n, self.block_n), cdiv(k, self.block_k))

    def padded_shape(self, m: int, n: int, k: int) -> Tuple[int, int, int]:
        gm, gn, gk = self.grid(m, n, k)
        return (gm * self.block_m, gn * self.block_n, gk * self.block_k)

    def io_volume_words(self, m: int, n: int, k: int) -> int:
        """Off-chip (HBM) traffic in words for the communication-avoiding
        schedule: ``M*N*(1 + K/block_n + K/block_m)`` — the reference's
        comm-volume formula ``N*M*(1 + K/T_N + K/T_M)``
        (``src/PrintSpecifications.cpp:72-75``) in our naming.

        Derivation: per (block_m x block_n) C tile we stream an A slab
        (block_m x K) and a B slab (K x block_n); there are
        (M/block_m)*(N/block_n) tiles; plus M*N output writes.
        """
        gm, gn, _ = self.grid(m, n, k)
        reads_a = self.block_m * k * gm * gn  # TotalReadsFromA analogue
        reads_b = k * self.block_n * gm * gn  # TotalReadsFromB analogue
        writes_c = m * n
        return reads_a + reads_b + writes_c

    def io_volume_bytes(self, m: int, n: int, k: int) -> int:
        in_b = np.dtype(self.dtype).itemsize
        out_b = np.dtype(self.jout_dtype).itemsize
        gm, gn, _ = self.grid(m, n, k)
        return (
            (self.block_m * k * gm * gn + k * self.block_n * gm * gn) * in_b
            + m * n * out_b
        )

    def hbm_traffic_bytes(self, m: int, n: int, k: int) -> int:
        """Actual HBM traffic of the Pallas schedule, in bytes.

        Refines :meth:`io_volume_bytes` (the reference's schedule *law*)
        with one Mosaic pipelining fact: when the whole K fits one block
        (grid K-dim = 1, the full-K-stream configurations) the kernel runs
        a pure 2-D (i, j) sweep with j innermost, so A's block index (i)
        is unchanged across each j sweep and Mosaic skips the re-fetch —
        A is read ``gm`` times, not ``gm*gn``.  (With K gridded, both
        operands' indices change at every step and the law is exact.)
        """
        in_b = np.dtype(self.dtype).itemsize
        out_b = np.dtype(self.jout_dtype).itemsize
        gm, gn, gk = self.grid(m, n, k)
        a_fetches = gm if gk == 1 else gm * gn
        return ((self.block_m * k * a_fetches
                 + k * self.block_n * gm * gn) * in_b
                + m * n * out_b)

    def flops(self, m: int, n: int, k: int) -> int:
        """2*M*N*K — one map + one reduce per inner product term, matching
        the reference's GOp/s accounting (``host/RunHardware.cpp:174-180``)."""
        return 2 * m * n * k

    def arithmetic_intensity(self, m: int, n: int, k: int) -> float:
        return self.flops(m, n, k) / self.io_volume_bytes(m, n, k)

    def replace(self, **kw) -> "GemmConfig":
        return dataclasses.replace(self, **kw)


def default_config(dtype="float32", **kw) -> GemmConfig:
    """A sensible per-dtype default, mirroring the reference's default CMake
    cache values (``CMakeLists.txt:7-36``) scaled to VMEM instead of BRAM."""
    d = jnp.dtype(dtype)
    if kw.get("semiring", "plus_times") != "plus_times":
        # VPU path: lane-wide tiles + the widest K-chunk that fits VMEM win
        # (4.59 TOp/s at (16, 2048, 2048)/ck=512 vs 0.9 at (256, 256) on
        # v5e); the (block_m, chunk, block_n) mapped intermediate bounds
        # block_m * chunk.  block_m must still satisfy the dtype's sublane
        # tiling (32 for 1-byte dtypes, 16 for 2-byte).
        base = dict(block_m=max(16, sublane(str(d))), block_n=2048,
                    block_k=2048, vmem_limit_bytes=128 * 1024 * 1024)
    elif d.itemsize <= 2 and jnp.issubdtype(d, jnp.floating):
        # bf16/fp16: big MXU-friendly tiles
        base = dict(block_m=512, block_n=1024, block_k=1024)
    elif d == jnp.float64:
        base = dict(block_m=256, block_n=256, block_k=256)
    else:
        base = dict(block_m=512, block_n=512, block_k=512)
    base.update(kw)
    return GemmConfig(dtype=str(d), **base)
