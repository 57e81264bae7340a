"""gemm_hls_tpu — TPU-native communication-avoiding, configurable-semiring GEMM.

A brand-new JAX/Pallas/pjit framework with the capabilities of the FPGA
reference spcl/gemm_hls (see /root/repo/SURVEY.md): a two-level
communication-avoiding tiled matmul with a pluggable (map, reduce) semiring,
an analytical performance model, a fast-memory-budget tile optimizer, an
exact verification harness, a configuration sweep manager — extended with
multi-chip 2.5D/SUMMA decompositions over the ICI mesh.

Naming note vs the reference: the reference computes C[N,M] = A[N,K]·B[K,M]
(``include/MatrixMultiplication.h:155-171``).  This framework uses the
conventional C[M,N] = A[M,K]·B[K,N]; the reference's ``N`` maps to our ``M``
and its ``M`` to our ``N``.
"""

from gemm_hls_tpu.config import GemmConfig, default_config
from gemm_hls_tpu.ops.semiring import (
    Semiring,
    get_semiring,
    register_semiring,
    available_semirings,
)
from gemm_hls_tpu.ops.matmul import matmul
from gemm_hls_tpu.ops.grouped import grouped_matmul
from gemm_hls_tpu.ops.attention import (attention, attention_scores,
                                         flash_attention)
from gemm_hls_tpu.ops.quant import (dequantize_weights, matmul_quantized,
                                    matmul_w8a8, quantize_weights)

__version__ = "0.1.0"

__all__ = [
    "GemmConfig",
    "default_config",
    "Semiring",
    "get_semiring",
    "register_semiring",
    "available_semirings",
    "matmul",
    "grouped_matmul",
    "attention",
    "flash_attention",
    "matmul_quantized",
    "matmul_w8a8",
    "quantize_weights",
    "dequantize_weights",
    "attention_scores",
]
