from gemm_hls_tpu.ops.semiring import (
    Semiring,
    get_semiring,
    register_semiring,
    available_semirings,
)
from gemm_hls_tpu.ops.matmul import matmul
from gemm_hls_tpu.ops.grouped import grouped_matmul

__all__ = [
    "Semiring",
    "get_semiring",
    "register_semiring",
    "available_semirings",
    "matmul",
    "grouped_matmul",
]
