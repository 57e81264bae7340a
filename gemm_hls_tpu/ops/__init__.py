from gemm_hls_tpu.ops.semiring import (
    Semiring,
    get_semiring,
    register_semiring,
    available_semirings,
)
from gemm_hls_tpu.ops.matmul import matmul

__all__ = [
    "Semiring",
    "get_semiring",
    "register_semiring",
    "available_semirings",
    "matmul",
]
