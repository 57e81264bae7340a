from gemm_hls_tpu.utils.verify import (
    make_operands,
    reference_matmul,
    tolerance_for,
    check_result,
    verify_matmul,
    unaligned_sizes,
)

__all__ = [
    "make_operands",
    "reference_matmul",
    "tolerance_for",
    "check_result",
    "verify_matmul",
    "unaligned_sizes",
]
