from gemm_hls_tpu.utils.verify import (
    make_operands,
    reference_matmul,
    tolerance_for,
    check_result,
    verify_matmul,
    unaligned_sizes,
)
from gemm_hls_tpu.utils.benchmark import gflops, percent_of_peak, time_fn
from gemm_hls_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "make_operands",
    "reference_matmul",
    "tolerance_for",
    "check_result",
    "verify_matmul",
    "unaligned_sizes",
    "gflops",
    "percent_of_peak",
    "time_fn",
    "load_checkpoint",
    "save_checkpoint",
]
