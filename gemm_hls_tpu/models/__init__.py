from gemm_hls_tpu.models.perf_model import (
    ChipSpec,
    get_chip,
    available_chips,
    detect_chip,
    specifications,
    format_specifications,
)

__all__ = [
    "ChipSpec",
    "get_chip",
    "available_chips",
    "detect_chip",
    "specifications",
    "format_specifications",
]
