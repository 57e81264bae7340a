from gemm_hls_tpu.models.perf_model import (
    ChipSpec,
    get_chip,
    available_chips,
    detect_chip,
    specifications,
    format_specifications,
)
from gemm_hls_tpu.models.scaling_model import (
    comm_volume_per_device,
    multichip_model,
    weak_scaling_efficiency,
)
from gemm_hls_tpu.models.graph import (
    all_pairs_shortest_paths,
    distance_product,
    transitive_closure,
    widest_paths,
)
from gemm_hls_tpu.models.moe import (
    MoEConfig,
    init_moe_params,
    load_balance_loss,
    moe_forward,
    moe_forward_ep,
    moe_forward_ep_a2a,
    moe_train_step,
)

__all__ = [
    "ChipSpec",
    "get_chip",
    "available_chips",
    "detect_chip",
    "specifications",
    "format_specifications",
    "comm_volume_per_device",
    "multichip_model",
    "weak_scaling_efficiency",
    "all_pairs_shortest_paths",
    "distance_product",
    "transitive_closure",
    "widest_paths",
    "MoEConfig",
    "init_moe_params",
    "load_balance_loss",
    "moe_forward",
    "moe_forward_ep",
    "moe_forward_ep_a2a",
    "moe_train_step",
]
