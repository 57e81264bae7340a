from gemm_hls_tpu.parallel.mesh import make_mesh, mesh_25d
from gemm_hls_tpu.parallel.summa import (
    summa_matmul, cannon_matmul, shard_operands_2d,
)
from gemm_hls_tpu.parallel.grid25d import matmul_25d, shard_operands_25d
from gemm_hls_tpu.parallel.dispatch import distributed_matmul
from gemm_hls_tpu.ops.pallas_cannon import cannon_matmul_fused
from gemm_hls_tpu.ops.pallas_ring import ring_matmul, shard_operands_ring
from gemm_hls_tpu.parallel.ring_attention import (
    ring_decode_attention, ring_flash_attention,
)
from gemm_hls_tpu.parallel.staging import (
    distributed_streamed_matmul, streamed_matmul, streamed_matmul_files,
)
from gemm_hls_tpu.parallel.pipeline import (
    init_pipeline_params, pipeline_forward, pipeline_train_step,
    shard_pipeline_params, stages_forward,
)

__all__ = [
    "distributed_matmul",
    "make_mesh",
    "mesh_25d",
    "summa_matmul",
    "cannon_matmul",
    "shard_operands_2d",
    "matmul_25d",
    "shard_operands_25d",
    "distributed_streamed_matmul",
    "streamed_matmul",
    "streamed_matmul_files",
    "ring_matmul",
    "ring_flash_attention",
    "ring_decode_attention",
    "cannon_matmul_fused",
    "shard_operands_ring",
    "init_pipeline_params",
    "pipeline_forward",
    "pipeline_train_step",
    "shard_pipeline_params",
    "stages_forward",
]
