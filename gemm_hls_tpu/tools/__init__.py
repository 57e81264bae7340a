from gemm_hls_tpu.tools.tile_optimizer import optimal_tiles, tile_candidates

__all__ = ["optimal_tiles", "tile_candidates"]
