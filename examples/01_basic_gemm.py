"""Basic CA-GEMM usage: configs, verification, the analytical model.

Runs anywhere (TPU: compiled Pallas kernels; CPU: same kernels interpreted).
    python examples/01_basic_gemm.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.models import format_specifications, specifications
from gemm_hls_tpu.ops.semiring import get_semiring
from gemm_hls_tpu.utils import make_operands, reference_matmul, verify_matmul

# Seeded operands, reference-style (U(1,10), seed 5), deliberately unaligned.
m, n, k = 1000, 1030, 999
a, b = make_operands(m, n, k, "float32")

# Default config: blocks auto-clamped to the problem.
c = matmul(jnp.asarray(a), jnp.asarray(b))
err = verify_matmul(np.asarray(c), reference_matmul(a, b))
print(f"fp32 {m}x{n}x{k}: verified vs BLAS oracle (max rel err {err:.2e})")

# Explicit specialization — the Config.h analogue; hashable, jit-cache-keyed.
cfg = GemmConfig(dtype="bfloat16", out_dtype="float32",
                 block_m=512, block_n=1024, block_k=1024)
a16 = jnp.asarray(a[:512, :512], jnp.bfloat16)
b16 = jnp.asarray(b[:512, :512], jnp.bfloat16)
c16 = jax.jit(lambda x, y: matmul(x, y, config=cfg))(a16, b16)
print(f"bf16 with fp32 accumulation: {c16.shape} {c16.dtype}")

# What should this run cost? (PrintSpecifications port.)
print()
print(format_specifications(
    specifications(cfg, 8192, 8192, 8192,
                   semiring_is_mxu=get_semiring("plus_times").is_mxu)))
