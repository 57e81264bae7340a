"""The fp32 accuracy/speed frontier: pick your point.

One GEMM, four ways to run it on TPU silicon — full fp32 passes, Mosaic's
multi-pass fast mode, and two integer-slice schemes on the int8 engine with
exact int32 accumulation (the error-free-transformation family that also
powers the f64-class path).

    python examples/09_fp32_frontier.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.ops.int8_slices import fp32_matmul_int8
from gemm_hls_tpu.utils import make_operands

m = n = k = 512
a, b = make_operands(m, n, k, "float32", low=-5.0, high=5.0)
aj, bj = jnp.asarray(a), jnp.asarray(b)
exp = a.astype(np.float64) @ b
norm = (np.linalg.norm(a, axis=1)[:, None] * np.linalg.norm(b, axis=0)[None, :])

cfg = GemmConfig(dtype="float32", block_m=128, block_n=128, block_k=512)


def report(name, out, v5e_tf):
    err = (np.abs(np.asarray(out, np.float64) - exp) / norm).max()
    print(f"{name:42s} normwise err {err:.1e}   (~{v5e_tf} TF on v5e @8192^3)")


report("fp32 full accuracy (precision='high')",
       matmul(aj, bj, config=cfg), 32)
report("fp32 fast mode (precision='default')",
       matmul(aj, bj, config=cfg, precision="default"), 90)
report("int8 slices, n=2",
       fp32_matmul_int8(aj, bj, block_m=128, block_n=128, block_k=512,
                        n_slices=2), 95)
report("int8 slices, n=3",
       fp32_matmul_int8(aj, bj, block_m=128, block_n=128, block_k=512,
                        n_slices=3), 51)
