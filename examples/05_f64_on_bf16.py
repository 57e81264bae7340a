"""Double-precision GEMM without f64 hardware (Ozaki slice scheme).

    python examples/05_f64_on_bf16.py
"""

import numpy as np

from gemm_hls_tpu.ops.ozaki import ozaki_matmul, slice_plan

rng = np.random.default_rng(5)
m = n = k = 512
a = rng.uniform(-5, 5, (m, k))
b = rng.uniform(-5, 5, (k, n))

bits, ns = slice_plan(k)
print(f"K={k}: {ns} slices of {bits} mantissa bits each "
      f"(2*{bits}+log2({k}) <= 24 keeps every fp32 accumulation exact)")

got = ozaki_matmul(a, b)
exp = a @ b
elem = np.abs(got - exp) / np.maximum(np.abs(exp), 1e-300)
normw = np.abs(got - exp) / (np.linalg.norm(a, axis=1)[:, None]
                             * np.linalg.norm(b, axis=0)[None, :])
f32 = np.abs(a.astype(np.float32) @ b.astype(np.float32) - exp) / np.abs(exp)
print(f"elementwise max rel err: {elem.max():.2e} "
      f"(plain f32 would be {f32.max():.2e})")
print(f"normwise max err: {normw.max():.2e} (full f64 quality)")

# The production path: the same error-free transformation on the int8
# engine, with the whole slice triangle fused into one Pallas kernel —
# ~4x faster (8.7 TF on v5e @2048^3) and K-unbounded.
from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8

got_i8 = ozaki_matmul_int8(a, b)
normw_i8 = np.abs(got_i8 - exp) / (np.linalg.norm(a, axis=1)[:, None]
                                   * np.linalg.norm(b, axis=0)[None, :])
print(f"fused int8 variant normwise max err: {normw_i8.max():.2e}")
