"""Quantized inference GEMMs: weight-only int8/int4 and W8A8.

A serving-shaped tour of `ops/quant.py`: weights are quantized once
offline, stream HBM→VMEM quantized, and expand in-register inside the
kernel (`ops/pallas_dequant.py`).  Pick the mode by batch size:

* small M (decode / small batch) → weight-bandwidth-bound → weight-only
  int4 (2.3× bf16 measured at M=32) or int8;
* large M (prefill / training-free scoring) → compute-bound → W8A8 on
  the int8 MXU engine (1.3× bf16 measured, above the bf16 engine peak).

    python examples/13_quantized_inference.py
"""

import numpy as np
import jax.numpy as jnp

from gemm_hls_tpu import (
    dequantize_weights, matmul_quantized, matmul_w8a8, quantize_weights,
)

K, N = 512, 256


def main():
    rng = np.random.default_rng(5)
    w = (rng.standard_normal((K, N)) / np.sqrt(K)).astype(np.float32)
    x_small = jnp.asarray(rng.standard_normal((8, K)), jnp.float32)
    ref_small = np.asarray(x_small) @ w

    # --- weight-only int8, per-channel scales -------------------------
    wq8, s8 = quantize_weights(w, bits=8)
    y8 = np.asarray(matmul_quantized(x_small, jnp.asarray(wq8),
                                     jnp.asarray(s8), bits=8))
    rel = np.abs(y8 - ref_small).max() / np.abs(ref_small).max()
    print(f"int8 per-channel: rel err {rel:.4f} (weights 2x smaller)")
    assert rel < 0.02

    # --- weight-only int4, group-wise scales --------------------------
    wq4, s4 = quantize_weights(w, bits=4, group_size=128)
    assert wq4.shape == (K // 2, N)          # two K-rows per byte
    y4 = np.asarray(matmul_quantized(x_small, jnp.asarray(wq4),
                                     jnp.asarray(s4), bits=4,
                                     group_size=128))
    rel = np.abs(y4 - ref_small).max() / np.abs(ref_small).max()
    print(f"int4 g=128: rel err {rel:.4f} (weights 4x smaller)")
    assert rel < 0.15

    # The kernel is exact vs the quantized weights — the error above is
    # the quantization itself.
    exact = np.asarray(x_small) @ dequantize_weights(wq4, s4, bits=4,
                                                     group_size=128)
    kerr = np.abs(y4 - exact).max() / np.abs(exact).max()
    print(f"int4 kernel vs host-dequant oracle: {kerr:.2e}")
    assert kerr < 1e-4

    # --- W8A8: large-batch compute-bound mode -------------------------
    x_big = jnp.asarray(rng.standard_normal((128, K)), jnp.float32)
    ref_big = np.asarray(x_big) @ w
    y88 = np.asarray(matmul_w8a8(x_big, jnp.asarray(wq8),
                                 jnp.asarray(s8)))
    rel = np.abs(y88 - ref_big).max() / np.abs(ref_big).max()
    print(f"W8A8 (dynamic per-row activation quant): rel err {rel:.4f} "
          "(int8 MXU engine)")
    assert rel < 0.04
    print("OK")


if __name__ == "__main__":
    main()
