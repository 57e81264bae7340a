"""End-to-end min_plus block/chunk retune after the VMEM-check removal.

experiments/vpu_ceiling2.py proved Mosaic fuses the (bm, ck, bn) mapped
intermediate (no VMEM residency), so K-chunks wider than the old
VMEM-feasibility cap are now legal end-to-end.  Sweep (bm, bn, bk, ck)
at 4096^3 fp32 against the prior shipped config (16, 2048, 2048, ck=512,
4.59-4.66 TOp/s).

Usage: python experiments/minplus_retune.py [N]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from gemm_hls_tpu import GemmConfig
from gemm_hls_tpu.ops.pallas_vpu import vpu_matmul
from gemm_hls_tpu.ops.semiring import get_semiring
from gemm_hls_tpu.utils.benchmark import time_fn

VMEM = 128 * 1024 * 1024
MP = get_semiring("min_plus")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(1, 10, (n, n)).astype(np.float32))
    b = jnp.asarray(rng.uniform(1, 10, (n, n)).astype(np.float32))
    jax.block_until_ready((a, b))
    ops = 2.0 * n * n * n
    sample = np.minimum.reduce(
        np.asarray(a)[:8, :, None] + np.asarray(b)[None, :, :8], axis=1)

    combos = [
        (16, 2048, 2048, 512),    # prior shipped default
        (16, 2048, 2048, 1024),
        (16, 2048, 2048, 2048),
        (32, 2048, 2048, 1024),
        (32, 2048, 2048, 2048),
        (64, 2048, 2048, 1024),
        (64, 2048, 2048, 2048),
        (128, 2048, 2048, 1024),
        (16, 4096, 4096, 1024),
        (32, 2048, 4096, 1024),
        (64, 2048, 4096, 2048),
    ]
    for bm, bn, bk, ck in combos:
        if n % bm or n % bn or n % bk or bk % ck:
            continue
        try:
            cfg = GemmConfig(dtype="float32", semiring="min_plus",
                             block_m=bm, block_n=bn, block_k=bk,
                             vmem_limit_bytes=VMEM)
            fn = jax.jit(lambda x, y, c=cfg, k=ck: vpu_matmul(
                x, y, cfg=c, sr=MP, k_actual=n, ck=k))
            out = fn(a, b)
            np.testing.assert_allclose(np.asarray(out)[:8, :8], sample,
                                       rtol=1e-6)
            meds = sorted(ops / time_fn(fn, [(a, b)], iters=8) / 1e12
                          for _ in range(3))
            print(f"bm={bm:3d} bn={bn} bk={bk} ck={ck:4d}: "
                  f"{meds[1]:5.2f} TOp/s  (spread {meds[0]:.2f}-"
                  f"{meds[2]:.2f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bm={bm} bn={bn} bk={bk} ck={ck}: FAIL "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
