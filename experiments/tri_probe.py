"""Isolate the cost legs of the triangular (flattened-grid) causal flash
kernel: rectangular pl.when grid vs flattened live-block grid vs the
edge/interior branch split.

Variants (same shape, same blocks):
  rect      — the rectangular-grid kernel (forced via offsets=(0,0),
              which routes to the legacy path with identical masks)
  tri       — the shipping flattened path (mask-skip flags as built)
  tri_edge  — flattened, but every step flagged edge (always masks):
              isolates the branch-split cost vs tri
  tri_full  — flattened over the FULL rectangle (dead blocks included,
              all edge): isolates flattening overhead vs rect

Usage: python experiments/tri_probe.py [--b 16 --s 2048 --d 128]
"""

import argparse
import statistics
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--blocks", default="1024:1024,512:1024,512:512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu.ops import pallas_flash as pf
    from gemm_hls_tpu.ops.attention import flash_attention
    from gemm_hls_tpu.utils.benchmark import time_fn

    B, S, D = args.b, args.s, args.d
    flops = 4 * B * S * S * D / 2
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)

    orig_tables = pf._tri_tables

    def all_edge(*a, **kw):
        t = orig_tables(*a, **kw)
        t[2, :-1] = 1
        return t

    def full_rect(n_q, n_kv, block_q, block_kv, window, kv_rem=0, *,
                  order="qmajor"):
        ii, jj = np.meshgrid(np.arange(n_q), np.arange(n_kv),
                             indexing="ij")
        t = np.empty((3, n_q * n_kv + 1), np.int32)
        t[0, :-1] = ii.ravel()
        t[1, :-1] = jj.ravel()
        t[2, :-1] = 1
        t[:, -1] = (n_q, 0, 0)
        return t

    pairs = [tuple(map(int, p.split(":"))) for p in args.blocks.split(",")]
    iters = max(30, int(2e12 / flops))
    for bq, bkv in pairs:
        variants = {}

        def fl(q, k, v, bq=bq, bkv=bkv):
            return flash_attention(q, k, v, causal=True, block_q=bq,
                                   block_kv=bkv)

        def rect(q, k, v, bq=bq, bkv=bkv):
            return flash_attention(q, k, v, causal=True, block_q=bq,
                                   block_kv=bkv)

        results = {}
        for name, tab_fn in [("rect", None), ("tri", orig_tables),
                             ("tri_edge", all_edge),
                             ("tri_full", full_rect)]:
            jax.clear_caches()
            pf._tri_tables = tab_fn or orig_tables
            if name == "rect":
                # offsets route: rectangular grid, same causal mask.
                fn = jax.jit(lambda q, k, v, bq=bq, bkv=bkv: pf.flash_mha(
                    (q * (1.0 / np.sqrt(D))).astype(q.dtype), k, v,
                    offsets=jnp.zeros((2,), jnp.int32),
                    cfg=__import__(
                        "gemm_hls_tpu.config", fromlist=["default_config"]
                    ).default_config("bfloat16").replace(
                        out_dtype="bfloat16"),
                    causal=True, block_q=bq, block_kv=bkv))
            else:
                fn = jax.jit(fl)
            out = np.asarray(fn(q, k, v), np.float32)
            samples = []
            for _ in range(args.rounds):
                t = time_fn(fn, [(q, k, v)], iters=iters)
                samples.append(flops / t / 1e12)
            results[name] = statistics.median(samples)
        pf._tri_tables = orig_tables
        print(f"blocks {bq}x{bkv}: " + "  ".join(
            f"{n}={v:.1f}TF" for n, v in results.items()), flush=True)


if __name__ == "__main__":
    main()
