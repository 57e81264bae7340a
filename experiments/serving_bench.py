"""Serving decoder-block bench: the framework stack vs XLA defaults.

The integration benchmark VERDICT r3 #8 asked for: one transformer
decoder block in serving configuration (examples/15_serving_decoder.py
scaled to production shapes), timed end-to-end on-chip against the
platform-default composition.

  prefill  (B=4, S=2048, d_model=4096, GQA 32/8 heads, MoE 8e top-2):
     ours = W8A8 projections + causal GQA flash + grouped-GEMM MoE
     xla  = bf16 jnp.dot + jax.nn.dot_product_attention + ragged_dot MoE
  decode   (64 sequences, 8k padded cache, per-example lengths):
     ours = int4 projections + padded-cache flash decode + grouped MoE
     xla  = bf16 jnp.dot + masked dot_product_attention + ragged_dot

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/serving_bench.py
"""

import functools
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

B, S = 4, 2048
D_MODEL, H_Q, H_KV, D_HEAD = 4096, 32, 8, 128
D_FF, N_EXP, TOP_K = 8192, 8, 2
B_DEC, S_CACHE = 64, 8192


def main():
    import jax
    import jax.numpy as jnp

    from gemm_hls_tpu import matmul_quantized, matmul_w8a8, quantize_weights
    from gemm_hls_tpu.models.moe import MoEConfig, init_moe_params, route
    from gemm_hls_tpu.ops.attention import flash_attention
    from gemm_hls_tpu.ops.grouped import grouped_matmul
    from gemm_hls_tpu.models.moe import _dispatch
    from gemm_hls_tpu.utils.benchmark import time_fn

    rng = np.random.default_rng(5)
    bf = jnp.bfloat16

    def w(shape, fan):
        return (rng.standard_normal(shape) / np.sqrt(fan)).astype(
            np.float32)

    dense = {
        "wq": w((D_MODEL, H_Q * D_HEAD), D_MODEL),
        "wk": w((D_MODEL, H_KV * D_HEAD), D_MODEL),
        "wv": w((D_MODEL, H_KV * D_HEAD), D_MODEL),
        "wo": w((H_Q * D_HEAD, D_MODEL), H_Q * D_HEAD),
    }
    q8 = {k: tuple(map(jnp.asarray, quantize_weights(v, bits=8)))
          for k, v in dense.items()}
    q4 = {k: tuple(map(jnp.asarray, quantize_weights(v, bits=4,
                                                     group_size=128)))
          for k, v in dense.items()}
    dense = {k: jnp.asarray(v, bf) for k, v in dense.items()}

    mcfg = MoEConfig(d_model=D_MODEL, d_ff=D_FF, num_experts=N_EXP,
                     top_k=TOP_K, dtype="bfloat16")
    moe = init_moe_params(jax.random.key(0), mcfg)

    def split(x, h, b, s):
        return x.reshape(b, s, h, D_HEAD).transpose(0, 2, 1, 3).reshape(
            b * h, s, D_HEAD)

    def merge(x, b):
        bh, s, d = x.shape
        return x.reshape(b, bh // b, s, d).transpose(0, 2, 1, 3).reshape(
            b, s, -1)

    def moe_ours(y_flat):
        ids, mix = route(y_flat, moe["router"], N_EXP, TOP_K)
        xs, sizes, inv = _dispatch(y_flat, ids, N_EXP)
        h = grouped_matmul(xs, moe["w1"], sizes)
        h = jax.nn.gelu(h).astype(bf)
        ys = grouped_matmul(h, moe["w2"], sizes)
        y = jnp.take(ys, inv, axis=0).reshape(y_flat.shape[0], TOP_K, -1)
        return jnp.sum(y * mix[..., None].astype(y.dtype), axis=1)

    def moe_xla(y_flat):
        ids, mix = route(y_flat, moe["router"], N_EXP, TOP_K)
        xs, sizes, inv = _dispatch(y_flat, ids, N_EXP)
        h = jax.lax.ragged_dot(xs, moe["w1"], sizes)
        h = jax.nn.gelu(h).astype(bf)
        ys = jax.lax.ragged_dot(h, moe["w2"], sizes)
        y = jnp.take(ys, inv, axis=0).reshape(y_flat.shape[0], TOP_K, -1)
        return jnp.sum(y * mix[..., None].astype(y.dtype), axis=1)

    # ---------------- prefill ----------------
    x = jnp.asarray(rng.standard_normal((B, S, D_MODEL)) * 0.5, bf)

    @jax.jit
    def prefill_ours(x):
        flat = x.reshape(B * S, D_MODEL)
        q = matmul_w8a8(flat, *q8["wq"], out_dtype=bf)
        k = matmul_w8a8(flat, *q8["wk"], out_dtype=bf)
        v = matmul_w8a8(flat, *q8["wv"], out_dtype=bf)
        att = flash_attention(split(q, H_Q, B, S), split(k, H_KV, B, S),
                              split(v, H_KV, B, S), causal=True)
        att = merge(att, B).reshape(B * S, -1)
        y = x + matmul_w8a8(att, *q8["wo"], out_dtype=bf).reshape(x.shape)
        return y + moe_ours(y.reshape(B * S, D_MODEL)).reshape(x.shape)

    @jax.jit
    def prefill_xla(x):
        flat = x.reshape(B * S, D_MODEL)
        q = jnp.dot(flat, dense["wq"])
        k = jnp.dot(flat, dense["wk"])
        v = jnp.dot(flat, dense["wv"])
        q4d = q.reshape(B, S, H_Q, D_HEAD)
        k4d = k.reshape(B, S, H_KV, D_HEAD)
        v4d = v.reshape(B, S, H_KV, D_HEAD)
        att = jax.nn.dot_product_attention(q4d, k4d, v4d, is_causal=True)
        att = att.reshape(B * S, -1)
        y = x + jnp.dot(att, dense["wo"]).reshape(x.shape)
        return y + moe_xla(y.reshape(B * S, D_MODEL)).reshape(x.shape)

    # FLOP count (proj + attention + moe), causal attention halved.
    proj_fl = 2 * B * S * D_MODEL * (H_Q + 2 * H_KV + H_Q) * D_HEAD
    att_fl = 4 * B * H_Q * S * S * D_HEAD // 2
    moe_fl = 2 * B * S * TOP_K * D_MODEL * D_FF * 2
    fl = proj_fl + att_fl + moe_fl

    for name, f in (("ours", prefill_ours), ("xla", prefill_xla)):
        y = f(x)
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
        t = time_fn(f, [(x,)], iters=max(8, int(2e13 / fl)))
        print(f"prefill {name}: {t * 1e3:.2f} ms -> {fl / t / 1e12:.1f} TF"
              f" (B={B}, S={S}, d={D_MODEL}, MoE {N_EXP}e top{TOP_K})",
              flush=True)

    # ---------------- decode ----------------
    xt = jnp.asarray(rng.standard_normal((B_DEC, D_MODEL)) * 0.5, bf)
    ck = jnp.asarray(rng.standard_normal(
        (B_DEC, S_CACHE, H_KV, D_HEAD)) * 0.3, bf)
    cv = jnp.asarray(rng.standard_normal(
        (B_DEC, S_CACHE, H_KV, D_HEAD)) * 0.3, bf)
    lens = jnp.asarray(rng.integers(S_CACHE // 2, S_CACHE, B_DEC),
                       jnp.int32)

    @jax.jit
    def decode_ours(xt, ck, cv, lens):
        q = matmul_quantized(xt, *q4["wq"], bits=4, group_size=128,
                             out_dtype=bf)
        k = matmul_quantized(xt, *q4["wk"], bits=4, group_size=128,
                             out_dtype=bf)
        v = matmul_quantized(xt, *q4["wv"], bits=4, group_size=128,
                             out_dtype=bf)
        idx = jnp.arange(B_DEC)
        ck = ck.at[idx, lens].set(k.reshape(B_DEC, H_KV, D_HEAD))
        cv = cv.at[idx, lens].set(v.reshape(B_DEC, H_KV, D_HEAD))
        att = flash_attention(q.reshape(B_DEC, 1, H_Q, D_HEAD), ck, cv,
                              causal=True, kv_lengths=lens + 1)
        att = att.reshape(B_DEC, -1)
        y = xt + matmul_quantized(att, *q4["wo"], bits=4, group_size=128,
                                  out_dtype=bf)
        return y + moe_ours(y)

    @jax.jit
    def decode_xla(xt, ck, cv, lens):
        q = jnp.dot(xt, dense["wq"])
        k = jnp.dot(xt, dense["wk"])
        v = jnp.dot(xt, dense["wv"])
        idx = jnp.arange(B_DEC)
        ck = ck.at[idx, lens].set(k.reshape(B_DEC, H_KV, D_HEAD))
        cv = cv.at[idx, lens].set(v.reshape(B_DEC, H_KV, D_HEAD))
        mask = (jnp.arange(S_CACHE)[None, :] < (lens + 1)[:, None])
        att = jax.nn.dot_product_attention(
            q.reshape(B_DEC, 1, H_Q, D_HEAD), ck, cv,
            mask=mask[:, None, None, :])
        att = att.reshape(B_DEC, -1)
        y = xt + jnp.dot(att, dense["wo"])
        return y + moe_xla(y)

    for name, f in (("ours", decode_ours), ("xla", decode_xla)):
        y = f(xt, ck, cv, lens)
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
        t = time_fn(f, [(xt, ck, cv, lens)], iters=64)
        print(f"decode {name}: {t * 1e6:.0f} us/token-batch "
              f"(B={B_DEC}, cache {S_CACHE}, int4 proj)", flush=True)


if __name__ == "__main__":
    main()
