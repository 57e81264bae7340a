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

# Sized to what the remote compile helper digests in one program: the
# 4096-d_model / 8192-d_ff variant reproducibly kills the relay's
# tpu_compile_helper ("Broken pipe") on the fused prefill program.
B, S = 4, 1024
D_MODEL, H_Q, H_KV, D_HEAD = 2048, 16, 4, 128
D_FF, N_EXP, TOP_K = 4096, 8, 2
B_DEC, S_CACHE = 64, 4096


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

    def moe_ours(moe, y_flat):
        ids, mix = route(y_flat, moe["router"], N_EXP, TOP_K)
        xs, sizes, inv = _dispatch(y_flat, ids, N_EXP)
        h = grouped_matmul(xs, moe["w1"], sizes)
        h = jax.nn.gelu(h).astype(bf)
        ys = grouped_matmul(h, moe["w2"], sizes)
        y = jnp.take(ys, inv, axis=0).reshape(y_flat.shape[0], TOP_K, -1)
        return jnp.sum(y * mix[..., None].astype(y.dtype), axis=1)

    def moe_xla(moe, y_flat):
        ids, mix = route(y_flat, moe["router"], N_EXP, TOP_K)
        xs, sizes, inv = _dispatch(y_flat, ids, N_EXP)
        h = jax.lax.ragged_dot(xs, moe["w1"], sizes)
        h = jax.nn.gelu(h).astype(bf)
        ys = jax.lax.ragged_dot(h, moe["w2"], sizes)
        y = jnp.take(ys, inv, axis=0).reshape(y_flat.shape[0], TOP_K, -1)
        return jnp.sum(y * mix[..., None].astype(y.dtype), axis=1)

    # ---------------- prefill ----------------
    # Weights ride as ARGUMENTS, never closures: a closed-over weight
    # becomes an HLO literal constant and the remote compile request
    # blows the relay's body limit (observed HTTP 413).
    x = jnp.asarray(rng.standard_normal((B, S, D_MODEL)) * 0.5, bf)

    @jax.jit
    def prefill_ours(x, q8, moe):
        flat = x.reshape(B * S, D_MODEL)
        q = matmul_w8a8(flat, *q8["wq"], out_dtype=bf)
        k = matmul_w8a8(flat, *q8["wk"], out_dtype=bf)
        v = matmul_w8a8(flat, *q8["wv"], out_dtype=bf)
        att = flash_attention(split(q, H_Q, B, S), split(k, H_KV, B, S),
                              split(v, H_KV, B, S), causal=True)
        att = merge(att, B).reshape(B * S, -1)
        y = x + matmul_w8a8(att, *q8["wo"], out_dtype=bf).reshape(x.shape)
        return y + moe_ours(moe, y.reshape(B * S, D_MODEL)).reshape(x.shape)

    @jax.jit
    def prefill_xla(x, dense, moe):
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
        return y + moe_xla(moe, y.reshape(B * S, D_MODEL)).reshape(x.shape)

    # FLOP count (proj + attention + moe), causal attention halved.
    proj_fl = 2 * B * S * D_MODEL * (H_Q + 2 * H_KV + H_Q) * D_HEAD
    att_fl = 4 * B * H_Q * S * S * D_HEAD // 2
    moe_fl = 2 * B * S * TOP_K * D_MODEL * D_FF * 2
    fl = proj_fl + att_fl + moe_fl

    # init_moe_params(dtype="bfloat16") already gives bf16 experts + a
    # f32 router.
    moe_bf = moe
    for name, f, wargs in (("ours", prefill_ours, (x, q8, moe_bf)),
                           ("xla", prefill_xla, (x, dense, moe_bf))):
        y = f(*wargs)
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
        t = time_fn(f, [wargs], iters=max(8, int(2e13 / fl)))
        print(f"prefill {name}: {t * 1e3:.2f} ms -> {fl / t / 1e12:.1f} TF"
              f" (B={B}, S={S}, d={D_MODEL}, MoE {N_EXP}e top{TOP_K})",
              flush=True)

    # ---------------- decode ----------------
    # A REAL decode loop: lax.scan with the KV cache as carry, so cache
    # updates are in-place (functional one-shot scatters copy the whole
    # 268 MB cache per call — an artifact a server never pays; measured
    # 806 us/copy here).  Each stack owns its natural cache layout:
    # ours keeps (B*H_kv, S, D) (the flash kernel's packing, so the
    # update is a pure row write and NO transpose happens); XLA keeps
    # (B, S, H_kv, D) (jax.nn.dot_product_attention's layout).
    T_STEPS = 8
    xt0 = jnp.asarray(rng.standard_normal((B_DEC, D_MODEL)) * 0.5, bf)
    ck0 = jnp.asarray(rng.standard_normal(
        (B_DEC, S_CACHE, H_KV, D_HEAD)) * 0.3, bf)
    cv0 = jnp.asarray(rng.standard_normal(
        (B_DEC, S_CACHE, H_KV, D_HEAD)) * 0.3, bf)
    lens0 = jnp.asarray(rng.integers(S_CACHE // 2, S_CACHE - T_STEPS - 1,
                                     B_DEC), jnp.int32)
    ours_ck0 = ck0.transpose(0, 2, 1, 3).reshape(B_DEC * H_KV, S_CACHE,
                                                 D_HEAD)
    ours_cv0 = cv0.transpose(0, 2, 1, 3).reshape(B_DEC * H_KV, S_CACHE,
                                                 D_HEAD)

    @jax.jit
    def decode_ours(xt, ck, cv, lens, q4, moe):
        """T_STEPS tokens; carry = (xt, packed caches, lengths)."""
        def step(carry, _):
            xt, ck, cv, lens = carry
            mq = lambda x, t: matmul_quantized(        # noqa: E731
                x, *t, bits=4, group_size=128, out_dtype=bf)
            q = mq(xt, q4["wq"])
            k = mq(xt, q4["wk"]).reshape(B_DEC * H_KV, D_HEAD)
            v = mq(xt, q4["wv"]).reshape(B_DEC * H_KV, D_HEAD)
            lens_h = jnp.repeat(lens, H_KV)
            rows = jnp.arange(B_DEC * H_KV)
            ck = ck.at[rows, lens_h].set(k)
            cv = cv.at[rows, lens_h].set(v)
            # Head-packed q rows: (B*H_kv, group, D) is a pure reshape.
            group = H_Q // H_KV
            qrows = q.reshape(B_DEC * H_KV, group, D_HEAD)
            att = flash_attention(qrows, ck, cv, kv_lengths=lens_h + 1)
            att = att.reshape(B_DEC, H_Q * D_HEAD)
            y = xt + mq(att, q4["wo"])
            y = y + moe_ours(moe, y)
            return (y, ck, cv, lens + 1), ()

        (y, ck, cv, lens), _ = jax.lax.scan(
            step, (xt, ck, cv, lens), None, length=T_STEPS)
        return y, lens

    @jax.jit
    def decode_xla(xt, ck, cv, lens, dense, moe):
        def step(carry, _):
            xt, ck, cv, lens = carry
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
            y = y + moe_xla(moe, y)
            return (y, ck, cv, lens + 1), ()

        (y, ck, cv, lens), _ = jax.lax.scan(
            step, (xt, ck, cv, lens), None, length=T_STEPS)
        return y, lens

    for name, f, wargs in (
            ("ours", decode_ours,
             (xt0, ours_ck0, ours_cv0, lens0, q4, moe_bf)),
            ("xla", decode_xla, (xt0, ck0, cv0, lens0, dense, moe_bf))):
        y, _ = f(*wargs)
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
        t = time_fn(f, [wargs], iters=16)
        print(f"decode {name}: {t / T_STEPS * 1e6:.0f} us/token-batch "
              f"(B={B_DEC}, cache {S_CACHE}, {T_STEPS}-step scan, "
              f"int4 proj)", flush=True)


if __name__ == "__main__":
    main()
