"""A serving decoder block: the quantized + flash + MoE stack composed.

End-to-end integration of the framework's serving path — one transformer
decoder block in the configuration a production server would run:

* **GQA attention** on the flash kernel (`ops/pallas_flash.py`):
  causal prefill, then padded-cache decode with per-example
  ``kv_lengths`` (each sequence's cache ends mid-buffer).
* **Quantized projections** (`ops/quant.py`): W8A8 on the int8 MXU
  engine for prefill (compute-bound, M = B·S rows), weight-only int4
  for decode (weight-bandwidth-bound, M = B rows) — same int8 weights,
  two execution strategies.
* **MoE FFN** on the grouped CA-GEMM (`ops/grouped.py` +
  `models/moe.py`): top-2 of 8 experts, tokens sorted by expert,
  one static-shape ragged kernel for any routing.

Everything is verified against a dense float32 XLA reference of the
same block; the only error budget is the quantization itself.

    python examples/15_serving_decoder.py

On a real TPU, `experiments/serving_bench.py` benchmarks this block
against the XLA-default composition (jnp.dot +
jax.nn.dot_product_attention).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gemm_hls_tpu import quantize_weights, matmul_quantized, matmul_w8a8
from gemm_hls_tpu.models.moe import MoEConfig, init_moe_params, moe_forward
from gemm_hls_tpu.ops.attention import flash_attention
from gemm_hls_tpu.ops.quant import dequantize_weights

B, S, S_MAX = 2, 64, 96          # batch, prefill length, cache capacity
H_Q, H_KV, D_HEAD = 8, 2, 32     # GQA: 8 query heads share 2 kv heads
D = H_Q * D_HEAD                 # d_model


def make_block(rng):
    """Weights: attention projections (quantized) + an 8-expert MoE."""
    def w(shape, fan_in):
        return (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(
            np.float32)

    wq = w((D, H_Q * D_HEAD), D)
    wk = w((D, H_KV * D_HEAD), D)
    wv = w((D, H_KV * D_HEAD), D)
    wo = w((H_Q * D_HEAD, D), H_Q * D_HEAD)
    quant = {name: quantize_weights(mat, bits=8)
             for name, mat in dict(wq=wq, wk=wk, wv=wv, wo=wo).items()}
    quant4 = {name: quantize_weights(mat, bits=4, group_size=32)
              for name, mat in dict(wq=wq, wk=wk, wv=wv, wo=wo).items()}
    moe_cfg = MoEConfig(d_model=D, d_ff=2 * D, num_experts=8, top_k=2,
                        dtype="float32")
    moe = init_moe_params(jax.random.key(0), moe_cfg)
    dense = dict(wq=wq, wk=wk, wv=wv, wo=wo)
    return dense, quant, quant4, moe, moe_cfg


def split_heads(x, n_heads):
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, -1).transpose(0, 2, 1, 3).reshape(
        b * n_heads, s, -1)


def merge_heads(x, b):
    bh, s, d = x.shape
    return x.reshape(b, bh // b, s, d).transpose(0, 2, 1, 3).reshape(
        b, s, -1)


def block_prefill(x, quant, moe, moe_cfg):
    """Prefill: W8A8 projections (M = B*S rows), causal flash, MoE."""
    b, s, _ = x.shape
    flat = x.reshape(b * s, D)
    proj = {k: matmul_w8a8(flat, jnp.asarray(wq), jnp.asarray(sc))
            for k, (wq, sc) in quant.items() if k != "wo"}
    q = split_heads(proj["wq"].reshape(b, s, -1).astype(jnp.float32), H_Q)
    k = split_heads(proj["wk"].reshape(b, s, -1).astype(jnp.float32), H_KV)
    v = split_heads(proj["wv"].reshape(b, s, -1).astype(jnp.float32), H_KV)
    att = flash_attention(q, k, v, causal=True, block_q=32, block_kv=32)
    att = merge_heads(att, b).reshape(b * s, -1)
    wo_q, wo_s = quant["wo"]
    out = matmul_w8a8(att.astype(jnp.float32), jnp.asarray(wo_q),
                      jnp.asarray(wo_s))
    y = x + out.reshape(b, s, D).astype(x.dtype)          # residual
    ffn = moe_forward(moe, y.reshape(b * s, D), moe_cfg)
    return y + ffn.reshape(b, s, D), y, k, v


def block_decode(x_tok, cache_k, cache_v, lengths, quant4, moe, moe_cfg):
    """One-token decode: int4 projections (M = B rows), padded-cache
    flash with per-example logical lengths (bottom-right anchoring)."""
    b = x_tok.shape[0]
    proj = {k: matmul_quantized(x_tok, jnp.asarray(wq), jnp.asarray(sc),
                                bits=4, group_size=32)
            for k, (wq, sc) in quant4.items() if k != "wo"}
    q = proj["wq"].reshape(b, 1, H_Q, D_HEAD).astype(jnp.float32)
    k_new = proj["wk"].reshape(b, 1, H_KV, D_HEAD).astype(jnp.float32)
    v_new = proj["wv"].reshape(b, 1, H_KV, D_HEAD).astype(jnp.float32)
    # Write the new token at each sequence's logical end.
    idx = lengths  # (b,)
    cache_k = cache_k.at[jnp.arange(b), idx].set(k_new[:, 0])
    cache_v = cache_v.at[jnp.arange(b), idx].set(v_new[:, 0])
    lengths = lengths + 1
    # 4-D layout: (batch, seq, heads, dim); per-example lengths mask the
    # cache tail, causal anchors the query at the cache end.
    att = flash_attention(q, cache_k, cache_v, causal=True,
                          kv_lengths=lengths, block_q=32, block_kv=32)
    att = att.reshape(b, H_Q * D_HEAD)
    wo_q, wo_s = quant4["wo"]
    out = matmul_quantized(att.astype(jnp.float32), jnp.asarray(wo_q),
                           jnp.asarray(wo_s), bits=4, group_size=32)
    y = x_tok + out.astype(x_tok.dtype)
    ffn = moe_forward(moe, y, moe_cfg)
    return y + ffn, cache_k, cache_v, lengths


def ref_block(x, dense, moe, moe_cfg):
    """Dense f32 XLA reference of the same prefill block."""
    b, s, _ = x.shape
    flat = x.reshape(b * s, D)
    q = split_heads((flat @ dense["wq"]).reshape(b, s, -1), H_Q)
    k = split_heads((flat @ dense["wk"]).reshape(b, s, -1), H_KV)
    v = split_heads((flat @ dense["wv"]).reshape(b, s, -1), H_KV)
    k = jnp.repeat(k.reshape(b, H_KV, s, -1), H_Q // H_KV, axis=1
                   ).reshape(b * H_Q, s, -1)
    v = jnp.repeat(v.reshape(b, H_KV, s, -1), H_Q // H_KV, axis=1
                   ).reshape(b * H_Q, s, -1)
    sc = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(D_HEAD)
    mask = jnp.tril(jnp.ones((s, s), bool))
    p = jax.nn.softmax(jnp.where(mask, sc, -jnp.inf), axis=-1)
    att = merge_heads(jnp.einsum("bqk,bkd->bqd", p, v), b).reshape(
        b * s, -1)
    y = x + (att @ dense["wo"]).reshape(b, s, D)
    ffn = moe_forward(moe, y.reshape(b * s, D), moe_cfg)
    return y + ffn.reshape(b, s, D), y


def main():
    rng = np.random.default_rng(5)
    dense, quant, quant4, moe, moe_cfg = make_block(rng)
    x = jnp.asarray(rng.standard_normal((B, S, D)) * 0.5, jnp.float32)

    # --- prefill ------------------------------------------------------
    y, y_attn, k_pre, v_pre = block_prefill(x, quant, moe, moe_cfg)
    want, want_attn = ref_block(x, dense, moe, moe_cfg)
    rel_attn = float(jnp.abs(y_attn - want_attn).max()
                     / jnp.abs(want_attn).max())
    print(f"prefill attention (W8A8 proj + causal GQA flash): "
          f"rel err {rel_attn:.4f}")
    assert rel_attn < 0.05, rel_attn        # W8A8 quantization budget
    # After the MoE the discrete top-k routing can FLIP for tokens whose
    # router logits sit within the ~1% quantization perturbation — a
    # real serving phenomenon; judge the block by the token-median
    # error, and count the flipped outliers.
    tok_err = (jnp.abs(y - want).max(-1)
               / jnp.abs(want).max()).reshape(-1)
    med = float(jnp.median(tok_err))
    frac_flipped = float(jnp.mean(tok_err > 0.1))
    print(f"prefill full block: median token err {med:.4f}, "
          f"{frac_flipped:.1%} tokens routing-flipped")
    assert med < 0.05, med
    assert frac_flipped < 0.1, frac_flipped

    # --- decode against a padded cache --------------------------------
    # Seed the cache with the prefill's K/V, logical lengths = S.
    cache_k = jnp.zeros((B, S_MAX, H_KV, D_HEAD), jnp.float32)
    cache_v = jnp.zeros((B, S_MAX, H_KV, D_HEAD), jnp.float32)
    k4 = k_pre.reshape(B, H_KV, S, D_HEAD).transpose(0, 2, 1, 3)
    v4 = v_pre.reshape(B, H_KV, S, D_HEAD).transpose(0, 2, 1, 3)
    cache_k = cache_k.at[:, :S].set(k4)
    cache_v = cache_v.at[:, :S].set(v4)
    lengths = jnp.full((B,), S, jnp.int32)

    # Stagger the logical lengths so the padded-cache masking is real.
    lengths = jnp.asarray([S, S - 17], jnp.int32)

    x_tok = jnp.asarray(rng.standard_normal((B, D)) * 0.5, jnp.float32)
    y_tok, cache_k2, cache_v2, lengths2 = block_decode(
        x_tok, cache_k, cache_v, lengths, quant4, moe, moe_cfg)

    # Decode reference: dense attention over each example's ragged
    # logical prefix, int4 weights dequantized on the host — the kernels
    # are exact against the quantized weights, so this matches to fp
    # error, not a quantization budget.
    d4 = {k: jnp.asarray(dequantize_weights(wq, sc, bits=4,
                                            group_size=32))
          for k, (wq, sc) in quant4.items()}
    q_r = (x_tok @ d4["wq"]).reshape(B, H_Q, D_HEAD)
    k_r = (x_tok @ d4["wk"]).reshape(B, H_KV, D_HEAD)
    v_r = (x_tok @ d4["wv"]).reshape(B, H_KV, D_HEAD)
    att_rows = []
    for i in range(B):
        L = int(lengths[i])
        kk = jnp.concatenate([cache_k[i, :L], k_r[i][None]], axis=0)
        vv = jnp.concatenate([cache_v[i, :L], v_r[i][None]], axis=0)
        kk = jnp.repeat(kk, H_Q // H_KV, axis=1)          # (L+1, H_Q, d)
        vv = jnp.repeat(vv, H_Q // H_KV, axis=1)
        sc_i = jnp.einsum("hd,khd->hk", q_r[i], kk) / np.sqrt(D_HEAD)
        p = jax.nn.softmax(sc_i, axis=-1)
        att_rows.append(jnp.einsum("hk,khd->hd", p, vv).reshape(-1))
    att_ref = jnp.stack(att_rows)
    y_ref = x_tok + att_ref @ d4["wo"]
    y_ref = y_ref + moe_forward(moe, y_ref, moe_cfg)
    rel = float(jnp.abs(y_tok - y_ref).max() / jnp.abs(y_ref).max())
    print(f"decode (int4 proj + padded-cache flash + MoE): rel err "
          f"{rel:.2e} vs ragged dense reference")
    assert rel < 1e-3, rel

    x_tok2, lengths = y_tok, lengths2
    for _ in range(2):
        x_tok2, cache_k2, cache_v2, lengths = block_decode(
            x_tok2, cache_k2, cache_v2, lengths, quant4, moe, moe_cfg)
        assert bool(jnp.isfinite(x_tok2).all())
    print(f"decode x3: lengths {lengths.tolist()}, output finite")
    print("serving decoder block OK")


if __name__ == "__main__":
    main()
