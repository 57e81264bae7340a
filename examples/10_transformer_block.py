"""A transformer block on the CA-GEMM kernels: every matmul in one
attention + MLP block routed through ``gemm_hls_tpu.matmul`` — fused
bias epilogues for the projections, batched (vmapped) GEMM for the
per-head attention products.

This is the LLM-shaped usage the rectangular benchmark suite measures
(`experiments/rect_bench.py`: qkv / mlp-up / mlp-down / wide-N head
shapes run at 0.98-1.09x XLA's dot on v5e).

    python examples/10_transformer_block.py
"""

import jax
import jax.numpy as jnp

from gemm_hls_tpu import matmul

# Tiny config so the example runs anywhere (CPU interpreter included);
# scale dims up on a real chip.
BATCH, SEQ, D_MODEL, N_HEADS, D_FF = 2, 128, 256, 4, 1024
D_HEAD = D_MODEL // N_HEADS
DTYPE = jnp.bfloat16


def _bias(acc, b):
    return acc + b


def _bias_gelu(acc, b):
    return jax.nn.gelu(acc + b)


def linear(x, w, b):
    """(tokens, d_in) @ (d_in, d_out) with the bias add fused into the
    kernel's output store (saves one HBM round trip of the activations)."""
    return matmul(x, w, epilogue=_bias, epilogue_operands=(b,),
                  out_dtype=x.dtype)


def attention(x, wq, wk, wv, wo, bq, bk_, bv, bo):
    tokens = x.reshape(-1, D_MODEL)                      # (B*S, D)
    q = linear(tokens, wq, bq).reshape(BATCH, SEQ, N_HEADS, D_HEAD)
    k = linear(tokens, wk, bk_).reshape(BATCH, SEQ, N_HEADS, D_HEAD)
    v = linear(tokens, wv, bv).reshape(BATCH, SEQ, N_HEADS, D_HEAD)

    # (B*H, S, D_HEAD): the batched 3-D form dispatches one vmapped
    # Pallas kernel per product — scores = Q.K^T uses the zero-copy
    # transpose_b index-map path, no materialized transpose.
    q = q.transpose(0, 2, 1, 3).reshape(-1, SEQ, D_HEAD)
    k = k.transpose(0, 2, 1, 3).reshape(-1, SEQ, D_HEAD)
    v = v.transpose(0, 2, 1, 3).reshape(-1, SEQ, D_HEAD)

    scores = matmul(q, k, transpose_b=True, out_dtype=jnp.float32)
    probs = jax.nn.softmax(scores / jnp.sqrt(jnp.float32(D_HEAD)), axis=-1)
    ctx = matmul(probs.astype(DTYPE), v, out_dtype=DTYPE)  # (B*H, S, D_HEAD)

    ctx = (ctx.reshape(BATCH, N_HEADS, SEQ, D_HEAD)
              .transpose(0, 2, 1, 3).reshape(-1, D_MODEL))
    return linear(ctx, wo, bo).reshape(BATCH, SEQ, D_MODEL)


def mlp(x, w_up, b_up, w_down, b_down):
    tokens = x.reshape(-1, D_MODEL)
    # Module-level epilogue (not a fresh lambda) so repeated calls hit the
    # same jit cache entry.
    h = matmul(tokens, w_up, epilogue=_bias_gelu,
               epilogue_operands=(b_up,), out_dtype=DTYPE)
    return linear(h, w_down, b_down).reshape(BATCH, SEQ, D_MODEL)


def block(x, params):
    x = x + attention(_norm(x), *params["attn"])
    return x + mlp(_norm(x), *params["mlp"])


def _norm(x):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def init(key):
    ks = jax.random.split(key, 6)
    s = lambda k, shape: (jax.random.normal(k, shape, DTYPE)  # noqa: E731
                          * (0.02 if len(shape) > 1 else 0.0))
    return {
        "attn": (s(ks[0], (D_MODEL, D_MODEL)), s(ks[1], (D_MODEL, D_MODEL)),
                 s(ks[2], (D_MODEL, D_MODEL)), s(ks[3], (D_MODEL, D_MODEL)),
                 jnp.zeros((D_MODEL,), DTYPE), jnp.zeros((D_MODEL,), DTYPE),
                 jnp.zeros((D_MODEL,), DTYPE), jnp.zeros((D_MODEL,), DTYPE)),
        "mlp": (s(ks[4], (D_MODEL, D_FF)), jnp.zeros((D_FF,), DTYPE),
                s(ks[5], (D_FF, D_MODEL)), jnp.zeros((D_MODEL,), DTYPE)),
    }


def main():
    params = init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SEQ, D_MODEL), DTYPE)
    out = jax.jit(block)(x, params)
    print(f"transformer block: {x.shape} {x.dtype} -> {out.shape} {out.dtype}")

    # Cross-check against plain jnp on the same params.
    def ref_linear(t, w, b):
        return (t.astype(jnp.float32) @ w.astype(jnp.float32)
                + b.astype(jnp.float32)).astype(DTYPE)

    def ref_block(x, p):
        wq, wk, wv, wo, bq, bk_, bv, bo = p["attn"]
        t = _norm(x).reshape(-1, D_MODEL)
        q = ref_linear(t, wq, bq).reshape(BATCH, SEQ, N_HEADS, D_HEAD)
        k = ref_linear(t, wk, bk_).reshape(BATCH, SEQ, N_HEADS, D_HEAD)
        v = ref_linear(t, wv, bv).reshape(BATCH, SEQ, N_HEADS, D_HEAD)
        q, k, v = (a.transpose(0, 2, 1, 3).reshape(-1, SEQ, D_HEAD)
                   for a in (q, k, v))
        sc = jnp.einsum("bsd,btd->bst", q.astype(jnp.float32),
                        k.astype(jnp.float32))
        pr = jax.nn.softmax(sc / jnp.sqrt(jnp.float32(D_HEAD)), -1)
        ctx = jnp.einsum("bst,btd->bsd", pr, v.astype(jnp.float32))
        ctx = (ctx.astype(DTYPE).reshape(BATCH, N_HEADS, SEQ, D_HEAD)
                  .transpose(0, 2, 1, 3).reshape(-1, D_MODEL))
        y = x + ref_linear(ctx, wo, bo).reshape(BATCH, SEQ, D_MODEL)
        w_up, b_up, w_down, b_down = p["mlp"]
        t2 = _norm(y).reshape(-1, D_MODEL)
        h = jax.nn.gelu(t2.astype(jnp.float32) @ w_up.astype(jnp.float32)
                        + b_up.astype(jnp.float32)).astype(DTYPE)
        return y + ref_linear(h, w_down, b_down).reshape(BATCH, SEQ, D_MODEL)

    exp = jax.jit(ref_block)(x, params)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - exp.astype(jnp.float32))))
    print(f"max abs diff vs jnp reference: {err:.3e}")
    assert err < 0.1, err
    print("OK")


if __name__ == "__main__":
    main()
