"""Flash attention: one-kernel streaming softmax(QKᵀ)V + flash backward.

CPU interpreter-mode validation (the reference's software-simulation
philosophy, ``test/TestSimulation.cpp``): same kernel source, f64-backed
numpy oracle, deliberately unaligned sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu.ops.attention import flash_attention

RNG = np.random.default_rng(5)


def _ref(q, k, v, scale=None, causal=False):
    q64 = np.asarray(q, np.float64)
    k64 = np.asarray(k, np.float64)
    v64 = np.asarray(v, np.float64)
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    s = q64 @ k64.transpose(0, 2, 1) * scale
    if causal:
        sq, sk = s.shape[1:]
        s = np.where(np.tril(np.ones((sq, sk), bool)), s, -np.inf)
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    return p @ v64


CASES = [
    # (B, Sq, Skv, D, bq, bkv, causal)
    (2, 128, 128, 64, 64, 64, False),      # streamed kv, aligned
    (2, 128, 128, 64, 64, 64, True),       # causal + block skip
    (1, 96, 150, 64, 64, 64, False),       # both seqs unaligned
    (1, 150, 150, 64, 64, 64, True),       # causal + kv overhang
    (2, 64, 256, 64, 64, 256, False),      # single-kv-block branch
    (1, 50, 70, 40, 32, 32, False),        # odd head dim
    (1, 1, 17, 64, 512, 1024, False),      # degenerate decode shape
]


@pytest.mark.parametrize("b,sq,skv,d,bq,bkv,causal", CASES)
def test_flash_forward(b, sq, skv, d, bq, bkv, causal):
    q = RNG.uniform(-2, 2, (b, sq, d)).astype(np.float32)
    k = RNG.uniform(-2, 2, (b, skv, d)).astype(np.float32)
    v = RNG.uniform(-2, 2, (b, skv, d)).astype(np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal=causal, block_q=bq, block_kv=bkv,
                          interpret=True)
    assert out.shape == (b, sq, d)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v, causal=causal),
                               rtol=1e-4, atol=1e-5)


def test_flash_custom_scale():
    q = RNG.uniform(-1, 1, (2, 64, 32)).astype(np.float32)
    k = RNG.uniform(-1, 1, (2, 64, 32)).astype(np.float32)
    v = RNG.uniform(-1, 1, (2, 64, 32)).astype(np.float32)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          scale=0.125, block_q=32, block_kv=32,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v, scale=0.125),
                               rtol=1e-4, atol=1e-5)


def test_flash_matches_unfused_attention_path():
    from gemm_hls_tpu.ops.attention import attention

    q = RNG.uniform(-1, 1, (2, 64, 64)).astype(np.float32)
    k = RNG.uniform(-1, 1, (2, 64, 64)).astype(np.float32)
    v = RNG.uniform(-1, 1, (2, 64, 64)).astype(np.float32)
    a = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        block_q=32, block_kv=32, interpret=True)
    b = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                  interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("b,sq,skv,d,bq,bkv,causal", [
    (2, 128, 128, 64, 64, 64, False),
    (2, 128, 128, 64, 64, 64, True),
    (1, 96, 150, 64, 64, 64, False),      # unaligned: q_rem + kv_rem paths
    (1, 150, 150, 64, 64, 64, True),
    (2, 64, 256, 64, 64, 256, False),     # n_kv == 1 and n_q == 1 branches
])
def test_flash_gradients_match_autodiff(b, sq, skv, d, bq, bkv, causal):
    q = jnp.asarray(RNG.uniform(-1, 1, (b, sq, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, skv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, skv, d)), jnp.float32)
    w = jnp.asarray(RNG.uniform(-1, 1, (b, sq, d)), jnp.float32)

    def ours(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal, block_q=bq,
                                       block_kv=bkv, interpret=True) * w)

    def ref(q, k, v):
        scale = 1.0 / np.sqrt(d)
        s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        if causal:
            s = jnp.where(jnp.tril(jnp.ones((sq, skv), bool)), s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) * w)

    g_ours = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("dq dk dv".split(), g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_flash_grad_zero_for_future_kv_under_causal():
    # Gradient must not flow to kv positions strictly after every query.
    sq, skv = 32, 64
    q = jnp.asarray(RNG.uniform(-1, 1, (1, sq, 64)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (1, skv, 64)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (1, skv, 64)), jnp.float32)

    def f(k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=32,
                                       block_kv=32, interpret=True) ** 2)

    dk, dv = jax.grad(f, argnums=(0, 1))(k, v)
    # Positions >= sq are never attended (q_pos max = sq-1 < kv_pos).
    np.testing.assert_array_equal(np.asarray(dk[0, sq:]), 0.0)
    np.testing.assert_array_equal(np.asarray(dv[0, sq:]), 0.0)


def test_flash_rejects_bad_shapes():
    q = jnp.zeros((2, 16, 8))
    with pytest.raises(ValueError):
        flash_attention(q, jnp.zeros((2, 16, 4)), jnp.zeros((2, 16, 4)),
                        interpret=True)
    with pytest.raises(ValueError):
        flash_attention(jnp.zeros((16, 8)), jnp.zeros((16, 8)),
                        jnp.zeros((16, 8)), interpret=True)


def test_flash_gqa_forward_matches_broadcast():
    # 8 q heads sharing 2 kv heads == explicitly broadcast kv.
    hq, hkv, s, d = 8, 2, 128, 64
    g = hq // hkv
    q = jnp.asarray(RNG.uniform(-1, 1, (hq, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (hkv, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (hkv, s, d)), jnp.float32)
    out = flash_attention(q, k, v, block_q=64, block_kv=64, interpret=True)
    kb = jnp.repeat(k, g, axis=0)
    vb = jnp.repeat(v, g, axis=0)
    ref = flash_attention(q, kb, vb, block_q=64, block_kv=64,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_flash_gqa_gradients():
    hq, hkv, s, d = 4, 2, 96, 32
    g = hq // hkv
    q = jnp.asarray(RNG.uniform(-1, 1, (hq, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (hkv, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (hkv, s, d)), jnp.float32)

    def ours(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=32, block_kv=32,
                                       interpret=True) ** 2)

    def ref(q, k, v):
        kb = jnp.repeat(k, g, axis=0)
        vb = jnp.repeat(v, g, axis=0)
        scale = 1.0 / np.sqrt(d)
        p = jax.nn.softmax(
            jnp.einsum("bqd,bkd->bqk", q, kb) * scale, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, vb) ** 2)

    g_ours = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g_ours, g_ref):
        assert a.shape == b.shape, name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_flash_4d_layout_matches_dpa_semantics():
    # (batch, seq, heads, dim) in/out, including GQA head counts.
    nb, s, hq, hkv, d = 2, 64, 4, 2, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (nb, s, hq, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (nb, s, hkv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (nb, s, hkv, d)), jnp.float32)
    out = flash_attention(q, k, v, block_q=32, block_kv=32, interpret=True)
    assert out.shape == q.shape
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_4d_causal_gradient():
    nb, s, h, d = 1, 96, 2, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (nb, s, h, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (nb, s, h, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (nb, s, h, d)), jnp.float32)

    def ours(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=32,
                                       block_kv=32, interpret=True) ** 2)

    def ref(q, k, v):
        return jnp.sum(
            jax.nn.dot_product_attention(q, k, v, is_causal=True) ** 2)

    g_ours = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_flash_sliding_window_matches_masked_oracle():
    b, s, d, w = 1, 160, 32, 48
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    out = flash_attention(q, k, v, causal=True, window=w, block_q=32,
                          block_kv=32, interpret=True)
    sc = (np.asarray(q, np.float64) @ np.asarray(k, np.float64)
          .transpose(0, 2, 1)) / np.sqrt(d)
    pos = np.arange(s)
    keep = (pos[None, :] <= pos[:, None]) & (pos[None, :] > pos[:, None] - w)
    sc = np.where(keep, sc, -np.inf)
    e = np.exp(sc - sc.max(-1, keepdims=True))
    exp = (e / e.sum(-1, keepdims=True)) @ np.asarray(v, np.float64)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)


def test_flash_sliding_window_gradients():
    b, s, d, w = 1, 128, 32, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)

    def ours(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, window=w,
                                       block_q=32, block_kv=32,
                                       interpret=True) ** 2)

    def ref(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
        pos = jnp.arange(s)
        keep = ((pos[None, :] <= pos[:, None])
                & (pos[None, :] > pos[:, None] - w))
        sc = jnp.where(keep, sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) ** 2)

    g_ours = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("dq dk dv".split(), g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_flash_window_requires_causal():
    q = jnp.zeros((1, 64, 32))
    with pytest.raises(ValueError):
        flash_attention(q, q, q, window=16, interpret=True)


def test_flash_logit_cap_matches_oracle_and_grads():
    b, s, d, cap = 1, 96, 32, 2.0
    q = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)

    def ref_out(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
        sc = cap * jnp.tanh(sc / cap)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p, v)

    out = flash_attention(q, k, v, logit_cap=cap, block_q=32, block_kv=32,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out(q, k, v)),
                               rtol=1e-4, atol=1e-5)

    g_ours = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
        q, k, v, logit_cap=cap, block_q=32, block_kv=32,
        interpret=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(ref_out(q, k, v) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("dq dk dv".split(), g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_flash_causal_logit_cap_window_combined():
    b, s, d, w, cap = 1, 128, 32, 40, 3.0
    q = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    out = flash_attention(q, k, v, causal=True, window=w, logit_cap=cap,
                          block_q=32, block_kv=32, interpret=True)
    sc = (np.asarray(q, np.float64) @ np.asarray(k, np.float64)
          .transpose(0, 2, 1)) / np.sqrt(d)
    sc = cap * np.tanh(sc / cap)
    pos = np.arange(s)
    keep = (pos[None, :] <= pos[:, None]) & (pos[None, :] > pos[:, None] - w)
    sc = np.where(keep, sc, -np.inf)
    e = np.exp(sc - sc.max(-1, keepdims=True))
    exp = (e / e.sum(-1, keepdims=True)) @ np.asarray(v, np.float64)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)


def test_flash_kv_lengths_match_per_example_truncation():
    b, sq, skv, d = 3, 32, 128, 64
    lens = np.array([128, 70, 1], np.int32)
    q = jnp.asarray(RNG.uniform(-1, 1, (b, sq, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, skv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, skv, d)), jnp.float32)
    out = flash_attention(q, k, v, kv_lengths=jnp.asarray(lens),
                          block_q=32, block_kv=32, interpret=True)
    for i, ln in enumerate(lens):
        exp = _ref(np.asarray(q[i:i + 1]), np.asarray(k[i:i + 1, :ln]),
                   np.asarray(v[i:i + 1, :ln]))
        np.testing.assert_allclose(np.asarray(out[i:i + 1]), exp,
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"example {i} len {ln}")


def test_flash_kv_lengths_decode_shape():
    # Sq=1 decode against a padded cache, per-example lengths, GQA.
    hq, hkv, cache, d = 4, 2, 256, 64
    lens = jnp.asarray(np.array([100, 256], np.int32))   # per kv head
    q = jnp.asarray(RNG.uniform(-1, 1, (hq, 1, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (hkv, cache, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (hkv, cache, d)), jnp.float32)
    out = flash_attention(q, k, v, kv_lengths=lens, block_q=8,
                          block_kv=64, interpret=True)
    g = hq // hkv
    for h in range(hq):
        ln = int(lens[h // g])
        exp = _ref(np.asarray(q[h:h + 1]),
                   np.asarray(k[h // g:h // g + 1, :ln]),
                   np.asarray(v[h // g:h // g + 1, :ln]))
        np.testing.assert_allclose(np.asarray(out[h:h + 1]), exp,
                                   rtol=1e-4, atol=1e-5)


def test_flash_kv_lengths_4d_layout():
    nb, s, h, d = 2, 64, 2, 32
    lens = jnp.asarray(np.array([30, 64], np.int32))     # per batch elem
    q = jnp.asarray(RNG.uniform(-1, 1, (nb, s, h, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (nb, s, h, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (nb, s, h, d)), jnp.float32)
    out = flash_attention(q, k, v, kv_lengths=lens, block_q=32,
                          block_kv=32, interpret=True)
    for bi in range(nb):
        ln = int(lens[bi])
        for hi in range(h):
            exp = _ref(np.asarray(q[bi, :, hi][None]),
                       np.asarray(k[bi, :ln, hi][None]),
                       np.asarray(v[bi, :ln, hi][None]))
            np.testing.assert_allclose(np.asarray(out[bi, :, hi][None]),
                                       exp, rtol=1e-4, atol=1e-5)


def test_flash_kv_lengths_bad_shape():
    q = jnp.zeros((2, 16, 128))
    with pytest.raises(ValueError):
        flash_attention(q, q, q, kv_lengths=jnp.zeros((3,), jnp.int32),
                        interpret=True)


def _packed_oracle(q, k, v, seg_q, seg_kv, causal=False):
    q64 = np.asarray(q, np.float64)
    k64 = np.asarray(k, np.float64)
    v64 = np.asarray(v, np.float64)
    s = q64 @ k64.transpose(0, 2, 1) / np.sqrt(q.shape[-1])
    keep = seg_q[:, :, None] == seg_kv[:, None, :]
    if causal:
        sq, skv = s.shape[1:]
        pos_q = np.arange(sq)[:, None]
        pos_kv = np.arange(skv)[None, :]
        keep = keep & (pos_kv <= pos_q)
    s = np.where(keep, s, -np.inf)
    e = np.exp(s - s.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True)) @ v64


def test_flash_segment_ids_forward():
    b, s, d = 2, 160, 64
    seg = np.zeros((b, s), np.int32)
    seg[:, 50:120] = 1
    seg[:, 120:] = 2
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    out = flash_attention(q, k, v, q_segment_ids=jnp.asarray(seg),
                          kv_segment_ids=jnp.asarray(seg), block_q=32,
                          block_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               _packed_oracle(q, k, v, seg, seg),
                               rtol=1e-4, atol=1e-5)


def test_flash_segment_ids_causal_packed_training():
    # The packed-pretraining configuration: causal + segments, with
    # gradients — the standard TPU data layout.
    b, s, d = 1, 128, 32
    seg = np.zeros((b, s), np.int32)
    seg[:, 40:90] = 1
    seg[:, 90:] = 2
    segj = jnp.asarray(seg)
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)

    out = flash_attention(q, k, v, causal=True, q_segment_ids=segj,
                          kv_segment_ids=segj, block_q=32, block_kv=32,
                          interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _packed_oracle(q, k, v, seg, seg, causal=True),
        rtol=1e-4, atol=1e-5)

    def ours(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, causal=True, q_segment_ids=segj, kv_segment_ids=segj,
            block_q=32, block_kv=32, interpret=True) ** 2)

    def ref(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
        pos = jnp.arange(s)
        keep = ((jnp.asarray(seg)[:, :, None]
                 == jnp.asarray(seg)[:, None, :])
                & (pos[None, :] <= pos[:, None])[None])
        sc = jnp.where(keep, sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) ** 2)

    g_ours = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("dq dk dv".split(), g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_flash_segment_ids_4d_gqa():
    nb, sq, hq, hkv, d = 2, 64, 4, 2, 32
    seg = np.zeros((nb, sq), np.int32)
    seg[:, 30:] = 1
    q = jnp.asarray(RNG.uniform(-1, 1, (nb, sq, hq, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (nb, sq, hkv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (nb, sq, hkv, d)), jnp.float32)
    out = flash_attention(q, k, v, q_segment_ids=jnp.asarray(seg),
                          kv_segment_ids=jnp.asarray(seg), block_q=32,
                          block_kv=32, interpret=True)
    g = hq // hkv
    for bi in range(nb):
        for h in range(hq):
            exp = _packed_oracle(np.asarray(q[bi, :, h][None]),
                                 np.asarray(k[bi, :, h // g][None]),
                                 np.asarray(v[bi, :, h // g][None]),
                                 seg[bi:bi + 1], seg[bi:bi + 1])
            np.testing.assert_allclose(np.asarray(out[bi, :, h][None]),
                                       exp, rtol=1e-4, atol=1e-5)


def test_flash_segment_ids_require_both():
    q = jnp.zeros((1, 32, 128))
    with pytest.raises(ValueError):
        flash_attention(q, q, q, q_segment_ids=jnp.zeros((1, 32),
                                                         jnp.int32),
                        interpret=True)


def test_flash_causal_decode_anchored_at_cache_end():
    # causal + kv_lengths: q rows are the LAST rows of the valid cache.
    hq, cache, d = 2, 128, 32
    lens = np.array([100, 128], np.int32)
    q = jnp.asarray(RNG.uniform(-1, 1, (hq, 1, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (hq, cache, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (hq, cache, d)), jnp.float32)
    out = flash_attention(q, k, v, causal=True,
                          kv_lengths=jnp.asarray(lens), block_q=8,
                          block_kv=32, interpret=True)
    # Sq=1 at the cache end == plain attention over the valid prefix.
    for h, ln in enumerate(lens):
        exp = _ref(np.asarray(q[h:h + 1]), np.asarray(k[h:h + 1, :ln]),
                   np.asarray(v[h:h + 1, :ln]))
        np.testing.assert_allclose(np.asarray(out[h:h + 1]), exp,
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"head {h} len {ln}")


def test_flash_causal_decode_multi_token_chunk():
    # Chunked prefill tail: Sq=4 anchored at the end of a 60-long cache.
    b, sq, cache, d = 1, 4, 96, 32
    ln = 60
    q = jnp.asarray(RNG.uniform(-1, 1, (b, sq, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, cache, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, cache, d)), jnp.float32)
    out = flash_attention(q, k, v, causal=True,
                          kv_lengths=jnp.asarray([ln], jnp.int32),
                          block_q=8, block_kv=32, interpret=True)
    # Row r attends cache[: ln - sq + r + 1].
    for r in range(sq):
        hi = ln - sq + r + 1
        exp = _ref(np.asarray(q[:, r:r + 1]), np.asarray(k[:, :hi]),
                   np.asarray(v[:, :hi]))
        np.testing.assert_allclose(np.asarray(out[:, r:r + 1]), exp,
                                   rtol=1e-4, atol=1e-5, err_msg=f"row {r}")


def test_flash_rejects_mixed_dtypes():
    q = jnp.zeros((1, 32, 128), jnp.bfloat16)
    kf = jnp.zeros((1, 32, 128), jnp.float32)
    with pytest.raises(ValueError, match="dtype"):
        flash_attention(q, kf, kf, interpret=True)


# ---------------------------------------------------------------------------
# Position offsets (the ring-attention enabler): flash_mha's dynamic
# (q_offset, kv_offset) pair shifts the causal/window masks to absolute
# positions.
# ---------------------------------------------------------------------------


def _ref_offsets(q, k, v, q0, kv0, window=None):
    q64 = np.asarray(q, np.float64)
    k64 = np.asarray(k, np.float64)
    v64 = np.asarray(v, np.float64)
    s = q64 @ k64.transpose(0, 2, 1)        # scale pre-folded by caller
    qpos = q0 + np.arange(q.shape[1])[:, None]
    kpos = kv0 + np.arange(k.shape[1])[None, :]
    mask = (kpos <= qpos)[None]
    if window is not None:
        mask = mask & (kpos > qpos - window)[None]
    mx = np.where(mask, s, -np.inf).max(-1, keepdims=True, initial=-np.inf)
    p = np.where(mask, np.exp(s - np.where(np.isfinite(mx), mx, 0.0)), 0.0)
    den = p.sum(-1, keepdims=True)
    return np.where(den == 0, 0.0,
                    p / np.where(den == 0, 1, den)) @ v64


@pytest.mark.parametrize("window", [None, 24])
def test_flash_offsets_forward(window):
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.pallas_flash import flash_mha

    cfg = default_config("float32").replace(out_dtype="float32")
    b, s, d = 2, 128, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32) * 0.2
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32) * 0.2
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    # q = the SECOND block of a global sequence, kv = the first: every
    # pair is "past" unless the window cuts it.
    out = flash_mha(q, k, v, offsets=jnp.asarray([s, 0]), cfg=cfg,
                    causal=True, window=window, block_q=32, block_kv=32,
                    interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _ref_offsets(q, k, v, s, 0, window),
        rtol=1e-4, atol=1e-5)


def test_flash_offsets_zero_matches_plain_causal():
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.pallas_flash import flash_mha

    cfg = default_config("float32").replace(out_dtype="float32")
    b, s, d = 1, 96, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32) * 0.2
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32) * 0.2
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    a = flash_mha(q, k, v, offsets=jnp.asarray([0, 0]), cfg=cfg,
                  causal=True, block_q=32, block_kv=32, interpret=True)
    bb = flash_mha(q, k, v, cfg=cfg, causal=True, block_q=32,
                   block_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                               rtol=1e-6, atol=1e-7)


def test_flash_offsets_fully_future_shard_is_skipped_partial():
    """kv wholly in the future -> o = 0 and lse = -inf (the ring's
    'skipped step' convention), with no nans anywhere."""
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.pallas_flash import flash_mha

    cfg = default_config("float32").replace(out_dtype="float32")
    b, s, d = 1, 64, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    o, lse = flash_mha(q, q, q, offsets=jnp.asarray([0, s]), cfg=cfg,
                       causal=True, block_q=32, block_kv=32,
                       interpret=True, save_lse=True)
    assert np.abs(np.asarray(o)).max() == 0.0
    assert bool(np.all(np.asarray(lse) == -np.inf))


def test_flash_offsets_bwd_matches_autodiff():
    """The bwd kernels' offsets path vs XLA autodiff on the same mask."""
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.pallas_flash import (
        flash_mha, flash_mha_bwd_dq, flash_mha_bwd_dkv,
    )

    cfg = default_config("float32").replace(out_dtype="float32")
    b, s, d = 1, 64, 16
    # window > q_span so no q row is GLOBALLY dead: the bwd kernels take
    # the forward's global lse, which the ring guarantees finite (the
    # diagonal shard is always live); lse = -inf rows are a forward-only
    # state (test_flash_offsets_fully_future_shard_is_skipped_partial).
    q0, kv0, window = s, 0, 80
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32) * 0.3
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    do = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    offs = jnp.asarray([q0, kv0])

    o, lse = flash_mha(q, k, v, offsets=offs, cfg=cfg, causal=True,
                       window=window, block_q=16, block_kv=16,
                       interpret=True, save_lse=True)
    delta = jnp.sum(do * o.astype(jnp.float32), axis=-1, keepdims=True)
    dq = flash_mha_bwd_dq(q, k, v, do, lse, delta, None, None, offs,
                          cfg=cfg, causal=True, window=window,
                          block_q=16, block_kv=16, interpret=True)
    dk, dv = flash_mha_bwd_dkv(q, k, v, do, lse, delta, None, None, offs,
                               cfg=cfg, causal=True, window=window,
                               block_q=16, block_kv=16, interpret=True)

    def ref_loss(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k)
        qpos = q0 + jnp.arange(s)[:, None]
        kpos = kv0 + jnp.arange(s)[None, :]
        mask = (kpos <= qpos) & (kpos > qpos - window)
        p = jax.nn.softmax(jnp.where(mask, sc, -jnp.inf), axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) * do)

    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               rtol=1e-3, atol=1e-5, err_msg="dq")
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               rtol=1e-3, atol=1e-5, err_msg="dk")
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                               rtol=1e-3, atol=1e-5, err_msg="dv")


def test_flash_offsets_rejections():
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.pallas_flash import flash_mha

    cfg = default_config("float32")
    q = jnp.zeros((1, 32, 32), jnp.float32)
    with pytest.raises(ValueError, match="causal"):
        flash_mha(q, q, q, offsets=jnp.asarray([0, 0]), cfg=cfg,
                  interpret=True)
    with pytest.raises(ValueError, match="kv_lengths"):
        flash_mha(q, q, q, kv_lengths=jnp.asarray([32]),
                  offsets=jnp.asarray([0, 0]), cfg=cfg, causal=True,
                  interpret=True)


def test_flash_decode_fast_path_matches_general():
    """The s_q=1 head-packed decode fast path must equal the generic
    (B*H, 1, D) packing bit-for-bit in math terms."""
    nb, hq, hkv, d, cache = 2, 8, 2, 32, 128
    q = jnp.asarray(RNG.uniform(-1, 1, (nb, 1, hq, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (nb, cache, hkv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (nb, cache, hkv, d)), jnp.float32)
    lens = jnp.asarray([100, 37], jnp.int32)
    fast = flash_attention(q, k, v, causal=True, kv_lengths=lens,
                           block_q=32, block_kv=32, interpret=True)
    assert fast.shape == q.shape
    # General-path oracle: per (batch, head) row against the valid
    # cache prefix (q at the cache end attends every valid position).
    for b in range(nb):
        ln = int(lens[b])
        for h in range(hq):
            kv = np.asarray(k[b, :ln, h // (hq // hkv)])
            vv = np.asarray(v[b, :ln, h // (hq // hkv)])
            exp = _ref(np.asarray(q[b, :, h])[None], kv[None], vv[None])
            np.testing.assert_allclose(np.asarray(fast[b, :, h])[None],
                                       exp, rtol=1e-4, atol=1e-5,
                                       err_msg=f"b{b} h{h}")


def test_flash_decode_fast_path_noncausal():
    nb, hq, hkv, d, cache = 1, 4, 4, 16, 64
    q = jnp.asarray(RNG.uniform(-1, 1, (nb, 1, hq, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (nb, cache, hkv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (nb, cache, hkv, d)), jnp.float32)
    out = flash_attention(q, k, v, block_q=16, block_kv=16,
                          interpret=True)
    for h in range(hq):
        exp = _ref(np.asarray(q[0, :, h])[None], np.asarray(k[0, :, h])[None],
                   np.asarray(v[0, :, h])[None])
        np.testing.assert_allclose(np.asarray(out[0, :, h])[None], exp,
                                   rtol=1e-4, atol=1e-5, err_msg=f"h{h}")


# ---------------------------------------------------------------------------
# One-pass causal kernel (whole-row KV resident, register-carried softmax).
# Engages when block_kv >= S_kv and S_kv is lane-sliceable; these tests
# force it explicitly and cross-check against the streamed triangular path
# and the f64 oracle (same philosophy as the reference's hw_emu-vs-sim
# cross-checks, test/TestSimulation.cpp).
# ---------------------------------------------------------------------------


def _onepass(q, k, v, **kw):
    """Force the one-pass dispatch: whole-KV block, sub-slab compute."""
    skv = k.shape[1]
    return flash_attention(q, k, v, causal=True, block_kv=skv,
                           block_kv_compute=min(128, skv),
                           interpret=True, **kw)


def _triangular(q, k, v, **kw):
    """Force the streamed triangular-table path: block_kv < S_kv."""
    return flash_attention(q, k, v, causal=True, block_q=64,
                           block_kv=max(64, k.shape[1] // 2),
                           interpret=True, **kw)


@pytest.mark.parametrize("sq,skv,d,bqc", [
    (256, 256, 64, 64),     # aligned, wq sub-tiles the row
    (256, 256, 64, 256),    # wq = whole block (single q sub-tile)
    (120, 256, 32, 64),     # unaligned S_q (bq falls back, edge store)
    (256, 384, 64, 64),     # S_kv > S_q (prefix context, all live)
])
def test_flash_onepass_matches_oracle(sq, skv, d, bqc):
    q = RNG.uniform(-2, 2, (2, sq, d)).astype(np.float32)
    k = RNG.uniform(-2, 2, (2, skv, d)).astype(np.float32)
    v = RNG.uniform(-2, 2, (2, skv, d)).astype(np.float32)
    out = _onepass(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                   block_q_compute=bqc)
    # Plain-causal semantics are position-aligned at 0 (flash_mha
    # docstring): with S_kv > S_q the kv tail is fully future.
    s = (q.astype(np.float64) @ k.astype(np.float64).transpose(0, 2, 1)
         / np.sqrt(d))
    pos_q = np.arange(sq)[:, None]
    keep = np.arange(skv)[None, :] <= pos_q
    s = np.where(keep, s, -np.inf)
    e = np.exp(s - s.max(-1, keepdims=True))
    exp = (e / e.sum(-1, keepdims=True)) @ v.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)


def test_flash_onepass_matches_triangular_window_gqa():
    # Sliding window + GQA, one-pass vs streamed path must agree.
    nb, sq, hq, hkv, d = 1, 256, 4, 2, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (nb, sq, hq, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (nb, sq, hkv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (nb, sq, hkv, d)), jnp.float32)
    a = _onepass(q, k, v, window=96, block_q_compute=64)
    b = _triangular(q, k, v, window=96)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_flash_onepass_segment_ids_and_grads():
    # Packed causal training through the one-pass kernel: forward vs
    # oracle, gradients vs autodiff of the dense reference.
    b, s, d = 1, 256, 32
    seg = np.zeros((b, s), np.int32)
    seg[:, 100:180] = 1
    seg[:, 180:] = 2
    segj = jnp.asarray(seg)
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)

    out = _onepass(q, k, v, q_segment_ids=segj, kv_segment_ids=segj,
                   block_q_compute=64)
    np.testing.assert_allclose(
        np.asarray(out), _packed_oracle(q, k, v, seg, seg, causal=True),
        rtol=1e-4, atol=1e-5)

    def ours(q, k, v):
        return jnp.sum(_onepass(q, k, v, q_segment_ids=segj,
                                kv_segment_ids=segj,
                                block_q_compute=64) ** 2)

    def ref(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
        pos = jnp.arange(s)
        keep = ((segj[:, :, None] == segj[:, None, :])
                & (pos[None, :] <= pos[:, None])[None])
        sc = jnp.where(keep, sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) ** 2)

    g_ours = jax.grad(ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for name, ga, gb in zip("dq dk dv".split(), g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_flash_onepass_logit_cap():
    q = jnp.asarray(RNG.uniform(-1, 1, (1, 256, 32)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (1, 256, 32)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (1, 256, 32)), jnp.float32)
    a = _onepass(q, k, v, logit_cap=20.0, block_q_compute=64)
    b = _triangular(q, k, v, logit_cap=20.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_flash_bwd_block_overrides_match_defaults():
    # Explicit backward tile sizes (the autotuned bwd_block_* knobs)
    # must not change gradients.
    b, s, d = 1, 256, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)

    def loss(q, k, v, **kw):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=64,
                                       block_kv=128, interpret=True,
                                       **kw) ** 2)

    g0 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g1 = jax.grad(lambda q, k, v: loss(q, k, v, bwd_block_q=128,
                                       bwd_block_kv=64),
                  argnums=(0, 1, 2))(q, k, v)
    for name, ga, gb in zip("dq dk dv".split(), g0, g1):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
