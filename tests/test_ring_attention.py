"""Ring flash attention on the virtual CPU mesh vs the single-device
oracle — same philosophy as the SUMMA/Cannon tests (run the real
decomposition + combination logic, no hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu.parallel import make_mesh, ring_flash_attention

RNG = np.random.default_rng(5)


def _ref(q, k, v, scale=None):
    q64 = np.asarray(q, np.float64)
    k64 = np.asarray(k, np.float64)
    v64 = np.asarray(v, np.float64)
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    s = q64 @ k64.transpose(0, 2, 1) * scale
    e = np.exp(s - s.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True)) @ v64


@pytest.mark.parametrize("ring,b,s,d,bq,bkv", [
    (8, 2, 256, 64, 32, 32),      # 8-chip ring, 32-token shards
    (4, 1, 128, 32, 32, 32),
    (2, 2, 128, 64, 64, 64),      # single-kv-block per shard
])
def test_ring_matches_oracle(ring, b, s, d, bq, bkv):
    mesh = make_mesh((ring,), ("x",))
    q = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    out = ring_flash_attention(q, k, v, mesh, block_q=bq, block_kv=bkv,
                               interpret=True)
    assert out.shape == (b, s, d)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v),
                               rtol=1e-4, atol=1e-5)


def test_ring_matches_single_device_flash():
    from gemm_hls_tpu.ops.attention import flash_attention

    mesh = make_mesh((4,), ("x",))
    q = jnp.asarray(RNG.uniform(-1, 1, (2, 128, 64)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (2, 128, 64)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (2, 128, 64)), jnp.float32)
    ours = ring_flash_attention(q, k, v, mesh, block_q=32, block_kv=32,
                                interpret=True)
    ref = flash_attention(q, k, v, block_q=32, block_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_ring_cross_attention_lengths():
    # S_q != S_kv: KV ring rotates independently of the q shard length.
    mesh = make_mesh((4,), ("x",))
    q = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 32)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (1, 256, 32)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (1, 256, 32)), jnp.float32)
    out = ring_flash_attention(q, k, v, mesh, block_q=16, block_kv=64,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v),
                               rtol=1e-4, atol=1e-5)


def test_ring_rejects_indivisible_sequence():
    mesh = make_mesh((8,), ("x",))
    q = jnp.zeros((1, 100, 32))
    with pytest.raises(ValueError):
        ring_flash_attention(q, q, q, mesh, interpret=True)


def test_ring_custom_scale():
    mesh = make_mesh((2,), ("x",))
    q = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 32)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 32)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 32)), jnp.float32)
    out = ring_flash_attention(q, k, v, mesh, scale=0.1, block_q=32,
                               block_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(q, k, v, scale=0.1),
                               rtol=1e-4, atol=1e-5)


def test_ring_gradients_match_single_device():
    from gemm_hls_tpu.ops.attention import flash_attention

    mesh = make_mesh((4,), ("x",))
    q = jnp.asarray(RNG.uniform(-1, 1, (2, 128, 32)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (2, 128, 32)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (2, 128, 32)), jnp.float32)
    w = jnp.asarray(RNG.uniform(-1, 1, (2, 128, 32)), jnp.float32)

    def ring_loss(q, k, v):
        return jnp.sum(ring_flash_attention(q, k, v, mesh, block_q=32,
                                            block_kv=32,
                                            interpret=True) * w)

    def flash_loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=32, block_kv=32,
                                       interpret=True) * w)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_ring_gradient_vs_xla_autodiff():
    mesh = make_mesh((2,), ("x",))
    q = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 32)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 32)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 32)), jnp.float32)

    def ring_loss(q, k, v):
        return jnp.sum(ring_flash_attention(q, k, v, mesh, block_q=32,
                                            block_kv=32,
                                            interpret=True) ** 2)

    def ref_loss(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(32)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) ** 2)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("dq dk dv".split(), g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("ring,b,s,d", [(4, 1, 128, 32), (2, 2, 64, 32)])
def test_ring_causal_matches_oracle(ring, b, s, d):
    mesh = make_mesh((ring,), ("x",))
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    out = ring_flash_attention(q, k, v, mesh, causal=True, block_q=16,
                               block_kv=16, interpret=True)
    s64 = (np.asarray(q, np.float64) @ np.asarray(k, np.float64)
           .transpose(0, 2, 1)) / np.sqrt(d)
    s64 = np.where(np.tril(np.ones((s, s), bool)), s64, -np.inf)
    e = np.exp(s64 - s64.max(-1, keepdims=True))
    exp = (e / e.sum(-1, keepdims=True)) @ np.asarray(v, np.float64)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)


def test_ring_causal_gradients():
    mesh = make_mesh((4,), ("x",))
    b, s, d = 1, 128, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)

    def ring_loss(q, k, v):
        return jnp.sum(ring_flash_attention(q, k, v, mesh, causal=True,
                                            block_q=16, block_kv=16,
                                            interpret=True) ** 2)

    def ref_loss(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
        sc = jnp.where(jnp.tril(jnp.ones((s, s), bool)), sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) ** 2)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("dq dk dv".split(), g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_ring_causal_rejects_unequal_lengths():
    mesh = make_mesh((2,), ("x",))
    q = jnp.zeros((1, 64, 32))
    k = jnp.zeros((1, 128, 32))
    with pytest.raises(ValueError):
        ring_flash_attention(q, k, k, mesh, causal=True, interpret=True)


def _causal_ref(q, k, v):
    s = q.shape[1]
    s64 = (np.asarray(q, np.float64) @ np.asarray(k, np.float64)
           .transpose(0, 2, 1)) / np.sqrt(q.shape[-1])
    s64 = np.where(np.tril(np.ones((s, s), bool)), s64, -np.inf)
    e = np.exp(s64 - s64.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True)) @ np.asarray(v, np.float64)


@pytest.mark.parametrize("ring,b,s,d", [
    (4, 1, 128, 32),
    (2, 2, 64, 32),
    (8, 1, 256, 32),   # chunk = 16 tokens
    (1, 1, 64, 32),    # degenerate ring: zigzag == plain causal flash
])
def test_zigzag_matches_oracle(ring, b, s, d):
    mesh = make_mesh((ring,), ("x",))
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    out = ring_flash_attention(q, k, v, mesh, causal=True, zigzag=True,
                               block_q=16, block_kv=16, interpret=True)
    assert out.shape == (b, s, d)
    np.testing.assert_allclose(np.asarray(out), _causal_ref(q, k, v),
                               rtol=1e-4, atol=1e-5)


def test_zigzag_matches_plain_causal_ring():
    mesh = make_mesh((4,), ("x",))
    b, s, d = 2, 128, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    zz = ring_flash_attention(q, k, v, mesh, causal=True, zigzag=True,
                              block_q=16, block_kv=16, interpret=True)
    plain = ring_flash_attention(q, k, v, mesh, causal=True,
                                 block_q=16, block_kv=16, interpret=True)
    np.testing.assert_allclose(np.asarray(zz), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)


def test_zigzag_gradients():
    mesh = make_mesh((4,), ("x",))
    b, s, d = 1, 128, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)

    def zz_loss(q, k, v):
        return jnp.sum(ring_flash_attention(
            q, k, v, mesh, causal=True, zigzag=True, block_q=16,
            block_kv=16, interpret=True) ** 2)

    def ref_loss(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
        sc = jnp.where(jnp.tril(jnp.ones((s, s), bool)), sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) ** 2)

    g_zz = jax.grad(zz_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("dq dk dv".split(), g_zz, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_zigzag_indices_roundtrip():
    from gemm_hls_tpu.parallel.ring_attention import zigzag_indices

    order = np.asarray(zigzag_indices(32, 4))
    assert sorted(order.tolist()) == list(range(32))
    # Device 0 holds chunks 0 and 7 (of 8 chunks x 4 tokens).
    np.testing.assert_array_equal(order[:8],
                                  [0, 1, 2, 3, 28, 29, 30, 31])
    x = np.arange(32)
    inv = np.argsort(order)
    np.testing.assert_array_equal(x[order][inv], x)


def test_zigzag_rejects_bad_args():
    mesh = make_mesh((4,), ("x",))
    q = jnp.zeros((1, 128, 32))
    with pytest.raises(ValueError):  # needs causal
        ring_flash_attention(q, q, q, mesh, zigzag=True, interpret=True)
    q2 = jnp.zeros((1, 132, 32))
    with pytest.raises(ValueError):  # 2*ring must divide S
        ring_flash_attention(q2, q2, q2, mesh, causal=True, zigzag=True,
                             interpret=True)


# ---------------------------------------------------------------------------
# Feature parity with the single-chip flash surface (mirrors
# tests/test_flash.py's coverage: GQA, sliding window, segment ids,
# logit soft-cap, per-example KV lengths) — over the ring.
# ---------------------------------------------------------------------------


def _masked_ref(q, k, v, *, scale=None, causal=False, window=None,
                logit_cap=None, q_seg=None, kv_seg=None, kv_len=None):
    """Dense float64 oracle with the full mask surface + GQA."""
    q64 = np.asarray(q, np.float64)
    k64 = np.asarray(k, np.float64)
    v64 = np.asarray(v, np.float64)
    group = q64.shape[0] // k64.shape[0]
    k64 = np.repeat(k64, group, axis=0)
    v64 = np.repeat(v64, group, axis=0)
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    s = q64 @ k64.transpose(0, 2, 1) * scale
    if logit_cap is not None:
        s = logit_cap * np.tanh(s / logit_cap)
    bq, sq, _ = q64.shape
    skv = k64.shape[1]
    mask = np.ones((bq, sq, skv), bool)
    qpos = np.arange(sq)[:, None]
    kpos = np.arange(skv)[None, :]
    if causal:
        mask &= (kpos <= qpos)[None]
        if window is not None:
            mask &= (kpos > qpos - window)[None]
    if q_seg is not None:
        qs_ = np.repeat(np.asarray(q_seg), 1, axis=0)
        ks_ = np.repeat(np.asarray(kv_seg), group, axis=0)
        mask &= qs_[:, :, None] == ks_[:, None, :]
    if kv_len is not None:
        lens = np.repeat(np.asarray(kv_len), group, axis=0)
        mask &= kpos[None] < lens[:, None, None]
    mx = np.where(mask, s, -np.inf).max(-1, keepdims=True, initial=-np.inf)
    p = np.where(mask, np.exp(s - np.where(np.isfinite(mx), mx, 0.0)), 0.0)
    den = p.sum(-1, keepdims=True)
    return np.where(den == 0, 0.0, p / np.where(den == 0, 1, den)) @ v64


@pytest.mark.parametrize("causal", [False, True])
def test_ring_gqa(causal):
    # 8 q heads share 2 kv heads; kv shards rotate in kv-head shape.
    mesh = make_mesh((4,), ("x",))
    bq, bkv_h, s, d = 8, 2, 128, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (bq, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (bkv_h, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (bkv_h, s, d)), jnp.float32)
    out = ring_flash_attention(q, k, v, mesh, causal=causal,
                               block_q=32, block_kv=32, interpret=True)
    assert out.shape == (bq, s, d)
    np.testing.assert_allclose(
        np.asarray(out), _masked_ref(q, k, v, causal=causal),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("window", [16, 48, 200])
def test_ring_sliding_window(window):
    # Window smaller / straddling / larger than a 32-token KV shard.
    mesh = make_mesh((4,), ("x",))
    b, s, d = 2, 128, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    out = ring_flash_attention(q, k, v, mesh, causal=True, window=window,
                               block_q=16, block_kv=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _masked_ref(q, k, v, causal=True, window=window),
        rtol=1e-4, atol=1e-5)


def test_ring_window_matches_single_device():
    from gemm_hls_tpu.ops.attention import flash_attention

    mesh = make_mesh((8,), ("x",))
    b, s, d = 2, 256, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    ours = ring_flash_attention(q, k, v, mesh, causal=True, window=40,
                                block_q=32, block_kv=32, interpret=True)
    ref = flash_attention(q, k, v, causal=True, window=40, block_q=32,
                          block_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_ring_logit_cap():
    mesh = make_mesh((4,), ("x",))
    b, s, d = 2, 128, 32
    q = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-2, 2, (b, s, d)), jnp.float32)
    out = ring_flash_attention(q, k, v, mesh, causal=True, logit_cap=5.0,
                               block_q=32, block_kv=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _masked_ref(q, k, v, causal=True, logit_cap=5.0),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_segment_ids(causal):
    # Two packed documents per row; boundary NOT shard-aligned.
    mesh = make_mesh((4,), ("x",))
    b, s, d = 2, 128, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    seg = np.zeros((b, s), np.int32)
    seg[0, 50:] = 1
    seg[1, 90:] = 1
    seg_j = jnp.asarray(seg)
    out = ring_flash_attention(q, k, v, mesh, causal=causal,
                               q_segment_ids=seg_j, kv_segment_ids=seg_j,
                               block_q=16, block_kv=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out),
        _masked_ref(q, k, v, causal=causal, q_seg=seg, kv_seg=seg),
        rtol=1e-4, atol=1e-5)


def test_ring_kv_lengths_padded_batch():
    # Non-causal padded batch: logical lengths end mid-shard.
    mesh = make_mesh((4,), ("x",))
    b, s, d = 3, 128, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    lens = np.asarray([128, 43, 70], np.int32)
    out = ring_flash_attention(q, k, v, mesh,
                               kv_lengths=jnp.asarray(lens),
                               block_q=16, block_kv=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _masked_ref(q, k, v, kv_len=lens),
        rtol=1e-4, atol=1e-5)


def test_ring_gqa_window_segment_gradients():
    # The composed feature set, differentiated, vs XLA autodiff.
    mesh = make_mesh((4,), ("x",))
    bq, bkv_h, s, d = 4, 2, 64, 16
    window = 24
    q = jnp.asarray(RNG.uniform(-1, 1, (bq, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (bkv_h, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (bkv_h, s, d)), jnp.float32)

    def ring_loss(q, k, v):
        return jnp.sum(ring_flash_attention(
            q, k, v, mesh, causal=True, window=window, block_q=16,
            block_kv=16, interpret=True) ** 2)

    def ref_loss(q, k, v):
        group = q.shape[0] // k.shape[0]
        kr = jnp.repeat(k, group, axis=0)
        vr = jnp.repeat(v, group, axis=0)
        sc = jnp.einsum("bqd,bkd->bqk", q, kr) / np.sqrt(d)
        qpos = jnp.arange(s)[:, None]
        kpos = jnp.arange(s)[None, :]
        mask = (kpos <= qpos) & (kpos > qpos - window)
        sc = jnp.where(mask, sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, vr) ** 2)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("dq dk dv".split(), g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_ring_segment_gradients():
    mesh = make_mesh((4,), ("x",))
    b, s, d = 2, 64, 16
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s, d)), jnp.float32)
    seg = np.zeros((b, s), np.int32)
    seg[0, 30:] = 1
    seg[1, 50:] = 1
    seg_j = jnp.asarray(seg)

    def ring_loss(q, k, v):
        return jnp.sum(ring_flash_attention(
            q, k, v, mesh, causal=True, q_segment_ids=seg_j,
            kv_segment_ids=seg_j, block_q=16, block_kv=16,
            interpret=True) ** 2)

    def ref_loss(q, k, v):
        sc = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(d)
        qpos = jnp.arange(s)[:, None]
        kpos = jnp.arange(s)[None, :]
        mask = (kpos <= qpos)[None] & (seg_j[:, :, None]
                                       == seg_j[:, None, :])
        sc = jnp.where(mask, sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) ** 2)

    g_ring = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("dq dk dv".split(), g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_zigzag_gqa_logit_cap():
    mesh = make_mesh((4,), ("x",))
    bq, bkv_h, s, d = 4, 2, 128, 32
    q = jnp.asarray(RNG.uniform(-1, 1, (bq, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (bkv_h, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (bkv_h, s, d)), jnp.float32)
    out = ring_flash_attention(q, k, v, mesh, causal=True, zigzag=True,
                               logit_cap=10.0, block_q=16, block_kv=16,
                               interpret=True)
    np.testing.assert_allclose(
        np.asarray(out),
        _masked_ref(q, k, v, causal=True, logit_cap=10.0),
        rtol=1e-4, atol=1e-5)


def test_zigzag_gqa_gradients():
    mesh = make_mesh((2,), ("x",))
    bq, bkv_h, s, d = 4, 2, 64, 16
    q = jnp.asarray(RNG.uniform(-1, 1, (bq, s, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (bkv_h, s, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (bkv_h, s, d)), jnp.float32)

    def zz_loss(q, k, v):
        return jnp.sum(ring_flash_attention(
            q, k, v, mesh, causal=True, zigzag=True, block_q=16,
            block_kv=16, interpret=True) ** 2)

    def ref_loss(q, k, v):
        group = q.shape[0] // k.shape[0]
        kr = jnp.repeat(k, group, axis=0)
        vr = jnp.repeat(v, group, axis=0)
        sc = jnp.einsum("bqd,bkd->bqk", q, kr) / np.sqrt(d)
        sc = jnp.where(jnp.tril(jnp.ones((s, s), bool)), sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, vr) ** 2)

    g_zz = jax.grad(zz_loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("dq dk dv".split(), g_zz, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-5, err_msg=name)


def test_ring_feature_rejections():
    mesh = make_mesh((4,), ("x",))
    q = jnp.zeros((2, 128, 32))
    lens = jnp.asarray([128, 64], jnp.int32)
    with pytest.raises(ValueError):  # kv_lengths needs non-causal
        ring_flash_attention(q, q, q, mesh, causal=True, kv_lengths=lens,
                             interpret=True)
    with pytest.raises(ValueError):  # window needs causal
        ring_flash_attention(q, q, q, mesh, window=16, interpret=True)
    with pytest.raises(ValueError):  # zigzag has no window surface
        ring_flash_attention(q, q, q, mesh, causal=True, zigzag=True,
                             window=16, interpret=True)
    with pytest.raises(ValueError):  # segment ids come in pairs
        ring_flash_attention(q, q, q, mesh,
                             q_segment_ids=jnp.zeros((2, 128), jnp.int32),
                             interpret=True)


# ---------------------------------------------------------------------------
# Serving: ring decode (causal + ragged per-example lengths + GQA/window)
# ---------------------------------------------------------------------------

def _decode_ref(q, k, v, lengths, window=None, scale=None):
    """Ragged dense oracle: q rows anchored at the END of each example's
    logical cache (q row r at position length - S_q + r)."""
    b, s_q, d = q.shape
    g = b // k.shape[0]
    kr = np.repeat(np.asarray(k, np.float64), g, 0)
    vr = np.repeat(np.asarray(v, np.float64), g, 0)
    lr = np.repeat(np.asarray(lengths), g, 0)
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    s = np.asarray(q, np.float64) @ kr.transpose(0, 2, 1) * scale
    out = np.zeros_like(s[..., :1].repeat(d, -1))
    kp = np.arange(k.shape[1])[None, :]
    for i in range(b):
        qp = (lr[i] - s_q + np.arange(s_q))[:, None]
        m = (kp <= qp) & (kp < lr[i])
        if window is not None:
            m &= kp > qp - window
        si = np.where(m, s[i], -np.inf)
        e = np.exp(si - si.max(-1, keepdims=True))
        out[i] = (e / e.sum(-1, keepdims=True)) @ vr[i]
    return out


@pytest.mark.parametrize("ring,s_q,window", [
    (4, 1, None),        # single-token decode
    (4, 4, None),        # chunked continuation
    (4, 1, 48),          # windowed decode
    (2, 8, 40),          # continuation + window
])
def test_ring_decode_matches_ragged_oracle(ring, s_q, window):
    from gemm_hls_tpu.parallel import ring_decode_attention

    mesh = make_mesh((ring,), ("x",))
    b, s_kv, d = 4, 256, 64
    q = jnp.asarray(RNG.uniform(-1, 1, (b, s_q, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s_kv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s_kv, d)), jnp.float32)
    # Ragged lengths: one tiny (leaves later shards EMPTY), one at the
    # shard boundary, one mid-shard, one full cache.
    lengths = jnp.asarray([9, 64, 150, 256], jnp.int32)
    out = ring_decode_attention(q, k, v, lengths, mesh, window=window,
                                block_q=32, block_kv=32, interpret=True)
    assert out.shape == (b, s_q, d)
    np.testing.assert_allclose(
        np.asarray(out), _decode_ref(q, k, v, lengths, window),
        rtol=1e-4, atol=1e-5)


def test_ring_decode_gqa():
    from gemm_hls_tpu.parallel import ring_decode_attention

    mesh = make_mesh((4,), ("x",))
    hq, hkv, s_kv, d = 8, 2, 128, 64
    q = jnp.asarray(RNG.uniform(-1, 1, (hq, 1, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (hkv, s_kv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (hkv, s_kv, d)), jnp.float32)
    lengths = jnp.asarray([40, 128], jnp.int32)
    out = ring_decode_attention(q, k, v, lengths, mesh, block_q=32,
                                block_kv=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _decode_ref(q, k, v, lengths),
        rtol=1e-4, atol=1e-5)


def test_ring_decode_matches_single_chip_kvlen_path():
    """Parity with the single-chip causal kv_lengths decode path."""
    from gemm_hls_tpu.ops.attention import flash_attention
    from gemm_hls_tpu.parallel import ring_decode_attention

    mesh = make_mesh((4,), ("x",))
    b, s_kv, d = 2, 128, 64
    q = jnp.asarray(RNG.uniform(-1, 1, (b, 1, d)), jnp.float32)
    k = jnp.asarray(RNG.uniform(-1, 1, (b, s_kv, d)), jnp.float32)
    v = jnp.asarray(RNG.uniform(-1, 1, (b, s_kv, d)), jnp.float32)
    lengths = jnp.asarray([33, 100], jnp.int32)
    ring = ring_decode_attention(q, k, v, lengths, mesh, block_q=32,
                                 block_kv=32, interpret=True)
    single = flash_attention(q, k, v, causal=True, kv_lengths=lengths,
                             block_q=32, block_kv=32, interpret=True)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(single),
                               rtol=1e-4, atol=1e-5)


def test_ring_decode_validates():
    from gemm_hls_tpu.parallel import ring_decode_attention

    mesh = make_mesh((4,), ("x",))
    q = jnp.zeros((2, 1, 64), jnp.float32)
    k = jnp.zeros((2, 130, 64), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        ring_decode_attention(q, k, k, jnp.asarray([1, 1]), mesh,
                              interpret=True)
    k2 = jnp.zeros((2, 128, 64), jnp.float32)
    with pytest.raises(ValueError, match="kv_lengths"):
        ring_decode_attention(q, k2, k2, jnp.asarray([1, 1, 1]), mesh,
                              interpret=True)
