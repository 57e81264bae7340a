"""Flagship MLP: forward/grad/training through the framework's matmul, and
dp/tp sharded training on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.models.mlp import (
    batch_sharding, init_params, loss_fn, make_batch, mlp_forward,
    shard_params, train_step,
)
from gemm_hls_tpu.parallel.mesh import make_mesh

CFG = GemmConfig(block_m=16, block_n=128, block_k=128, interpret=True)
DIMS = (128, 256, 128)


def test_forward_matches_plain_jax():
    key = jax.random.PRNGKey(0)
    params = init_params(key, DIMS)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, DIMS[0]), jnp.float32)
    out = mlp_forward(params, x, config=CFG)

    h = x
    for i, (w, b) in enumerate(params):
        h = h @ w + b
        if i + 1 < len(params):
            h = jax.nn.relu(h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(h), rtol=1e-4,
                               atol=1e-5)


def test_train_step_reduces_loss():
    key = jax.random.PRNGKey(0)
    params = init_params(key, DIMS)
    batch = make_batch(jax.random.PRNGKey(2), 64, DIMS[0], DIMS[-1])
    l0 = loss_fn(params, batch, config=CFG)
    for _ in range(5):
        params, loss = train_step(params, batch, config=CFG, lr=1e-2)
    assert float(loss) < float(l0)


def test_sharded_training_step_dp_tp():
    mesh = make_mesh((4, 2), axis_names=("dp", "tp"))
    key = jax.random.PRNGKey(0)
    params = shard_params(init_params(key, DIMS), mesh)
    batch = make_batch(jax.random.PRNGKey(2), 64, DIMS[0], DIMS[-1])
    batch = jax.device_put(batch, batch_sharding(mesh))
    params2, loss = train_step(params, batch, config=CFG, lr=1e-2)
    assert jnp.isfinite(loss)
    # Weight shardings preserved through the step.
    w0 = params2[0][0]
    assert w0.sharding.spec == jax.sharding.PartitionSpec(None, "tp")


def test_sharded_matches_unsharded():
    mesh = make_mesh((4, 2), axis_names=("dp", "tp"))
    key = jax.random.PRNGKey(0)
    params = init_params(key, DIMS)
    batch = make_batch(jax.random.PRNGKey(2), 32, DIMS[0], DIMS[-1])
    p_ref, loss_ref = train_step(params, batch, config=CFG, lr=1e-2)
    p_sh, loss_sh = train_step(shard_params(params, mesh),
                               jax.device_put(batch, batch_sharding(mesh)),
                               config=CFG, lr=1e-2)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_sh[0][0]), np.asarray(p_ref[0][0]),
                               rtol=1e-4, atol=1e-6)


def test_checkpoint_roundtrip_npz(tmp_path):
    from gemm_hls_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    params = init_params(jax.random.PRNGKey(0), DIMS)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, params)
    restored = load_checkpoint(p, like=params)
    for (w1, b1), (w2, b2) in zip(params, restored):
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_checkpoint_roundtrip_orbax(tmp_path):
    from gemm_hls_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    params = init_params(jax.random.PRNGKey(1), DIMS)
    p = str(tmp_path / "orbax_ck")
    save_checkpoint(p, params)
    restored = load_checkpoint(p, like=params)
    np.testing.assert_array_equal(np.asarray(params[0][0]),
                                  np.asarray(restored[0][0]))


def test_fused_inference_matches_unfused():
    key = jax.random.PRNGKey(0)
    params = init_params(key, DIMS)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, DIMS[0]), jnp.float32)
    ref = mlp_forward(params, x, config=CFG)
    fused = mlp_forward(params, x, config=CFG, fused=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_fused_training_matches_unfused():
    key = jax.random.PRNGKey(0)
    params = init_params(key, DIMS)
    batch = make_batch(jax.random.PRNGKey(2), 32, DIMS[0], DIMS[-1])
    g_ref = jax.grad(lambda p: loss_fn(p, batch, config=CFG))(params)
    g_fused = jax.grad(lambda p: jnp.mean(
        (mlp_forward(p, batch[0], config=CFG, fused=True) - batch[1]) ** 2
    ))(params)
    np.testing.assert_allclose(np.asarray(g_fused[0][0]),
                               np.asarray(g_ref[0][0]), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fused[1][1]),
                               np.asarray(g_ref[1][1]), rtol=1e-3, atol=1e-6)


def test_checkpoint_npz_rejects_shape_mismatch(tmp_path):
    """Regression: same leaf count but different shapes must raise, not
    silently restore arrays into the wrong pytree slots (ADVICE r1)."""
    import pytest
    from gemm_hls_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    state = {"w": np.ones((4, 8), np.float32), "b": np.zeros((8,), np.float32)}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state)
    bad_template = {"w": np.ones((8, 4), np.float32),
                    "b": np.zeros((8,), np.float32)}
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(p, like=bad_template)
