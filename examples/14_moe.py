"""Mixture-of-experts on the grouped (ragged) CA-GEMM kernel.

End-to-end MoE story: raw grouped matmul vs `jax.lax.ragged_dot`, a
top-2-routed expert FFN that trains (gradients through router, dispatch,
and both grouped GEMMs), and the expert-parallel variant over a device
mesh (experts sharded on an `ep` axis, partial outputs psum-merged).

The key TPU-native property: the grouped kernel's schedule is a *static*
upper bound over the dynamic routing, so re-routing every step never
recompiles — verify by watching the trace counter stay at 1.

    python examples/14_moe.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from gemm_hls_tpu import GemmConfig, grouped_matmul
from gemm_hls_tpu.models.moe import (MoEConfig, init_moe_params, moe_forward,
                                     moe_forward_ep, moe_train_step)

ON_TPU = jax.default_backend() == "tpu"


def main():
    rng = np.random.default_rng(5)

    # --- raw grouped GEMM: one matmul per expert over a ragged row
    # partition, one kernel launch total -------------------------------
    m, k, n, G = (2048, 512, 1024, 8) if ON_TPU else (128, 64, 64, 4)
    gs = rng.multinomial(m, np.ones(G) / G)
    lhs = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((G, k, n)), jnp.float32)
    cfg = (GemmConfig(block_m=256, block_n=512, block_k=512) if ON_TPU
           else GemmConfig(block_m=32, block_n=32, block_k=32,
                           interpret=True))
    out = grouped_matmul(lhs, rhs, jnp.asarray(gs, jnp.int32), cfg)
    # HIGHEST so the oracle matches our f32 contract precision (on TPU
    # ragged_dot otherwise takes the multi-pass bf16 decomposition).
    want = jax.lax.ragged_dot(lhs, rhs, jnp.asarray(gs, jnp.int32),
                              precision=jax.lax.Precision.HIGHEST)
    total = int(gs.sum())
    err = float(jnp.abs(out[:total] - want[:total]).max()
                / jnp.abs(want[:total]).max())
    print(f"grouped_matmul vs ragged_dot ({m}x{k}x{n}, {G} experts, "
          f"sizes {[int(v) for v in gs]}): rel err {err:.2e}")
    assert err < 1e-5

    # --- top-2 routed MoE FFN trains, and never recompiles ------------
    mcfg = MoEConfig(d_model=64, d_ff=128, num_experts=G, top_k=2,
                     gemm=cfg.replace(block_m=32, block_n=32, block_k=32)
                     if not ON_TPU else None)
    params = init_moe_params(jax.random.key(0), mcfg)
    x = jax.random.normal(jax.random.key(1), (256, mcfg.d_model))
    y = jnp.tanh(x @ jax.random.normal(jax.random.key(2),
                                       (mcfg.d_model, mcfg.d_model)))
    losses = []
    for _ in range(6):
        params, loss = moe_train_step(params, (x, y), mcfg, lr=0.05)
        losses.append(float(loss))
    print(f"MoE train: loss {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"(router + experts learned)")
    assert losses[-1] < losses[0]

    # --- expert parallelism over a mesh --------------------------------
    n_dev = jax.device_count()
    ep = max((d for d in (8, 4, 2, 1) if n_dev % d == 0 and G % d == 0))
    if ep > 1:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()).reshape(n_dev // ep, ep),
                    ("dp", "ep"))
        y_ep = moe_forward_ep(params, x, mcfg, mesh)
        y_1d = moe_forward(params, x, mcfg)
        err = float(jnp.abs(y_ep - y_1d).max() / jnp.abs(y_1d).max())
        print(f"expert-parallel (dp={n_dev // ep}, ep={ep}) matches "
              f"single-device: rel err {err:.2e}")
        assert err < 1e-4
    else:
        print(f"expert parallelism skipped ({n_dev} device(s))")


if __name__ == "__main__":
    main()
