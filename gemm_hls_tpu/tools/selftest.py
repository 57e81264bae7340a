"""Hardware self-test: one command to verify the full compute surface on
the current backend (compiled kernels on TPU; interpreter on CPU).

    python -m gemm_hls_tpu.tools.selftest [--quick]

The hardware-validation counterpart of the CPU test suite — the analogue of
running ``RunHardware.exe ... on`` across the supported configuration space
(reference ``host/RunHardware.cpp:199-227``): every dtype/semiring/shape
class is executed end-to-end and compared against the host oracle.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--quick", action="store_true",
                   help="smaller shapes (skip the 1024^3 checks)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemm_hls_tpu import GemmConfig, matmul
    from gemm_hls_tpu.ops.ozaki import ozaki_matmul
    from gemm_hls_tpu.utils.verify import (
        check_result, make_operands, reference_matmul,
    )

    big = 256 if args.quick else 1024
    results = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            ok, err = fn()
            status = "PASS" if ok else "FAIL"
        except Exception as e:  # noqa: BLE001
            ok, err, status = False, None, f"ERROR ({type(e).__name__}: {e})"
        dt = time.perf_counter() - t0
        detail = f" maxerr={err:.2e}" if isinstance(err, float) else ""
        print(f"[{status}] {name}{detail} ({dt:.1f}s)", flush=True)
        results.append(ok)

    def gemm_case(m, n, k, dtype, semiring="plus_times", rtol=None, **kw):
        def run():
            a, b = make_operands(m, n, k, dtype)
            out = jax.jit(lambda x, y: matmul(x, y, semiring=semiring,
                                              **kw))(jnp.asarray(a),
                                                     jnp.asarray(b))
            exp = reference_matmul(a, b, semiring=semiring)
            return check_result(np.asarray(out), exp, rtol=rtol)
        return run

    backend = jax.default_backend()
    print(f"selftest on backend={backend}, devices={len(jax.devices())}")

    check(f"fp32 {big}^3 MXU (1e-3 regime)", gemm_case(big, big, big, "float32"))
    check(f"bf16 {big}^3 MXU fp32-acc",
          gemm_case(big, big, big, "bfloat16", rtol=1e-2,
                    out_dtype="float32"))
    check("unaligned 333x517x129 fp32", gemm_case(333, 517, 129, "float32"))
    # K-tail masking across multiple K grid steps (k_rem path of the
    # compiled MXU kernel: 777 % 256 = 9, 4 K steps) plus M/N edge-store
    # masking, bf16 — the in-kernel analogue of the reference's
    # dynamic-size bounds masking (kernel/Compute.cpp:112-137).
    check("unaligned bf16 multi-K-step (k_rem)",
          gemm_case(515, 389, 777, "bfloat16", rtol=1e-2,
                    out_dtype="float32",
                    config=GemmConfig(dtype="bfloat16", block_m=256,
                                      block_n=256, block_k=256)))
    check("int8 -> int32 MXU",
          gemm_case(256, 256, 512, "int8", out_dtype="int32"))
    check("min_plus VPU (distance product)",
          gemm_case(256, 512, 300, "float32", semiring="min_plus"))
    check("max_min VPU (widest path)",
          gemm_case(128, 256, 200, "float32", semiring="max_min"))
    check("or_and bool reachability (MXU counting)",
          gemm_case(64, 128, 96, "bool", semiring="or_and"))
    check("or_and bit-packed VPU (backend=pallas-vpu)",
          gemm_case(64, 128, 97, "bool", semiring="or_and",
                    backend="pallas-vpu"))

    def grad_check():
        a, b = make_operands(64, 128, 96, "float32")
        a, b = jnp.asarray(a), jnp.asarray(b)
        ga = jax.grad(lambda x: jnp.sum(matmul(x, b) ** 2))(a)
        ra = 2.0 * (np.asarray(a) @ np.asarray(b)) @ np.asarray(b).T
        return check_result(np.asarray(ga), ra.astype(np.float64), rtol=1e-3)
    check("custom VJP gradient", grad_check)

    def ozaki_check():
        rng = np.random.default_rng(5)
        a = rng.uniform(-5, 5, (128, 256))
        b = rng.uniform(-5, 5, (256, 128))
        got = ozaki_matmul(a, b)
        exp = a @ b
        normw = float((np.abs(got - exp) /
                       (np.linalg.norm(a, axis=1)[:, None]
                        * np.linalg.norm(b, axis=0)[None, :])).max())
        return normw < 1e-13, normw
    check("f64-class Ozaki (normwise < 1e-13)", ozaki_check)

    def ozaki_fused_int8_check():
        from gemm_hls_tpu.ops.ozaki import ozaki_matmul_int8
        rng = np.random.default_rng(6)
        a = rng.uniform(-5, 5, (160, 300))
        b = rng.uniform(-5, 5, (300, 140))
        got = ozaki_matmul_int8(a, b)
        exp = a @ b
        normw = float((np.abs(got - exp) /
                       (np.linalg.norm(a, axis=1)[:, None]
                        * np.linalg.norm(b, axis=0)[None, :])).max())
        return normw < 1e-13, normw
    check("f64-class fused Ozaki-int8 (normwise < 1e-13)",
          ozaki_fused_int8_check)

    def int8_slices_check():
        from gemm_hls_tpu.ops.int8_slices import fp32_matmul_int8
        a, b = make_operands(256, 256, 512, "float32", low=-5.0, high=5.0)
        got = np.asarray(fp32_matmul_int8(
            jnp.asarray(a), jnp.asarray(b), block_m=256, block_n=256,
            block_k=512, n_slices=3))
        exp = a.astype(np.float64) @ b
        normw = float((np.abs(got - exp)
                       / (np.linalg.norm(a, axis=1)[:, None]
                          * np.linalg.norm(b, axis=0)[None, :])).max())
        return normw < 2e-6, normw
    check("fp32 via int8 slices (normwise < 2e-6)", int8_slices_check)

    def ring_kernel_check():
        # Degenerate 1-device ring: no RDMA fires, but the kernel skeleton
        # (ANY-space refs, VMEM staging DMAs, dynamic output slices)
        # compiles and runs on the real toolchain.
        from jax.sharding import Mesh
        from gemm_hls_tpu.ops.pallas_ring import (
            ring_matmul, shard_operands_ring,
        )
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
        a, b = make_operands(64, 128, 256, "float32")
        a_s, b_s = shard_operands_ring(jnp.asarray(a), jnp.asarray(b), mesh)
        out = ring_matmul(a_s, b_s, mesh)
        exp = reference_matmul(a, b)
        ok1, e1 = check_result(np.asarray(out), exp, rtol=1e-3)
        out2 = ring_matmul(a_s, b_s, mesh, block_k=128)
        ok2, e2 = check_result(np.asarray(out2), exp, rtol=1e-3)
        return ok1 and ok2, max(e1, e2)
    check("fused ring kernel (1-chip degenerate)", ring_kernel_check)

    def fused_linear_grad_check():
        from gemm_hls_tpu.ops.fused_linear import fused_linear
        x, w = make_operands(64, 128, 96, "float32", low=-1.0, high=1.0)
        bias = np.linspace(-0.5, 0.5, 128).astype(np.float32)
        x, w, bias = jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias)
        gw = jax.grad(lambda ww: jnp.sum(
            fused_linear(x, ww, bias, "relu") ** 2), argnums=0)(w)
        # Reference at HIGHEST precision (XLA's default f32 dot on TPU is
        # single-pass bf16, ~4e-3 — the reference would be the noisy side);
        # scale-aware compare (near-zero gradient entries).
        hi = jax.lax.Precision.HIGHEST
        rw = jax.grad(lambda ww: jnp.sum(jax.nn.relu(
            jnp.dot(x, ww, precision=hi) + bias) ** 2), argnums=0)(w)
        rw = np.asarray(rw, np.float64)
        err = float((np.abs(np.asarray(gw) - rw)
                     / np.maximum(np.abs(rw).max() * 1e-2, np.abs(rw))).max())
        return err < 1e-3, err
    check("fused linear custom-VJP gradient", fused_linear_grad_check)

    def epilogue_check():
        a, b = make_operands(64, 128, 96, "float32", low=-3.0, high=3.0)
        bias = np.linspace(-2, 2, 128).astype(np.float32)
        out = jax.jit(lambda x, y, z: matmul(
            x, y, epilogue=_bias_relu, epilogue_operands=(z,)))(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(bias))
        exp = np.maximum(a.astype(np.float64) @ b + bias, 0.0)
        # Scale-aware compare: ReLU outputs crossing zero make element-wise
        # relative error meaningless at the kink.
        err = float((np.abs(np.asarray(out) - exp)
                     / np.maximum(np.abs(exp), 1.0)).max())
        return err < 1e-3, err
    check("fused bias+relu epilogue", epilogue_check)

    def batched_epilogue_grad_check():
        # Batched fast path with a fused epilogue, differentiated — the
        # compiled path behind the attention-scores example.
        rng = np.random.default_rng(7)
        a = jnp.asarray(rng.uniform(-1, 1, (8, 128, 64)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (8, 64, 128)).astype(np.float32))
        bias = jnp.asarray(np.linspace(-0.5, 0.5, 128).astype(np.float32))
        ga = jax.grad(lambda x: jnp.sum(matmul(
            x, b, epilogue=_bias_relu, epilogue_operands=(bias,)) ** 2))(a)
        hi = jax.lax.Precision.HIGHEST
        ra = jax.grad(lambda x: jnp.sum(jax.nn.relu(
            jax.lax.dot_general(x, b, (((2,), (1,)), ((0,), (0,))),
                                precision=hi) + bias) ** 2))(a)
        ra = np.asarray(ra, np.float64)
        err = float((np.abs(np.asarray(ga) - ra)
                     / np.maximum(np.abs(ra).max() * 1e-2, np.abs(ra))).max())
        return err < 1e-3, err
    check("batched fused-epilogue gradient", batched_epilogue_grad_check)

    def batched_bf16_grad_check():
        # bf16 batched backward: the cotangent arrives f32 against bf16
        # saved operands — exercises the mixed-dtype batch_block sizing.
        rng = np.random.default_rng(8)
        a = jnp.asarray(rng.uniform(-1, 1, (8, 128, 64))).astype(jnp.bfloat16)
        b = jnp.asarray(rng.uniform(-1, 1, (8, 64, 128))).astype(jnp.bfloat16)
        ga = jax.grad(lambda x: jnp.sum(matmul(
            x, b, out_dtype="float32") ** 2))(a)
        hi = jax.lax.Precision.HIGHEST
        ra = jax.grad(lambda x: jnp.sum(jax.lax.dot_general(
            x, b, (((2,), (1,)), ((0,), (0,))), precision=hi,
            preferred_element_type=jnp.float32) ** 2))(a)
        ra = np.asarray(ra.astype(jnp.float32), np.float64)
        err = float((np.abs(np.asarray(ga.astype(jnp.float32)) - ra)
                     / np.maximum(np.abs(ra).max() * 1e-1, np.abs(ra))).max())
        return err < 5e-2, err
    check("bf16 batched gradient (mixed-dtype bwd)", batched_bf16_grad_check)

    def flash_attention_check():
        # One-kernel flash attention, compiled: causal + GQA (4 q heads
        # on 2 kv heads), streamed kv (block_kv < S), fwd vs oracle and
        # a finite backward through the flash dq/dkv kernels.
        from gemm_hls_tpu.ops.attention import flash_attention

        rng = np.random.default_rng(11)
        hq, hkv, s, d = 4, 2, 384, 128
        q = jnp.asarray(rng.standard_normal((hq, s, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((hkv, s, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((hkv, s, d)).astype(np.float32))
        out = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, causal=True, block_q=128, block_kv=128))(q, k, v)
        q64 = np.asarray(q, np.float64)
        k64 = np.repeat(np.asarray(k, np.float64), hq // hkv, axis=0)
        v64 = np.repeat(np.asarray(v, np.float64), hq // hkv, axis=0)
        sc = q64 @ k64.transpose(0, 2, 1) / np.sqrt(d)
        sc = np.where(np.tril(np.ones((s, s), bool)), sc, -np.inf)
        e = np.exp(sc - sc.max(-1, keepdims=True))
        exp = (e / e.sum(-1, keepdims=True)) @ v64
        err = float(np.abs(np.asarray(out, np.float64) - exp).max()
                    / np.abs(exp).max())
        dq = jax.jit(jax.grad(lambda q: jnp.sum(flash_attention(
            q, k, v, causal=True, block_q=128, block_kv=128) ** 2)))(q)
        grads_finite = bool(jnp.isfinite(dq).all())
        return err < 5e-3 and grads_finite, err
    check("flash attention (causal GQA, streamed kv) + grad",
          flash_attention_check)

    def quantized_matmul_check():
        # Fused-dequant weight-only quantized GEMM (int8 per-channel +
        # planar int4 group-wise) vs the host dequant oracle.
        from gemm_hls_tpu.ops.quant import (
            dequantize_weights, matmul_quantized, quantize_weights,
        )

        rng = np.random.default_rng(13)
        w = (rng.standard_normal((512, 256)) / 16).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((32, 512)), jnp.bfloat16)
        worst = 0.0
        for bits, g in ((8, None), (4, 128)):
            wq, s = quantize_weights(w, bits=bits, group_size=g)
            got = np.asarray(jax.jit(lambda a, b, c: matmul_quantized(
                a, b, c, bits=bits, group_size=g, out_dtype="float32"))(
                x, jnp.asarray(wq), jnp.asarray(s)), np.float32)
            ref = np.asarray(x, np.float32) @ dequantize_weights(
                wq, s, bits=bits, group_size=g)
            worst = max(worst, float(np.abs(got - ref).max()
                                     / np.abs(ref).max()))
        # bf16 activations bound the fused-vs-host agreement at ~1e-2.
        return worst < 2e-2, worst
    check("quantized GEMM (int8 + int4 fused dequant)",
          quantized_matmul_check)

    def grouped_matmul_check():
        # Ragged MoE expert GEMM: one kernel over a dynamic row partition
        # (boundary tiles merged by disjoint-row select, defined-zero
        # tail), forward vs per-group host oracle + grads finite.
        from gemm_hls_tpu.ops.grouped import grouped_matmul

        rng = np.random.default_rng(17)
        m, k, n, G = 512, 256, 256, 4
        gs = [150, 0, 299, 50]  # empty group, unaligned boundaries, tail
        lhs = jnp.asarray(rng.uniform(-1, 1, (m, k)), jnp.bfloat16)
        rhs = jnp.asarray(rng.uniform(-1, 1, (G, k, n)), jnp.bfloat16)
        cfg = GemmConfig(dtype="bfloat16", out_dtype="float32",
                         block_m=128, block_n=128, block_k=128)
        gsa = jnp.asarray(gs, jnp.int32)
        got = np.asarray(grouped_matmul(lhs, rhs, gsa, cfg), np.float32)
        ref = np.zeros_like(got)
        s = 0
        for g, sz in enumerate(gs):
            ref[s:s + sz] = (np.asarray(lhs, np.float32)[s:s + sz]
                             @ np.asarray(rhs, np.float32)[g])
            s += sz
        err = float(np.abs(got - ref).max() / np.abs(ref).max())
        if not (err < 2e-2 and np.all(got[sum(gs):] == 0)):
            return False, err
        gl, gr = jax.grad(
            lambda a, b: jnp.sum(grouped_matmul(a, b, gsa, cfg) ** 2),
            argnums=(0, 1))(lhs, rhs)
        ok = bool(jnp.isfinite(gl.astype(jnp.float32)).all()
                  and jnp.isfinite(gr.astype(jnp.float32)).all()
                  and (jnp.abs(gr[1].astype(jnp.float32)).max() == 0))
        return ok and err < 2e-2, err
    check("grouped MoE GEMM (ragged partition + grad)",
          grouped_matmul_check)

    n_pass = sum(results)
    print(f"{n_pass}/{len(results)} checks passed")
    return 0 if n_pass == len(results) else 1


def _bias_relu(acc, bias):
    import jax
    return jax.nn.relu(acc + bias)


if __name__ == "__main__":
    sys.exit(main())
