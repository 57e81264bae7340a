"""Headline benchmark: bf16 8192^3 CA-GEMM on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N, ...}

vs_baseline compares against the reference's best published number — 462
GFLOP/s half-precision GEMM on a Xilinx VCU1525 (reference README.md:8,
BASELINE.md).  Extra fields: %-of-datasheet-MXU-peak, ratio vs XLA's own
jnp.dot on the same problem, and secondary dtype/semiring benchmarks
(fp32 at full accuracy and in the opt-in fast mode, int8, min_plus VPU,
f64-class Ozaki).

Protocol mirrors the reference host driver (host/RunHardware.cpp): seeded
operands, correctness check against the BLAS oracle (at a size where the
host oracle is tractable), then timed runs reporting GOp/s = 2*M*N*K/t.
Timing uses the tamper-proof on-device loop (utils/benchmark.py).
"""

import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from gemm_hls_tpu import GemmConfig, matmul
    from gemm_hls_tpu.models.perf_model import detect_chip
    from gemm_hls_tpu.utils.benchmark import gflops, percent_of_peak, time_fn
    from gemm_hls_tpu.utils.verify import (
        check_result, make_operands, reference_matmul,
    )

    on_tpu = jax.default_backend() == "tpu"
    chip = detect_chip()
    log(f"backend={jax.default_backend()} chip={chip.name}")

    if on_tpu:
        size = 8192
        candidates = [
            dict(block_m=512, block_n=1024, block_k=8192),
            dict(block_m=1024, block_n=512, block_k=8192),
            dict(block_m=512, block_n=1024, block_k=4096),
            dict(block_m=2048, block_n=1024, block_k=512),
            dict(block_m=512, block_n=1024, block_k=1024),
        ]
        iters, verify_size = 10, 1024
    else:  # CPU smoke mode so the script stays runnable anywhere
        size = 512
        candidates = [dict(block_m=128, block_n=128, block_k=128)]
        iters, verify_size = 3, 256

    base = GemmConfig(dtype="bfloat16", out_dtype="bfloat16")

    # ---- correctness gate (RunHardware verify protocol) -------------------
    vcfg = base.replace(**candidates[0])
    a_v, b_v = make_operands(verify_size, verify_size, verify_size, "bfloat16")
    out = jax.jit(lambda x, y: matmul(x, y, config=vcfg, out_dtype="float32"))(
        jnp.asarray(a_v), jnp.asarray(b_v))
    ok, err = check_result(np.asarray(out), reference_matmul(a_v, b_v),
                           rtol=1e-2)
    log(f"verify bf16 @ {verify_size}^3: {'PASS' if ok else 'FAIL'} ({err:.2e})")

    # fp32 within the reference's 1e-3 tolerance (TestSimulation.cpp:79-85).
    a_f, b_f = make_operands(verify_size, verify_size, verify_size, "float32")
    cfg_f32 = GemmConfig(dtype="float32", block_m=512, block_n=512, block_k=512)
    out_f = jax.jit(lambda x, y: matmul(x, y, config=cfg_f32))(
        jnp.asarray(a_f), jnp.asarray(b_f))
    ok_f, err_f = check_result(np.asarray(out_f), reference_matmul(a_f, b_f),
                               rtol=1e-3)
    log(f"verify fp32 @ {verify_size}^3 (rtol 1e-3): "
        f"{'PASS' if ok_f else 'FAIL'} ({err_f:.2e})")
    if not (ok and ok_f):
        print(json.dumps({"metric": "bf16_gemm_8192_gflops", "value": 0.0,
                          "unit": "GFLOP/s", "vs_baseline": 0.0,
                          "error": "verification failed"}))
        return 1

    m = n = k = size
    # Operands generated on device (host->HBM transfers over remote-attached
    # links run at tens of MB/s; 8192^2 operands would dominate wall time).
    import functools

    @functools.partial(jax.jit, static_argnames=("dtype",))
    def gen(seed, dtype=jnp.bfloat16):
        ka, kb = jax.random.split(jax.random.PRNGKey(seed))
        return (jax.random.uniform(ka, (m, k), jnp.float32, 1.0, 10.0).astype(dtype),
                jax.random.uniform(kb, (k, n), jnp.float32, 1.0, 10.0).astype(dtype))

    a16, b16 = gen(5)

    def bench_one(name, fn, pair, it=iters):
        t0 = time.perf_counter()
        try:
            secs = time_fn(fn, [pair], iters=it)
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            return None
        gf = gflops(m, n, k, secs)
        log(f"{name}: {secs * 1e3:.2f} ms -> {gf:.0f} GFLOP/s "
            f"(wall incl. compile {time.perf_counter() - t0:.0f}s)")
        return gf

    # ---- headline: bf16 autotuned over candidates -------------------------
    # Sanity guard: the slope-timing protocol can under-measure when the
    # relay hiccups mid-sample, producing a physically impossible rate.
    # Every candidate reading above the hardware peak is re-measured (most
    # conservative reading kept), so a bogus sample can neither pick the
    # wrong winner nor inflate the headline.
    # GFLOP/s units throughout (time_fn results are GF; peak_for is FLOP/s —
    # the round-1 check compared across units and could never fire).
    peak = chip.peak_for("bfloat16") / 1e9

    def sane(name, fn, pair, gf, retries=4, ceiling=None, mnk=None):
        """Reject physically impossible readings: re-measure while the rate
        exceeds ``ceiling`` (default: the dtype's hardware peak), keeping
        the most conservative sample.  ``ceiling`` lets slice-scheme
        metrics use their pass-count bound (e.g. f64-class <= int8_peak/36),
        catching artifacts the raw peak check would miss."""
        cap = ceiling if ceiling is not None else peak
        tries = 0
        while gf and gf > cap and tries < retries:
            tries += 1
            log(f"{name} reads {gf:.0f} GFLOP/s > {cap:.0f} ceiling — "
                f"re-measuring ({tries}/{retries})")
            try:
                secs = time_fn(fn, [pair], iters=max(iters, 8))
            except Exception as e:  # noqa: BLE001
                log(f"{name} re-measure FAILED: {e}")
                break
            mm, nn, kk = mnk or (m, n, k)
            gf = min(gf, gflops(mm, nn, kk, secs))
        return gf

    best_gf, best_cfg = 0.0, None
    for cand in candidates:
        cfg = base.replace(**cand)
        try:
            cfg.validate()
        except ValueError as e:
            log(f"blocks {cand}: invalid ({e})")
            continue
        fn = jax.jit(lambda x, y, c=cfg: matmul(x, y, config=c))
        gf = sane(f"pallas bf16 {cand}", fn, (a16, b16),
                  bench_one(f"pallas bf16 {cand}", fn, (a16, b16)), retries=2)
        if gf and gf > best_gf:
            best_gf, best_cfg = gf, cfg

    if best_cfg is None:
        print(json.dumps({"metric": "bf16_gemm_8192_gflops", "value": 0.0,
                          "unit": "GFLOP/s", "vs_baseline": 0.0,
                          "error": "all configurations failed"}))
        return 1

    # Winner protocol: interleaved median-of-5 against XLA's dot — paired
    # back-to-back samples cancel relay/clock drift, medians reject
    # hiccups, and the published value is a median (not a max).  Five
    # rounds (was three): BENCH_r03's 0.983 ratio sat inside the
    # observed +-2%-per-median noise band of the 3-round protocol.
    win_fn = jax.jit(lambda x, y, c=best_cfg: matmul(x, y, config=c))
    xla_fn = jax.jit(lambda x, y: jnp.dot(x, y))
    p_samples, x_samples = [], []
    for r in range(5):
        gp = bench_one(f"winner median round {r}", win_fn, (a16, b16))
        gx = bench_one(f"xla jnp.dot bf16 round {r}", xla_fn, (a16, b16))
        if gp:
            p_samples.append(gp)
        if gx:
            x_samples.append(gx)
    if p_samples:
        best_gf = sorted(p_samples)[len(p_samples) // 2]
    xla_gf = sorted(x_samples)[len(x_samples) // 2] if x_samples else None
    best_gf = sane("winner", win_fn, (a16, b16), best_gf)
    # If retries never produced a physically possible reading, publish it
    # flagged rather than as a (bogus) record.
    unreliable = best_gf > peak
    log(f"bf16 winner (median of {len(p_samples)}): {best_gf:.0f} vs xla "
        f"{xla_gf or 0:.0f} -> ratio {best_gf / xla_gf if xla_gf else 0:.4f}")

    a32, b32 = gen(6, jnp.float32)
    # fp32 modes, from most to least accurate.  Each is verified at 1024^3
    # against the f64 oracle below; the headline fp32 number is the fastest
    # mode that passes the reference's 1e-3 verification contract
    # (TestSimulation.cpp:79-85) — the same semantics as the reference's
    # benchmark (RunHardware reports the verified kernel's rate).
    f32_modes = {
        "highest": jax.jit(lambda x, y: matmul(x, y, config=cfg_f32)),
        "i8x4": jax.jit(lambda x, y: matmul(
            x, y, config=cfg_f32.replace(precision="i8x4"))),
        "i8x3": jax.jit(lambda x, y: matmul(
            x, y, config=cfg_f32.replace(precision="i8x3"))),
        "i8x2": jax.jit(lambda x, y: matmul(
            x, y, config=cfg_f32.replace(precision="i8x2"))),
        "default": jax.jit(lambda x, y: matmul(
            x, y, config=cfg_f32.replace(precision="default"))),
    }
    exp_f = reference_matmul(a_f, b_f)
    f32_err = {}
    for name, fn in f32_modes.items():
        try:
            out_m = fn(jnp.asarray(a_f), jnp.asarray(b_f))
            _, f32_err[name] = check_result(np.asarray(out_m), exp_f,
                                            rtol=1e-3)
        except Exception as e:  # noqa: BLE001
            log(f"fp32 mode {name} verify FAILED: {e}")
            f32_err[name] = float("inf")
        log(f"fp32 mode {name} @ {verify_size}^3 rel err: "
            f"{f32_err[name]:.2e}")

    f32_rate = {}
    f32_rate["highest"] = bench_one(
        "pallas fp32 HIGHEST (full accuracy)", f32_modes["highest"],
        (a32, b32))
    f32_fast_gf = bench_one(
        "pallas fp32 fast mode (~5e-4 err)", f32_modes["default"], (a32, b32))
    f32_rate["default"] = f32_fast_gf
    xla_f32_hi_gf = bench_one(
        "xla jnp.dot fp32 HIGHEST",
        jax.jit(lambda x, y: jnp.dot(
            x, y, precision=jax.lax.Precision.HIGHEST)), (a32, b32))

    if on_tpu:
        @jax.jit
        def gen_i8(seed):
            ka, kb = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.randint(ka, (m, k), -10, 10, jnp.int8),
                    jax.random.randint(kb, (k, n), -10, 10, jnp.int8))
        ai, bi = gen_i8(7)
        cfg_i8 = GemmConfig(dtype="int8", out_dtype="int32", block_m=512,
                            block_n=1024, block_k=8192)
        int8_fn = jax.jit(lambda x, y: matmul(x, y, config=cfg_i8))
        int8_gf = sane("pallas int8", int8_fn, (ai, bi),
                       bench_one("pallas int8", int8_fn, (ai, bi)),
                       ceiling=chip.peak_for("int8") / 1e9)
        # f64-class GEMM via Ozaki slices on the bf16 MXU (device-resident
        # timing; the reference's double-precision headline is 132 GFLOP/s).
        oz_gf = None
        try:
            from gemm_hls_tpu.ops.ozaki import split_f64_int8
            from gemm_hls_tpu.ops.pallas_ozaki import fused_ozaki_int8
            oz = 2048
            rng = np.random.default_rng(5)
            a64 = rng.uniform(-5.0, 5.0, (oz, oz))
            b64 = rng.uniform(-5.0, 5.0, (oz, oz))
            sa, _ = split_f64_int8(a64, 8, axis=1)
            sb, _ = split_f64_int8(b64, 8, axis=0)
            foz = jax.jit(lambda x, y: fused_ozaki_int8(x, y, n_diags=8))
            oz_pair = (jnp.asarray(sa), jnp.asarray(sb))
            t_oz = time_fn(foz, [oz_pair], iters=5)
            oz_gf = gflops(oz, oz, oz, t_oz)
            log(f"ozaki f64-class {oz}^3 (fused int8 kernel, device): "
                f"{t_oz * 1e3:.1f} ms -> {oz_gf:.0f} GFLOP/s")
            # Physical bound: 36 exact int8 products per output — a rate
            # above int8_peak/36 is a timing artifact, not a record.
            oz_gf = sane("ozaki f64-class", foz, oz_pair, oz_gf,
                         ceiling=chip.peak_for("int8") / 1e9 / 36,
                         mnk=(oz, oz, oz))
        except Exception as e:  # noqa: BLE001
            log(f"ozaki bench FAILED: {e}")

        # fp32-class GEMM on the int8 MXU path (integer slices).  Pass-count
        # ceilings: 3 exact products for i8x2, 6 for i8x3, 10 for i8x4
        # (which reaches the f32 output rounding floor, ~3.9e-8).
        for ns, passes in (("i8x2", 3), ("i8x3", 6), ("i8x4", 10)):
            f32_rate[ns] = sane(
                f"fp32 via int8 slices ({ns})", f32_modes[ns], (a32, b32),
                bench_one(f"fp32 via int8 slices ({ns})", f32_modes[ns],
                          (a32, b32)),
                ceiling=chip.peak_for("int8") / 1e9 / passes)
        i8x2_gf, i8x3_gf = f32_rate.get("i8x2"), f32_rate.get("i8x3")
        i8x4_gf = f32_rate.get("i8x4")

        # int8 platform-parity baseline: XLA's own int8->int32 dot.
        xla_i8_fn = jax.jit(lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        xla_int8_gf = sane("xla int8 dot", xla_i8_fn, (ai, bi),
                           bench_one("xla int8 dot", xla_i8_fn, (ai, bi)),
                           ceiling=chip.peak_for("int8") / 1e9)

        mp_size = 4096
        amp = a32[:mp_size, :mp_size]
        bmp = b32[:mp_size, :mp_size]
        cfg_mp = GemmConfig(dtype="float32", semiring="min_plus",
                            block_m=16, block_n=2048, block_k=2048,
                            vmem_limit_bytes=128 * 1024 * 1024)
        t_mp = None
        try:
            t_mp = time_fn(jax.jit(lambda x, y: matmul(
                x, y, semiring="min_plus", config=cfg_mp)), [(amp, bmp)],
                iters=5)
            log(f"pallas min_plus {mp_size}^3 (VPU): {t_mp * 1e3:.1f} ms -> "
                f"{gflops(mp_size, mp_size, mp_size, t_mp):.0f} GOp/s")
        except Exception as e:  # noqa: BLE001
            log(f"min_plus bench FAILED: {e}")

        # Flash attention at the per-head workload (32 heads, 1024^2
        # scores, head_dim 128): one-kernel streaming softmax(QK^T)V vs
        # jax.nn.dot_product_attention.  Both sides produce the real
        # (B, S, D) output — consumer-matched, no fusion elision possible.
        flash_tf = dpa_tf = flash_causal_tf = None
        try:
            from gemm_hls_tpu.ops.attention import flash_attention

            fb, fs, fd = 32, 1024, 128
            fl_flops = 4 * fb * fs * fs * fd
            frng = np.random.default_rng(5)
            qa = jnp.asarray(frng.standard_normal((fb, fs, fd)),
                             jnp.bfloat16)
            ka = jnp.asarray(frng.standard_normal((fb, fs, fd)),
                             jnp.bfloat16)
            va = jnp.asarray(frng.standard_normal((fb, fs, fd)),
                             jnp.bfloat16)
            fl_fn = jax.jit(lambda q, k, v: flash_attention(q, k, v))
            dpa_fn = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(
                q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
                v.transpose(1, 0, 2)[None],
                scale=1.0 / np.sqrt(fd))[0].transpose(1, 0, 2))
            # ~120 iters integrates ~2 TFLOP per reading (RTT-robust).
            t_fl = time_fn(fl_fn, [(qa, ka, va)], iters=120)
            flash_tf = fl_flops / t_fl / 1e12
            t_dpa = time_fn(dpa_fn, [(qa, ka, va)], iters=120)
            dpa_tf = fl_flops / t_dpa / 1e12
            log(f"flash attention {fb}x{fs}^2x{fd}: {t_fl*1e3:.2f} ms -> "
                f"{flash_tf:.1f} TF (jax.nn.dpa: {dpa_tf:.1f} TF, "
                f"ratio {flash_tf/dpa_tf:.2f})")
            # Causal (the training mask), live-flop convention: parity
            # with flash_tf = perfect dead-block skipping.
            fc_fn = jax.jit(lambda q, k, v: flash_attention(
                q, k, v, causal=True))
            t_fc = time_fn(fc_fn, [(qa, ka, va)], iters=120)
            flash_causal_tf = fl_flops / 2 / t_fc / 1e12
            log(f"causal flash {fb}x{fs}^2x{fd}: {t_fc*1e3:.2f} ms -> "
                f"{flash_causal_tf:.1f} TF live "
                f"({flash_causal_tf/flash_tf:.0%} of full-mask)")
        except Exception as e:  # noqa: BLE001
            log(f"flash attention bench FAILED: {e}")

        # Quantized inference GEMMs at N=K=8192: weight-only int4 at
        # the bandwidth-bound M=32, W8A8 on the int8 engine at the
        # compute-bound M=2048 (vs this run's own bf16 rate class).
        int4_tf = w8a8_tf = None
        try:
            from gemm_hls_tpu.ops.quant import (
                matmul_quantized, matmul_w8a8, quantize_weights,
            )

            qrng = np.random.default_rng(5)
            wfull = (qrng.standard_normal((8192, 8192))
                     / 91.0).astype(np.float32)
            wq4, s4 = quantize_weights(wfull, bits=4, group_size=128)
            wq8, s8 = quantize_weights(wfull, bits=8)
            wq4j, s4j = jnp.asarray(wq4), jnp.asarray(s4)
            wq8j, s8j = jnp.asarray(wq8), jnp.asarray(s8)
            del wfull, wq4, wq8

            x32 = jnp.asarray(qrng.standard_normal((32, 8192)),
                              jnp.bfloat16)
            f4 = jax.jit(lambda a, b, c: matmul_quantized(
                a, b, c, bits=4, group_size=128))
            t4 = time_fn(f4, [(x32, wq4j, s4j)], iters=300)
            int4_tf = 2 * 32 * 8192 * 8192 / t4 / 1e12
            log(f"int4 weight-only 32x8192^2: {t4*1e6:.0f} us -> "
                f"{int4_tf:.1f} TF")

            x2k = jnp.asarray(qrng.standard_normal((2048, 8192)),
                              jnp.bfloat16)
            f88 = jax.jit(matmul_w8a8)
            t88 = time_fn(f88, [(x2k, wq8j, s8j)], iters=40)
            w8a8_tf = 2 * 2048 * 8192 * 8192 / t88 / 1e12
            log(f"w8a8 2048x8192^2: {t88*1e3:.2f} ms -> {w8a8_tf:.1f} TF")
        except Exception as e:  # noqa: BLE001
            log(f"quantized bench FAILED: {e}")
    else:
        int8_gf, t_mp, oz_gf = None, None, None
        i8x2_gf = i8x3_gf = i8x4_gf = xla_int8_gf = None
        flash_tf = dpa_tf = None
        int4_tf = w8a8_tf = None

    # Headline fp32: fastest mode passing the reference's 1e-3 contract.
    passing = {name: r for name, r in f32_rate.items()
               if r and f32_err.get(name, float("inf")) < 1e-3}
    f32_method = max(passing, key=passing.get) if passing else "highest"
    f32_gf = passing.get(f32_method) or f32_rate.get("highest")
    log(f"fp32 headline: {f32_method} at {f32_gf or 0:.0f} GFLOP/s "
        f"(rel err {f32_err.get(f32_method, float('nan')):.2e})")

    result = {
        "metric": f"bf16_gemm_{size}_gflops",
        "value": round(best_gf, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(best_gf / 462.0, 2),
        "percent_mxu_peak": round(
            percent_of_peak(best_gf, chip.peak_for("bfloat16")), 1),
        "vs_xla_dot": round(best_gf / xla_gf, 3) if xla_gf else None,
        "blocks": [best_cfg.block_m, best_cfg.block_n, best_cfg.block_k],
        "fp32_gflops": round(f32_gf, 1) if f32_gf else None,
        "fp32_method": f32_method,
        "fp32_rel_err": (round(f32_err[f32_method], 10)
                         if f32_err.get(f32_method, float("inf")) < 1 else None),
        "fp32_gflops_highest": (round(f32_rate["highest"], 1)
                                if f32_rate.get("highest") else None),
        "xla_fp32_highest": (round(xla_f32_hi_gf, 1)
                             if xla_f32_hi_gf else None),
        "fp32_gflops_fast": round(f32_fast_gf, 1) if f32_fast_gf else None,
        "fp32_gflops_i8x2": round(i8x2_gf, 1) if i8x2_gf else None,
        "fp32_gflops_i8x3": round(i8x3_gf, 1) if i8x3_gf else None,
        "fp32_gflops_i8x4": round(i8x4_gf, 1) if i8x4_gf else None,
        "int8_gops": round(int8_gf, 1) if int8_gf else None,
        "xla_int8_gops": round(xla_int8_gf, 1) if xla_int8_gf else None,
        "min_plus_4096_vpu_gops": round(
            gflops(4096, 4096, 4096, t_mp), 1) if t_mp else None,
        "f64_ozaki_2048_gflops": round(oz_gf, 1) if oz_gf else None,
        "attention_flash_tf": round(flash_tf, 1) if flash_tf else None,
        "attention_dpa_tf": round(dpa_tf, 1) if dpa_tf else None,
        "attention_vs_dpa": (round(flash_tf / dpa_tf, 2)
                             if flash_tf and dpa_tf else None),
        "attention_causal_tf": (round(flash_causal_tf, 1)
                                if flash_causal_tf else None),
        "int4_weight_only_m32_tf": round(int4_tf, 1) if int4_tf else None,
        "w8a8_2048_tf": round(w8a8_tf, 1) if w8a8_tf else None,
        "chip": chip.name,
    }
    if unreliable:
        result["unreliable_timing"] = True
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
