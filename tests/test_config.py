import pytest

from gemm_hls_tpu.config import GemmConfig, default_config, cdiv, round_up, sublane


def test_defaults_validate():
    for dt in ("float32", "bfloat16", "int8", "float64"):
        default_config(dt).validate()


def test_alignment_validation():
    with pytest.raises(ValueError, match="block_n"):
        GemmConfig(block_n=100).validate()
    with pytest.raises(ValueError, match="block_m"):
        GemmConfig(dtype="bfloat16", block_m=8).validate()  # bf16 sublane 16
    # Interpreter-mode configs accept arbitrary blocks (software simulation).
    GemmConfig(block_m=5, block_n=7, block_k=3, interpret=True).validate()


def test_vmem_budget_validation():
    with pytest.raises(ValueError, match="VMEM"):
        GemmConfig(block_m=4096, block_n=4096, block_k=4096).validate()


def test_bad_fields():
    with pytest.raises(ValueError, match="pad_policy"):
        GemmConfig(pad_policy="wrap").validate()
    with pytest.raises(ValueError, match="precision"):
        GemmConfig(precision="medium").validate()
    with pytest.raises(ValueError, match="positive"):
        GemmConfig(block_m=0).validate()


def test_grid_and_padding():
    cfg = GemmConfig(block_m=128, block_n=256, block_k=512)
    assert cfg.grid(1000, 1000, 1000) == (8, 4, 2)
    assert cfg.padded_shape(1000, 1000, 1000) == (1024, 1024, 1024)
    assert cfg.grid(128, 256, 512) == (1, 1, 1)


def test_io_volume_matches_reference_formula():
    # Reference: Q = N*M*(1 + K/T_N + K/T_M) words for divisible sizes
    # (src/PrintSpecifications.cpp:72-75).
    cfg = GemmConfig(block_m=256, block_n=512, block_k=256)
    m = n = k = 2048
    expected = m * n * (1 + k / cfg.block_n + k / cfg.block_m)
    assert cfg.io_volume_words(m, n, k) == int(expected)


def test_vmem_bytes_accounting():
    cfg = GemmConfig(dtype="bfloat16", block_m=512, block_n=512, block_k=512)
    a = b = 512 * 512 * 2
    acc = 512 * 512 * 4
    out = 512 * 512 * 2
    assert cfg.vmem_bytes() == 2 * (a + b) + acc + 2 * out


def test_acc_dtype_rules():
    assert str(GemmConfig(dtype="bfloat16").jacc_dtype) == "float32"
    assert str(GemmConfig(dtype="float64").jacc_dtype) == "float64"
    assert str(GemmConfig(dtype="int8").jacc_dtype) == "int32"


def test_helpers():
    assert cdiv(10, 3) == 4
    assert round_up(10, 8) == 16
    assert sublane("float32") == 8
    assert sublane("bfloat16") == 16
    assert sublane("int8") == 32


def test_hashable_for_jit_cache():
    assert hash(GemmConfig()) == hash(GemmConfig())
    assert GemmConfig() != GemmConfig(block_m=256)


def test_vpu_defaults_respect_sublane_tiling():
    """Self-review r2: the VPU default block_m must satisfy each dtype's
    sublane constraint under strict (compiled-mode) validation."""
    from gemm_hls_tpu.config import default_config

    for dtype in ("float32", "bfloat16", "int8", "int32"):
        cfg = default_config(dtype, semiring="min_plus")
        cfg.validate(strict_alignment=True)
