import pytest

from gemm_hls_tpu.models.perf_model import get_chip
from gemm_hls_tpu.models.scaling_model import (
    comm_volume_per_device, multichip_model, weak_scaling_efficiency,
)

V5P = get_chip("v5p")


def test_comm_volume_summa_vs_cannon_same_order():
    # Both are 2-D CA algorithms; volumes are the same order.
    m = n = k = 8192
    s = comm_volume_per_device("summa", m, n, k, (4, 4))
    c = comm_volume_per_device("cannon", m, n, k, (4, 4))
    assert 0.3 < s / c < 3.0


def test_25d_reduces_communication():
    # 2.5D with c=4 on 64 devices moves less data than 2-D SUMMA on 64.
    m = n = k = 16384
    v2d = comm_volume_per_device("summa", m, n, k, (8, 8))
    v25 = comm_volume_per_device("25d", m, n, k, (4, 4, 4))
    assert v25 < v2d


def test_cannon_requires_square():
    with pytest.raises(ValueError, match="square"):
        comm_volume_per_device("cannon", 64, 64, 64, (2, 4))


def test_multichip_model_fields():
    r = multichip_model("25d", 16384, 16384, 16384, (2, 2, 2),
                        dtype="bfloat16", chip=V5P)
    assert r["devices"] == 8
    assert r["t_step_s"] >= r["t_compute_s"]
    assert 0 < r["parallel_efficiency"] <= 1


def test_weak_scaling_target_16_chips():
    # BASELINE.md north star: >=80% weak scaling for 2.5D on 16 v5p chips —
    # the analytical model must predict that's achievable at 8192^3/chip.
    eff = weak_scaling_efficiency("25d", (8192, 8192, 8192), (4, 2, 2),
                                  dtype="bfloat16", chip=V5P)
    assert eff >= 0.8


def test_more_devices_more_comm_less_eff():
    m = n = k = 8192
    e4 = multichip_model("summa", m, n, k, (2, 2), chip=V5P)
    e64 = multichip_model("summa", m, n, k, (8, 8), chip=V5P)
    assert e64["parallel_efficiency"] <= e4["parallel_efficiency"]
