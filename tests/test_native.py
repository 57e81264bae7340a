"""Native C++ oracle vs the numpy oracle."""

import numpy as np
import pytest

from gemm_hls_tpu.utils import make_operands, reference_matmul
from gemm_hls_tpu.utils.native import (
    native_available, native_reference_matmul,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("semiring", ["plus_times", "min_plus", "max_plus",
                                      "max_min", "max_times"])
def test_native_matches_numpy_f64(semiring):
    a, b = make_operands(37, 53, 41, "float32")
    exp = reference_matmul(a, b, semiring=semiring)
    got = native_reference_matmul(a, b, semiring)
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_native_transposes():
    a, b = make_operands(20, 30, 25, "float32", transpose_a=True,
                         transpose_b=True)
    exp = reference_matmul(a, b, semiring="min_plus", transpose_a=True,
                           transpose_b=True)
    got = native_reference_matmul(a, b, "min_plus", transpose_a=True,
                                  transpose_b=True)
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_native_int():
    a, b = make_operands(16, 24, 32, "int32")
    exp = reference_matmul(a, b, semiring="min_plus")
    got = native_reference_matmul(a, b, "min_plus")
    np.testing.assert_array_equal(got, exp)


def test_native_bool_or_and():
    a, b = make_operands(10, 12, 14, "bool")
    exp = reference_matmul(a, b, semiring="or_and")
    got = native_reference_matmul(a, b, "or_and")
    np.testing.assert_array_equal(got, exp)


def test_native_threads_match_single():
    a, b = make_operands(64, 64, 64, "float32")
    single = native_reference_matmul(a, b, "plus_times", n_threads=1)
    multi = native_reference_matmul(a, b, "plus_times", n_threads=4)
    np.testing.assert_array_equal(single, multi)


def test_native_mismatch_raises():
    a, b = make_operands(8, 8, 8, "float32")
    with pytest.raises(ValueError, match="contraction mismatch"):
        native_reference_matmul(a[:, :5], b, "plus_times")
