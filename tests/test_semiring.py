import numpy as np
import pytest

from gemm_hls_tpu.ops.semiring import (
    Semiring, available_semirings, get_semiring, register_semiring,
)


def test_builtins_present():
    names = available_semirings()
    for expected in ("plus_times", "min_plus", "max_plus", "max_min",
                     "min_max", "max_times", "or_and"):
        assert expected in names


def test_only_plus_times_is_mxu():
    for name in available_semirings():
        assert get_semiring(name).is_mxu == (name == "plus_times")


def test_identity_for_dtypes():
    mp = get_semiring("min_plus")
    assert mp.identity_for("float32") == np.inf
    assert mp.identity_for("int32") == np.iinfo(np.int32).max
    xp = get_semiring("max_plus")
    assert xp.identity_for("int32") == np.iinfo(np.int32).min
    pt = get_semiring("plus_times")
    assert pt.identity_for("float32") == 0.0


def test_get_passthrough_and_unknown():
    sr = get_semiring("min_plus")
    assert get_semiring(sr) is sr
    with pytest.raises(KeyError, match="unknown semiring"):
        get_semiring("nope_nope")


def test_register_custom_and_duplicate():
    import jax.numpy as jnp
    custom = Semiring(name="_test_custom", map_op=jnp.add, reduce_op=jnp.add,
                      identity=0, np_map=np.add, np_reduce=np.add)
    register_semiring(custom)
    assert get_semiring("_test_custom") is custom
    with pytest.raises(ValueError, match="already registered"):
        register_semiring(custom)
    register_semiring(custom, overwrite=True)


def test_reduce_identity_semantics():
    # reduce(identity, x) == x — the hlslib operator contract
    # (include/Utility.h:29,37).
    for name in ("plus_times", "min_plus", "max_plus", "max_min", "or_and"):
        sr = get_semiring(name)
        dt = "bool" if name == "or_and" else "float32"
        ident = sr.identity_for(dt)
        x = np.asarray([1.0, 5.0, -3.0], dtype=np.float64) if name != "or_and" \
            else np.asarray([True, False, True])
        out = sr.np_reduce(np.asarray(ident), x)
        np.testing.assert_array_equal(out, x)
