"""Configurable semirings: built-ins and user registration.

    python examples/02_semirings.py
"""

import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu import Semiring, available_semirings, matmul, register_semiring
from gemm_hls_tpu.utils import make_operands, reference_matmul, verify_matmul

print("built-in semirings:", ", ".join(available_semirings()))

a, b = make_operands(64, 96, 80, "float32")

# Distance product (min, +): one APSP relaxation step.
d = matmul(jnp.asarray(a), jnp.asarray(b), semiring="min_plus")
verify_matmul(np.asarray(d), reference_matmul(a, b, semiring="min_plus"))
print("min_plus (distance product): verified")

# Bottleneck paths (max, min).
w = matmul(jnp.asarray(a), jnp.asarray(b), semiring="max_min")
verify_matmul(np.asarray(w), reference_matmul(a, b, semiring="max_min"))
print("max_min (widest path): verified")

# Boolean reachability (or, and) on a bool adjacency matrix.
ab, bb = make_operands(32, 32, 32, "bool")
r = matmul(jnp.asarray(ab), jnp.asarray(bb), semiring="or_and")
np.testing.assert_array_equal(
    np.asarray(r), reference_matmul(ab, bb, semiring="or_and"))
print("or_and (reachability): verified")

# User-defined semiring: plus_max ("longest concatenation").
plus_max = register_semiring(Semiring(
    name="plus_max", map_op=jnp.maximum, reduce_op=jnp.add, identity=0,
    np_map=np.maximum, np_reduce=np.add, reduce_axis=jnp.sum,
), overwrite=True)
out = matmul(jnp.asarray(a), jnp.asarray(b), semiring=plus_max)
verify_matmul(np.asarray(out), reference_matmul(a, b, semiring="plus_max"))
print("custom plus_max: registered and verified")
