"""Pallas Poseidon kernel: interpreter-mode correctness vs the scalar
oracle (the compiled TPU path is cross-checked in the device drives)."""

import numpy as np

import jax.numpy as jnp

from intmax_zkp_core_tpu.ops.poseidon import permute_s
from intmax_zkp_core_tpu.ops.poseidon_pallas import permute_pallas

P = 0xFFFFFFFF00000001


def test_pallas_kernel_interpret_matches_scalar():
    rng = np.random.default_rng(11)
    x = rng.integers(0, P, size=(256, 12), dtype=np.uint64)
    # include edge values that stress the limb arithmetic
    x[0] = 0
    x[1] = P - 1
    x[2, :6] = 0xFFFFFFFF
    out = np.asarray(permute_pallas(jnp.asarray(x), True))
    for i in [0, 1, 2, 3, 255]:
        assert [int(v) for v in out[i]] == permute_s([int(v) for v in x[i]]), i
