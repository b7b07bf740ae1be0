"""Pallas four-step NTT vs the XLA kernel oracle (bit-identical: exact
mod-p arithmetic is evaluation-order independent)."""

import numpy as np
import pytest
import jax.numpy as jnp

from intmax_zkp_core_tpu.ops import goldilocks as gl
from intmax_zkp_core_tpu.ops import ntt as nt
from intmax_zkp_core_tpu.ops.ntt_pallas import can_pallas_ntt, ntt_pallas

P = gl.P_INT


@pytest.mark.parametrize("log_n", [14, 15])
@pytest.mark.parametrize("inverse", [False, True])
def test_ntt_pallas_interpret_bit_exact(log_n, inverse):
    n = 1 << log_n
    assert can_pallas_ntt(n)
    rng = np.random.default_rng(5 + log_n)
    x = jnp.asarray(rng.integers(0, P, size=(2, n), dtype=np.uint64))
    got = np.asarray(ntt_pallas(x, inverse, True))
    want = np.asarray(nt.intt(x) if inverse else nt.ntt(x))
    assert (got == want).all()


def test_can_pallas_ntt_gate():
    assert not can_pallas_ntt(1 << 12)  # n1 below one lane tile
    assert not can_pallas_ntt(3 << 14)  # not a power of two
    assert can_pallas_ntt(1 << 20)
