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


def test_tile_lanes_bounds():
    """v2 adaptive lane tiles: within [TL, 1024], divides M, shrinks as S
    grows (VMEM budget ~(S*tl) per plane)."""
    from intmax_zkp_core_tpu.ops.ntt_pallas import TL, _tile_lanes

    for log_n in range(14, 22):
        log_n1 = log_n // 2
        S1, M1 = 1 << log_n1, 1 << (log_n - log_n1)
        for S, M in ((S1, M1), (M1, S1)):  # both stages
            tl = _tile_lanes(S, M)
            assert TL <= tl <= 1024
            assert M % tl == 0
            assert S * tl <= max(1 << 20, S * TL)
    assert _tile_lanes(1024, 1024) == 1024
    assert _tile_lanes(2048, 512) == 512
    assert _tile_lanes(128, 128) == 128


def test_inverse_fourstep_folds_scale():
    """The inverse four-step table carries the 1/n output scale (no
    separate scale multiply anywhere in the v2 transform)."""
    from intmax_zkp_core_tpu.ops.ntt_pallas import _fourstep_tw_np

    log_n1, log_n2 = 3, 4
    n = 1 << (log_n1 + log_n2)
    fwd = _fourstep_tw_np(log_n1, log_n2, False)
    inv = _fourstep_tw_np(log_n1, log_n2, True)
    n_inv = pow(n, P - 2, P)
    # inv[k1, i2] = n^-1 * fwd[k1, i2]^-1
    for k1 in (0, 1, 5):
        for i2 in (0, 3, 7):
            want = n_inv * pow(int(fwd[k1, i2]), P - 2, P) % P
            assert int(inv[k1, i2]) == want
