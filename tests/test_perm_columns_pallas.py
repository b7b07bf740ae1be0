"""Bit-exactness of the Pallas permutation-columns kernel vs an exact
host-integer oracle of the Plonk permutation argument (the same math as
``engine/prover.perm_columns_impl``)."""

import numpy as np
import pytest
import jax.numpy as jnp

from intmax_zkp_core_tpu.ops import goldilocks as gl
from intmax_zkp_core_tpu.ops.perm_columns_pallas import (
    CHUNK,
    perm_columns_jnp_limb,
)

P = gl.P_INT


def _oracle(wires, betas, gammas, id_vals, sigma):
    """Exact Python-int computation of (z, pp, wrap)."""
    R, n = wires.shape
    nch = (R + CHUNK - 1) // CHUNK
    C = len(betas)
    zs = np.zeros((C, n), dtype=np.uint64)
    pps = np.zeros((C, max(nch - 1, 0), n), dtype=np.uint64)
    wraps = np.zeros(C, dtype=np.uint64)
    for c in range(C):
        beta, gamma = int(betas[c]), int(gammas[c])
        z = 1
        for k in range(n):
            zs[c, k] = z
            # partial products after each chunk of this row
            acc = z
            for j in range(nch):
                f = g = 1
                for i in range(j * CHUNK, min((j + 1) * CHUNK, R)):
                    w = int(wires[i, k])
                    f = f * ((w + beta * int(id_vals[i, k]) + gamma) % P) % P
                    g = g * ((w + beta * int(sigma[i, k]) + gamma) % P) % P
                acc = acc * f % P * pow(g, P - 2, P) % P
                if j < nch - 1:
                    pps[c, j, k] = acc
            z = acc
        wraps[c] = z
    return zs, pps, wraps


@pytest.mark.parametrize("R", [7, 16, 23])
def test_perm_columns_pallas_bit_exact(R):
    rng = np.random.default_rng(41 + R)
    n, C = 64, 2
    wires = rng.integers(0, P, size=(R, n), dtype=np.uint64)
    id_vals = rng.integers(0, P, size=(R, n), dtype=np.uint64)
    sigma = rng.integers(0, P, size=(R, n), dtype=np.uint64)
    betas = rng.integers(1, P, size=(C,), dtype=np.uint64)
    gammas = rng.integers(1, P, size=(C,), dtype=np.uint64)

    # the EAGER limb-plane path shares _tile_compute with the Mosaic
    # kernel body (XLA:CPU cannot compile the deep Fermat chain; the
    # compiled kernel is validated on the chip — docs/perf_notes.md)
    z, pp, wrap = perm_columns_jnp_limb(
        jnp.asarray(wires), jnp.asarray(betas), jnp.asarray(gammas),
        jnp.asarray(id_vals), jnp.asarray(sigma),
    )
    ze, ppe, wrape = _oracle(wires, betas, gammas, id_vals, sigma)
    assert (np.asarray(z) == ze).all()
    assert np.asarray(pp).shape == ppe.shape
    assert (np.asarray(pp) == ppe).all()
    assert (np.asarray(wrap) == wrape).all()
