"""Bit-exactness of the Pallas permutation-quotient kernel math vs an
exact host-integer oracle (same formula as
``engine/prover.perm_quotient_part``)."""

import numpy as np
import pytest
import jax.numpy as jnp

from intmax_zkp_core_tpu.ops import goldilocks as gl
from intmax_zkp_core_tpu.ops.perm_quotient_pallas import (
    CHUNK,
    perm_quotient_jnp_limb,
)

P = gl.P_INT


def _oracle(wires_lde, zs, pps, betas, gammas, alphas, sigma, xs, l0, k_is,
            blowup):
    R, L = sigma.shape
    nch = (R + CHUNK - 1) // CHUNK
    C = len(betas)
    acc_out = np.zeros((C, L), dtype=np.uint64)
    apows = np.zeros(C, dtype=np.uint64)
    for c in range(C):
        beta, gamma, alpha = int(betas[c]), int(gammas[c]), int(alphas[c])
        for x in range(L):
            terms = [int(l0[x]) * ((int(zs[c, x]) - 1) % P) % P]
            prev = int(zs[c, x])
            for j in range(nch):
                f = g = 1
                for i in range(j * CHUNK, min((j + 1) * CHUNK, R)):
                    w = int(wires_lde[i, x])
                    f = f * ((w + beta * int(k_is[i]) % P * int(xs[x]) + gamma) % P) % P
                    g = g * ((w + beta * int(sigma[i, x]) + gamma) % P) % P
                nxt = (
                    int(zs[c, (x + blowup) % L])
                    if j == nch - 1
                    else int(pps[c, j, x])
                )
                terms.append((nxt * g - prev * f) % P)
                if j < nch - 1:
                    prev = int(pps[c, j, x])
            acc = 0
            apow = 1
            for t in terms:
                acc = (acc + apow * t) % P
                apow = apow * alpha % P
            acc_out[c, x] = acc
        apows[c] = pow(alpha, nch + 1, P)
    return acc_out, apows


@pytest.mark.parametrize("R", [7, 16])
def test_perm_quotient_pallas_bit_exact(R):
    rng = np.random.default_rng(17 + R)
    L, C = 64, 2
    nch = (R + CHUNK - 1) // CHUNK
    blowup = 8
    wires = rng.integers(0, P, size=(R + 3, L), dtype=np.uint64)  # extra rows ignored
    sigma = rng.integers(0, P, size=(R, L), dtype=np.uint64)
    xs = rng.integers(0, P, size=(L,), dtype=np.uint64)
    l0 = rng.integers(0, P, size=(L,), dtype=np.uint64)
    zs = rng.integers(0, P, size=(C, L), dtype=np.uint64)
    pps = rng.integers(0, P, size=(C, max(nch - 1, 0), L), dtype=np.uint64)
    betas = rng.integers(1, P, size=(C,), dtype=np.uint64)
    gammas = rng.integers(1, P, size=(C,), dtype=np.uint64)
    alphas = rng.integers(1, P, size=(C,), dtype=np.uint64)
    k_is = rng.integers(1, P, size=(R,), dtype=np.uint64)

    acc, apows = perm_quotient_jnp_limb(
        jnp.asarray(wires), jnp.asarray(zs), jnp.asarray(pps),
        jnp.asarray(betas), jnp.asarray(gammas), jnp.asarray(alphas),
        jnp.asarray(sigma), jnp.asarray(xs), jnp.asarray(l0),
        k_is, blowup,
    )
    acc_e, apows_e = _oracle(
        wires, zs, pps, betas, gammas, alphas, sigma, xs, l0, k_is, blowup
    )
    assert (np.asarray(acc) == acc_e).all()
    assert (np.asarray(apows) == apows_e).all()
