"""Bit-exactness of the Pallas FRI-initial-evaluation kernel math vs an
exact host-integer oracle (same formula as
``engine/batch_prover._fri_initial_one``)."""

import numpy as np
import jax.numpy as jnp

from intmax_zkp_core_tpu.ops import goldilocks as gl
from intmax_zkp_core_tpu.ops.fri_init_pallas import fri_initial_jnp_limb

P = gl.P_INT
W = 7


def _ext_mul(a, b):
    return (
        (a[0] * b[0] + W * a[1] * b[1]) % P,
        (a[0] * b[1] + a[1] * b[0]) % P,
    )


def _ext_inv(a):
    norm = (a[0] * a[0] - W * a[1] * a[1]) % P
    ninv = pow(norm, P - 2, P)
    return (a[0] * ninv % P, (P - a[1] * ninv % P) % P)


def test_fri_init_bit_exact():
    rng = np.random.default_rng(29)
    L = 64
    comb1 = rng.integers(0, P, size=(L, 2), dtype=np.uint64)
    comb2 = rng.integers(0, P, size=(L, 2), dtype=np.uint64)
    xs = rng.integers(1, P, size=(L,), dtype=np.uint64)
    zeta = rng.integers(1, P, size=(2,), dtype=np.uint64)
    gzeta = rng.integers(1, P, size=(2,), dtype=np.uint64)
    c1z = rng.integers(0, P, size=(2,), dtype=np.uint64)
    c2gz = rng.integers(0, P, size=(2,), dtype=np.uint64)

    got = np.asarray(
        fri_initial_jnp_limb(
            jnp.asarray(comb1), jnp.asarray(comb2), jnp.asarray(xs),
            jnp.asarray(zeta), jnp.asarray(gzeta), jnp.asarray(c1z),
            jnp.asarray(c2gz),
        )
    )
    for i in range(L):
        x = (int(xs[i]), 0)
        t1 = _ext_mul(
            ((int(comb1[i, 0]) - int(c1z[0])) % P,
             (int(comb1[i, 1]) - int(c1z[1])) % P),
            _ext_inv(((x[0] - int(zeta[0])) % P, (-int(zeta[1])) % P)),
        )
        t2 = _ext_mul(
            ((int(comb2[i, 0]) - int(c2gz[0])) % P,
             (int(comb2[i, 1]) - int(c2gz[1])) % P),
            _ext_inv(((x[0] - int(gzeta[0])) % P, (-int(gzeta[1])) % P)),
        )
        want = ((t1[0] + t2[0]) % P, (t1[1] + t2[1]) % P)
        assert (int(got[i, 0]), int(got[i, 1])) == want, i
