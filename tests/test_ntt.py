"""NTT/LDE tests: inverse round-trip, naive-evaluation oracle, coset LDE
consistency, convolution."""

import numpy as np

import jax.numpy as jnp

from intmax_zkp_core_tpu.ops import goldilocks as gl
from intmax_zkp_core_tpu.ops import ntt as nt

P = gl.P_INT
RNG = np.random.default_rng(3)


def rand_poly(batch, n):
    return RNG.integers(0, P, size=(batch, n), dtype=np.uint64)


def naive_eval_all(coeffs, log_n):
    n = 1 << log_n
    w = gl.primitive_root_of_unity(log_n)
    out = []
    for i in range(n):
        x = pow(w, i, P)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + int(c)) % P
        out.append(acc)
    return out


def test_ntt_matches_naive():
    for log_n in [0, 1, 2, 4, 6]:
        n = 1 << log_n
        a = rand_poly(2, n)
        got = np.asarray(nt.ntt(jnp.asarray(a)))
        for b in range(2):
            want = naive_eval_all(a[b], log_n)
            assert [int(v) for v in got[b]] == want, log_n


def test_intt_roundtrip():
    for log_n in [1, 3, 8, 10]:
        n = 1 << log_n
        a = rand_poly(3, n)
        back = np.asarray(nt.intt(nt.ntt(jnp.asarray(a))))
        assert (back == a).all(), log_n


def test_convolution_property():
    # NTT(a) * NTT(b) == NTT(a * b mod (x^n - 1))
    n = 16
    a = rand_poly(1, n)[0]
    b = rand_poly(1, n)[0]
    conv = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            conv[(i + j) % n] = (conv[(i + j) % n] + int(a[i]) * int(b[j])) % P
    lhs = gl.mul(nt.ntt(jnp.asarray(a)), nt.ntt(jnp.asarray(b)))
    rhs = nt.ntt(jnp.asarray(conv.astype(np.uint64)))
    assert (np.asarray(lhs) == np.asarray(rhs)).all()


def test_coset_lde_roundtrip_and_degree():
    n, rate_bits = 32, 3
    a = rand_poly(2, n)
    evals = nt.coset_lde(jnp.asarray(a), rate_bits)
    assert evals.shape[-1] == n << rate_bits
    back = np.asarray(nt.coset_ilde(evals, rate_bits))
    assert (back == a).all()
    # high-order coefficients of the LDE interpolation must vanish
    full = np.asarray(nt.intt(evals))
    shift_inv = pow(gl.MULTIPLICATIVE_GROUP_GENERATOR, P - 2, P)
    # unshift then check degree < n
    acc = 1
    unshifted = []
    for i in range(n << rate_bits):
        unshifted.append(int(full[0, i]) * acc % P)
        acc = acc * shift_inv % P
    assert all(v == 0 for v in unshifted[n:])


def test_coset_lde_matches_pointwise_eval():
    n, rate_bits = 8, 2
    a = rand_poly(1, n)[0]
    evals = np.asarray(nt.coset_lde(jnp.asarray(a), rate_bits))[...]
    lde_n = n << rate_bits
    w = gl.primitive_root_of_unity(lde_n.bit_length() - 1)
    g = gl.MULTIPLICATIVE_GROUP_GENERATOR
    for i in [0, 1, 5, lde_n - 1]:
        x = g * pow(w, i, P) % P
        want = 0
        for c in reversed(a):
            want = (want * x + int(c)) % P
        assert int(evals[i]) == want


def test_eval_poly_at():
    n = 10
    a = rand_poly(1, n)[0]
    x = np.uint64(12345678901234567)
    got = int(np.asarray(nt.eval_poly_at(jnp.asarray(a), jnp.asarray(x))))
    want = 0
    for c in reversed(a):
        want = (want * int(x) + int(c)) % P
    assert got == want


def test_eval_poly_at_ext():
    n = 6
    a = rand_poly(1, n)[0]
    x = jnp.asarray(np.array([123456789, 987654321], dtype=np.uint64))
    got = np.asarray(nt.eval_poly_at_ext(jnp.asarray(a), x))
    # oracle in python ints over F_p[x]/(x^2-7)
    def ext_mul(u, v):
        return ((u[0] * v[0] + 7 * u[1] * v[1]) % P, (u[0] * v[1] + u[1] * v[0]) % P)
    acc = (int(a[-1]), 0)
    for c in reversed(a[:-1]):
        acc = ext_mul(acc, (123456789, 987654321))
        acc = ((acc[0] + int(c)) % P, acc[1])
    assert (int(got[0]), int(got[1])) == acc
