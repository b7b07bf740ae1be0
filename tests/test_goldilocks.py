"""Goldilocks field kernel tests: algebraic identities vs Python-int oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from intmax_zkp_core_tpu.ops import goldilocks as gl

P = gl.P_INT
RNG = np.random.default_rng(0)


def rand_elems(n):
    return RNG.integers(0, P, size=n, dtype=np.uint64)


def as_int(x):
    return np.asarray(x).astype(object).tolist()


def test_add_sub_vs_oracle():
    a = rand_elems(1024)
    b = rand_elems(1024)
    got = np.asarray(gl.add(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) + b.astype(object)) % P
    assert (got.astype(object) == want).all()

    got = np.asarray(gl.sub(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) - b.astype(object)) % P
    assert (got.astype(object) == want).all()


def test_mul_vs_oracle():
    a = rand_elems(1024)
    b = rand_elems(1024)
    got = np.asarray(gl.mul(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) * b.astype(object)) % P
    assert (got.astype(object) == want).all()


def test_mul_edge_cases():
    edges = np.array(
        [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P >> 1, (1 << 63)],
        dtype=np.uint64,
    )
    a, b = np.meshgrid(edges, edges)
    a, b = a.ravel(), b.ravel()
    got = np.asarray(gl.mul(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) * b.astype(object)) % P
    assert (got.astype(object) == want).all()


def test_inv():
    a = rand_elems(128)
    a[a == 0] = 1
    ai = gl.inv(jnp.asarray(a))
    got = np.asarray(gl.mul(jnp.asarray(a), ai))
    assert (got == 1).all()


def test_mul_small():
    a = rand_elems(512)
    for c in [0, 1, 7, 41, 49, 1 << 16]:
        got = np.asarray(gl.mul_small(jnp.asarray(a), c))
        want = (a.astype(object) * c) % P
        assert (got.astype(object) == want).all(), c


def test_generator_is_generator():
    # p - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537
    factors = [2, 3, 5, 17, 257, 65537]
    assert 2**32 * 3 * 5 * 17 * 257 * 65537 == P - 1
    g = gl.MULTIPLICATIVE_GROUP_GENERATOR
    for q in factors:
        assert pow(g, (P - 1) // q, P) != 1


def test_roots_of_unity():
    for k in [1, 2, 8, 16, 32]:
        w = gl.primitive_root_of_unity(k)
        assert pow(w, 1 << k, P) == 1
        if k > 0:
            assert pow(w, 1 << (k - 1), P) == P - 1  # primitive


def test_ext_mul_inv():
    a = rand_elems(64 * 2).reshape(64, 2)
    b = rand_elems(64 * 2).reshape(64, 2)
    a[0] = [3, 0]  # base-field embedding sanity
    b[0] = [5, 0]
    c = np.asarray(gl.ext_mul(jnp.asarray(a), jnp.asarray(b)))
    assert c[0, 0] == 15 and c[0, 1] == 0
    # (a*b) * b^-1 == a  (avoid zero rows)
    mask = ~((b == 0).all(axis=1))
    binv = gl.ext_inv(jnp.asarray(b))
    back = np.asarray(gl.ext_mul(jnp.asarray(c), binv))
    assert (back[mask] == a[mask]).all()


def test_ext_w_is_nonresidue():
    # x^2 - 7 irreducible <=> 7 is a quadratic nonresidue mod p
    assert pow(7, (P - 1) // 2, P) == P - 1
