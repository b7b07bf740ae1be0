"""Goldilocks field (p = 2^64 - 2^32 + 1) arithmetic on uint64 JAX arrays.

TPU-native design notes
-----------------------
The TPU has no native 64-bit integer multiplier; XLA emulates u64 ops with
32-bit lanes on the VPU.  All kernels here are written so the emulation cost
stays small and fully vectorized:

* elements are canonical ``uint64`` in ``[0, p)``;
* 64x64->128 products are built from four 32x32->64 partial products;
* the 128-bit result is reduced with the Goldilocks identity
  ``2^64 = 2^32 - 1  (mod p)`` / ``2^96 = -1 (mod p)`` — no division.

Everything is shape-polymorphic and batch-first: every function maps
elementwise over arbitrary leading dimensions, which is how the rest of the
framework gets its data parallelism (hashes, NTT butterflies, constraint
evaluation are all batched arrays of field elements).

Reference semantics: the ``GoldilocksField`` of the plonky2 dependency used
throughout the reference (e.g. imported at
``src/sparse_merkle_tree/goldilocks_poseidon/mod.rs:9``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

P = jnp.uint64(0xFFFFFFFF00000001)  # 2^64 - 2^32 + 1
P_INT = 0xFFFFFFFF00000001
EPSILON = jnp.uint64(0xFFFFFFFF)  # 2^64 mod p = 2^32 - 1
MASK32 = jnp.uint64(0xFFFFFFFF)

# Multiplicative group: order p-1 = 2^32 * 3 * 5 * 17 * 257 * 65537.
TWO_ADICITY = 32
# g = 7 generates the multiplicative group (verified in tests against the
# factorization of p-1); plonky2 uses g for LDE coset shifts.
MULTIPLICATIVE_GROUP_GENERATOR = 7


def to_u64(x) -> jax.Array:
    return jnp.asarray(x, dtype=jnp.uint64)


def canonicalize(x: jax.Array) -> jax.Array:
    """Map any u64 into canonical [0, p)."""
    x = to_u64(x)
    return jnp.where(x >= P, x - P, x)


def add(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a + b) mod p for canonical inputs."""
    s = a + b
    # wrapped iff s < a; 2^64 = EPSILON (mod p)
    s = jnp.where(s < a, s + EPSILON, s)
    return jnp.where(s >= P, s - P, s)


def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a - b) mod p for canonical inputs."""
    d = a - b
    # borrow iff a < b; -2^64 = -EPSILON (mod p)
    return jnp.where(a < b, d - EPSILON, d)


def neg(a: jax.Array) -> jax.Array:
    return jnp.where(a == 0, a, P - a)


def _mul_128(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full 64x64 -> 128-bit product as (hi, lo) u64 pair."""
    a_lo = a & MASK32
    a_hi = a >> jnp.uint64(32)
    b_lo = b & MASK32
    b_hi = b >> jnp.uint64(32)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # mid = lh + hl, tracking the single possible carry into bit 64
    mid = lh + hl
    mid_carry = (mid < lh).astype(jnp.uint64)
    lo = ll + (mid << jnp.uint64(32))
    lo_carry = (lo < ll).astype(jnp.uint64)
    hi = hh + (mid >> jnp.uint64(32)) + (mid_carry << jnp.uint64(32)) + lo_carry
    return hi, lo


def reduce128(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Reduce a 128-bit value (hi*2^64 + lo) mod p.

    Uses 2^64 = 2^32 - 1 and 2^96 = -1 (mod p):
      x = lo + hi_lo*(2^32 - 1) - hi_hi   (mod p)
    """
    hi_hi = hi >> jnp.uint64(32)
    hi_lo = hi & MASK32
    # t0 = lo - hi_hi (mod p); borrow compensation: -2^64 = -EPSILON
    t0 = lo - hi_hi
    t0 = jnp.where(lo < hi_hi, t0 - EPSILON, t0)
    t1 = hi_lo * EPSILON  # < 2^64, no overflow
    t2 = t0 + t1
    t2 = jnp.where(t2 < t0, t2 + EPSILON, t2)
    return jnp.where(t2 >= P, t2 - P, t2)


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a * b) mod p for canonical inputs."""
    hi, lo = _mul_128(a, b)
    return reduce128(hi, lo)


def square(a: jax.Array) -> jax.Array:
    return mul(a, a)


def pow_const(a: jax.Array, e: int) -> jax.Array:
    """a^e for a Python-int exponent (unrolled square-and-multiply)."""
    if e == 0:
        return jnp.full_like(to_u64(a), 1)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def inv(a: jax.Array) -> jax.Array:
    """a^-1 = a^(p-2); a=0 maps to 0 (callers guard)."""
    return pow_const(a, P_INT - 2)


def mul_small(a: jax.Array, c: int) -> jax.Array:
    """a * c for a small (< 2^20) Python-int constant, cheaper than mul()."""
    lo_part = (a & MASK32) * jnp.uint64(c)  # < 2^52
    hi_part = (a >> jnp.uint64(32)) * jnp.uint64(c)  # < 2^52
    # value = lo_part + hi_part * 2^32  (< 2^85) -> (hi, lo) pair
    s = lo_part + (hi_part << jnp.uint64(32))
    carry = (s < lo_part).astype(jnp.uint64)
    hi = (hi_part >> jnp.uint64(32)) + carry
    return reduce128(hi, s)


# ---------------------------------------------------------------------------
# Python-int scalar helpers (host-side witness generation / tests)
# ---------------------------------------------------------------------------


def add_s(a: int, b: int) -> int:
    return (a + b) % P_INT


def sub_s(a: int, b: int) -> int:
    return (a - b) % P_INT


def mul_s(a: int, b: int) -> int:
    return (a * b) % P_INT


def inv_s(a: int) -> int:
    return pow(a, P_INT - 2, P_INT)


def exp_power_of_2_s(a: int, k: int) -> int:
    for _ in range(k):
        a = (a * a) % P_INT
    return a


def primitive_root_of_unity(n_log: int) -> int:
    """2^n_log-th primitive root of unity, derived g^((p-1) / 2^n_log)."""
    assert 0 <= n_log <= TWO_ADICITY
    base = pow(MULTIPLICATIVE_GROUP_GENERATOR, (P_INT - 1) >> TWO_ADICITY, P_INT)
    return exp_power_of_2_s(base, TWO_ADICITY - n_log)


# ---------------------------------------------------------------------------
# Quadratic extension F_{p^2} = F_p[x] / (x^2 - W),  W = 7
# (plonky2's Extendable<2> for GoldilocksField; used for FRI/quotient
# challenges).  Elements are (..., 2) arrays: c0 + c1*x.
# ---------------------------------------------------------------------------

W_EXT = 7


def ext_add(a: jax.Array, b: jax.Array) -> jax.Array:
    return add(a, b)


def ext_sub(a: jax.Array, b: jax.Array) -> jax.Array:
    return sub(a, b)


def ext_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a0 + a1 x)(b0 + b1 x) = a0 b0 + W a1 b1 + (a0 b1 + a1 b0) x."""
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    c0 = add(mul(a0, b0), mul_small(mul(a1, b1), W_EXT))
    c1 = add(mul(a0, b1), mul(a1, b0))
    return jnp.stack([c0, c1], axis=-1)


def ext_square(a: jax.Array) -> jax.Array:
    return ext_mul(a, a)


def ext_neg(a: jax.Array) -> jax.Array:
    return neg(a)


def ext_scalar_mul(a: jax.Array, s: jax.Array) -> jax.Array:
    return mul(a, s[..., None])


def ext_from_base(a: jax.Array) -> jax.Array:
    return jnp.stack([a, jnp.zeros_like(a)], axis=-1)


def ext_pow_const(a: jax.Array, e: int) -> jax.Array:
    if e == 0:
        out = jnp.zeros_like(a)
        return out.at[..., 0].set(1)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else ext_mul(result, base)
        e >>= 1
        if e:
            base = ext_square(base)
    return result


def ext_inv(a: jax.Array) -> jax.Array:
    """(a0 + a1 x)^-1 = (a0 - a1 x) / (a0^2 - W a1^2)."""
    a0, a1 = a[..., 0], a[..., 1]
    norm = sub(square(a0), mul_small(square(a1), W_EXT))
    n_inv = inv(norm)
    return jnp.stack([mul(a0, n_inv), neg(mul(a1, n_inv))], axis=-1)
