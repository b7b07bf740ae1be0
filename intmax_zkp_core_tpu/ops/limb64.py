"""Goldilocks arithmetic on explicit (lo, hi) uint32 limb planes — the
shared primitive layer for Pallas TPU kernels.

Mosaic has no native u64 vectors, so kernels carry every field element as
two uint32 planes and hand-schedule the 16-bit partial products.  These
helpers are pure jnp-on-uint32 functions, usable both inside Pallas
kernel bodies and (for testing) in plain traced code.  They are the
arithmetic originally written for the Poseidon kernel
(``ops/poseidon_pallas.py``) and now also under the Poseidon-gate
quotient kernel; the batched-u64 path in ``ops/goldilocks.py`` remains
the reference semantics (bit-exactness asserted in
tests/test_poseidon_pallas.py and tests/test_gate_quotient_pallas.py).

All values are canonical (< p) at function boundaries unless noted.
p = 2^64 - 2^32 + 1;  2^64 === 2^32 - 1 (mod p);  2^96 === -1 (mod p).
"""

from __future__ import annotations

import jax.numpy as jnp

u32 = jnp.uint32

# Bumped whenever any helper in this module changes its traced graph
# (even value-identically).  The AOT executable cache (engine/aot_cache)
# keys on (name, extra, shapes) — NOT the jaxpr — so every AotJit whose
# graph embeds these primitives must include this version in its
# ``extra`` string, or a warm process silently keeps executing the stale
# on-disk executable (ADVICE round 3).  v2 = loose sbox7 chain with a
# single trailing canon64.
LIMB_GRAPH_VERSION = 2


def add64(alo, ahi, blo, bhi):
    """Plain 64-bit add with carry (no reduction)."""
    lo = alo + blo
    carry = (lo < alo).astype(u32)
    hi = ahi + bhi + carry
    return lo, hi


def sub64(alo, ahi, blo, bhi):
    """Plain 64-bit subtract with borrow (no reduction)."""
    lo = alo - blo
    borrow = (alo < blo).astype(u32)
    hi = ahi - bhi - borrow
    return lo, hi


def mul32x32(a, b):
    """32x32 -> (lo32, hi32) via 16-bit partials."""
    a0 = a & u32(0xFFFF)
    a1 = a >> u32(16)
    b0 = b & u32(0xFFFF)
    b1 = b >> u32(16)
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # mid = lh + hl (may carry into bit 32)
    mid = lh + hl
    midc = (mid < lh).astype(u32)
    lo = ll + (mid << u32(16))
    loc = (lo < ll).astype(u32)
    hi = hh + (mid >> u32(16)) + (midc << u32(16)) + loc
    return lo, hi


def add_canon(alo, ahi, blo, bhi):
    """(a + b) mod p for canonical a, b."""
    lo, hi = add64(alo, ahi, blo, bhi)
    overflow = (hi < ahi) | ((hi == ahi) & (lo < alo))
    # + EPSILON (2^32 - 1) where wrapped
    eps = jnp.where(overflow, u32(0xFFFFFFFF), u32(0))
    lo2 = lo + eps
    hi2 = hi + (lo2 < lo).astype(u32)
    # conditional subtract p   (p = [1, 0xFFFFFFFF])
    ge_p = (hi2 == u32(0xFFFFFFFF)) & (lo2 >= u32(1))
    lo3 = jnp.where(ge_p, lo2 - u32(1), lo2)
    hi3 = jnp.where(ge_p, hi2 - u32(0xFFFFFFFF), hi2)
    return lo3, hi3


def sub_canon(alo, ahi, blo, bhi):
    """(a - b) mod p for canonical a, b."""
    lo, hi = sub64(alo, ahi, blo, bhi)
    underflow = (ahi < bhi) | ((ahi == bhi) & (alo < blo))
    # wrapped: result is a - b + 2^64; add p - 2^64 = -(2^32 - 1) = -EPSILON
    eps = jnp.where(underflow, u32(0xFFFFFFFF), u32(0))
    lo2 = lo - eps
    hi2 = hi - (lo < eps).astype(u32)
    return lo2, hi2


def canon64(lo, hi):
    """Canonicalize a loose (< 2^64, value-correct mod p) pair: one
    conditional subtract of p suffices because 2^64 < 2p."""
    ge_p = (hi == u32(0xFFFFFFFF)) & (lo >= u32(1))
    lo2 = jnp.where(ge_p, lo - u32(1), lo)
    hi2 = jnp.where(ge_p, hi - u32(0xFFFFFFFF), hi)
    return lo2, hi2


def reduce128_partial(n0, n1, n2, n3):
    """(n3*2^96 + n2*2^64 + n1*2^32 + n0) mod p as a LOOSE 64-bit pair:
    the result is < 2^64 and congruent mod p but may exceed p by up to
    2^32 - 2 (skip the final conditional subtract; ``canon64`` restores
    canonical form).  Valid for arbitrary u32 limbs: the overflow
    compensation never double-wraps because t < 2^64 and
    t1 <= (2^32-1)^2 give t + t1 + EPSILON < 2^65 - 2^32."""
    # t = lo64 - n3  (64-bit subtract (lo,hi) - (n3,0))
    lo, hi = n0, n1
    lo1 = lo - n3
    b0 = (lo < n3).astype(u32)
    hi1 = hi - b0
    underflow = (hi < b0)
    # if underflow: subtract EPSILON (i.e. add -2^64 mod p = -(2^32-1))
    eps = jnp.where(underflow, u32(0xFFFFFFFF), u32(0))
    lo2 = lo1 - eps
    b1 = (lo1 < eps).astype(u32)
    hi2 = hi1 - b1
    # t1 = n2 * EPSILON = (n2 << 32) - n2 : as 64-bit: lo = -n2 (wrap), hi = n2 - 1 + borrow-adjust
    t1lo = u32(0) - n2
    t1hi = jnp.where(n2 == u32(0), u32(0), n2 - u32(1))
    # t2 = t + t1 with 2^64 wrap compensation (+EPSILON on overflow)
    lo3, hi3 = add64(lo2, hi2, t1lo, t1hi)
    overflow = (hi3 < hi2) | ((hi3 == hi2) & (lo3 < lo2))
    eps2 = jnp.where(overflow, u32(0xFFFFFFFF), u32(0))
    lo4 = lo3 + eps2
    hi4 = hi3 + (lo4 < lo3).astype(u32)
    return lo4, hi4


def reduce128(n0, n1, n2, n3):
    """(n3*2^96 + n2*2^64 + n1*2^32 + n0) mod p, canonical."""
    return canon64(*reduce128_partial(n0, n1, n2, n3))


def mul_mod_partial(alo, ahi, blo, bhi):
    """Full 64x64 -> 128 via four 32x32 partials, loosely reduced
    (< 2^64, congruent mod p).  Inputs may themselves be loose."""
    ll_lo, ll_hi = mul32x32(alo, blo)
    lh_lo, lh_hi = mul32x32(alo, bhi)
    hl_lo, hl_hi = mul32x32(ahi, blo)
    hh_lo, hh_hi = mul32x32(ahi, bhi)
    # n0 = ll_lo
    # n1 = ll_hi + lh_lo + hl_lo  (carries into n2)
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(u32)
    n1 = s1 + hl_lo
    c2 = (n1 < s1).astype(u32)
    # n2 = lh_hi + hl_hi + hh_lo + carries
    s2 = lh_hi + hl_hi
    c3 = (s2 < lh_hi).astype(u32)
    n2 = s2 + hh_lo
    c4 = (n2 < s2).astype(u32)
    n2b = n2 + c1 + c2
    c5 = (n2b < n2).astype(u32)
    n3 = hh_hi + c3 + c4 + c5
    return reduce128_partial(ll_lo, n1, n2b, n3)


def mul_mod(alo, ahi, blo, bhi):
    """Full 64x64 -> 128 via four 32x32 partials, canonical result."""
    return canon64(*mul_mod_partial(alo, ahi, blo, bhi))


def sqr_mod_partial(alo, ahi):
    """x^2 mod p, loosely reduced: 3 32x32 partials instead of 4 (the
    cross term a_lo*a_hi is computed once and doubled).  Input may be
    loose; x^2 = ll + 2*cross*2^32 + hh*2^64 < 2^128, so every column
    sum below fits u32 exactly once carries are extracted."""
    ll_lo, ll_hi = mul32x32(alo, alo)
    x_lo, x_hi = mul32x32(alo, ahi)
    hh_lo, hh_hi = mul32x32(ahi, ahi)
    # double the 64-bit cross term: d = 2*x, 65 bits (top bit -> column 3)
    d0 = x_lo << u32(1)
    d1 = (x_hi << u32(1)) | (x_lo >> u32(31))
    d2 = x_hi >> u32(31)
    n1 = ll_hi + d0
    c1 = (n1 < ll_hi).astype(u32)
    s2 = hh_lo + d1
    c2 = (s2 < hh_lo).astype(u32)
    n2 = s2 + c1
    c3 = (n2 < s2).astype(u32)
    n3 = hh_hi + d2 + c2 + c3
    return reduce128_partial(ll_lo, n1, n2, n3)


def sbox7_partial(lo, hi):
    """x^7 mod p, loosely reduced throughout: 2 squarings (3 partials
    each) + 2 general multiplies, no intermediate canonicalization."""
    l2, h2 = sqr_mod_partial(lo, hi)
    l3, h3 = mul_mod_partial(l2, h2, lo, hi)
    l6, h6 = sqr_mod_partial(l3, h3)
    return mul_mod_partial(l6, h6, lo, hi)


def sbox7(lo, hi):
    """x^7 mod p (the Poseidon S-box), canonical result."""
    return canon64(*sbox7_partial(lo, hi))


def inv(lo, hi):
    """x^(p-2) mod p (Fermat inversion; 0 -> 0), canonical result.

    p - 2 = 2^64 - 2^32 - 1 is 31 ones, a zero, then 32 ones, so the
    chain builds ``c_k = x^(2^k - 1)`` by doubling (c_{2k} = c_k^(2^k)
    * c_k): ~64 squarings (3 partial products each) + 11 multiplies,
    all loosely reduced.  Matches ``ops/goldilocks.inv`` bit-exactly on
    canonical inputs (tests/test_poseidon_pallas.py)."""

    def sqn(v, n):
        for _ in range(n):
            v = sqr_mod_partial(*v)
        return v

    def mul2(a, b):
        return mul_mod_partial(a[0], a[1], b[0], b[1])

    c1 = (lo, hi)
    c2 = mul2(sqn(c1, 1), c1)
    c4 = mul2(sqn(c2, 2), c2)
    c8 = mul2(sqn(c4, 4), c4)
    c16 = mul2(sqn(c8, 8), c8)
    c24 = mul2(sqn(c16, 8), c8)
    c28 = mul2(sqn(c24, 4), c4)
    c30 = mul2(sqn(c28, 2), c2)
    c31 = mul2(sqn(c30, 1), c1)
    c32 = mul2(sqn(c31, 1), c1)  # x^(2^32 - 1)
    # e = (2^31 - 1) << 33 | (2^32 - 1):  x^e = (c31^(2^33)) * c32
    return canon64(*mul2(sqn(c31, 33), c32))
