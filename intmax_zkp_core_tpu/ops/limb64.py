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


def reduce128(n0, n1, n2, n3):
    """(n3*2^96 + n2*2^64 + n1*2^32 + n0) mod p using
    2^64 = 2^32 - 1, 2^96 = -1."""
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
    ge_p = (hi4 == u32(0xFFFFFFFF)) & (lo4 >= u32(1))
    lo5 = jnp.where(ge_p, lo4 - u32(1), lo4)
    hi5 = jnp.where(ge_p, hi4 - u32(0xFFFFFFFF), hi4)
    return lo5, hi5


def mul_mod(alo, ahi, blo, bhi):
    """Full 64x64 -> 128 via four 32x32 partials, then reduce."""
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
    return reduce128(ll_lo, n1, n2b, n3)


def sbox7(lo, hi):
    """x^7 mod p (the Poseidon S-box): 3 modular multiplies."""
    l2, h2 = mul_mod(lo, hi, lo, hi)
    l3, h3 = mul_mod(l2, h2, lo, hi)
    l6, h6 = mul_mod(l3, h3, l3, h3)
    return mul_mod(l6, h6, lo, hi)
