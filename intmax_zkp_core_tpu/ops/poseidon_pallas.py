"""Pallas TPU kernel for the batched Poseidon-12 permutation.

The jnp path relies on XLA's u64 emulation (every add/mul splits into
32-bit lanes generically).  This kernel keeps the whole 30-round
permutation in VMEM with an explicit (lo, hi) uint32-limb representation
and hand-scheduled 16-bit partial products, cutting the op count of the
modular multiply and avoiding intermediate HBM round-trips.

Layout: state [12, B] split into lo/hi uint32 planes; grid over batch
tiles; each program processes a [12, TB] tile fully in VMEM.

Falls back to the jnp path automatically if Pallas lowering fails on the
current backend (e.g. CPU interpret in tests).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .poseidon_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_WIDTH,
)

P = 0xFFFFFFFF00000001
_RC_LO = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, 12) & 0xFFFFFFFF
_RC_HI = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, 12) >> 32
_RC_LO = _RC_LO.astype(np.uint32)
_RC_HI = _RC_HI.astype(np.uint32)


def _make_permute_body():
    """Returns ``permute_tile(lo, hi, rc_lo, rc_hi) -> (lo, hi)``: the full
    30-round permutation over [12, TB] u32 limb planes, shared by the plain
    permutation kernel and the fused sponge kernel."""
    u32 = jnp.uint32

    def add64(alo, ahi, blo, bhi):
        lo = alo + blo
        carry = (lo < alo).astype(u32)
        hi = ahi + bhi + carry
        return lo, hi

    def sub64(alo, ahi, blo, bhi):
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
        """full 64x64 -> 128 via four 32x32, then reduce."""
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

    def sbox(lo, hi):
        l2, h2 = mul_mod(lo, hi, lo, hi)
        l3, h3 = mul_mod(l2, h2, lo, hi)
        l6, h6 = mul_mod(l3, h3, l3, h3)
        return mul_mod(l6, h6, lo, hi)

    circ = MDS_MATRIX_CIRC
    diag0 = MDS_MATRIX_DIAG[0]

    def permute_tile(lo, hi, rc_lo, rc_hi):
        for rnd in range(N_ROUNDS):
            # constant layer
            rlo = rc_lo[rnd][:, None]
            rhi = rc_hi[rnd][:, None]
            lo, hi = add_canon(lo, hi, jnp.broadcast_to(rlo, lo.shape),
                               jnp.broadcast_to(rhi, hi.shape))
            # sbox layer
            if rnd < HALF_N_FULL_ROUNDS or rnd >= HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS:
                lo, hi = sbox(lo, hi)
            else:
                l0, h0 = sbox(lo[0:1], hi[0:1])
                lo = jnp.concatenate([l0, lo[1:]], axis=0)
                hi = jnp.concatenate([h0, hi[1:]], axis=0)
            # MDS: accumulate products of small constants on 32-bit planes
            # value = sum_i c_i * state[(r+i) % 12]; accumulate lo/hi planes
            # in 64-bit-safe fashion: each c*lo < 2^38 -> need 64-bit accum;
            # emulate with (accLL, accLH) pairs of u32.
            accll = jnp.zeros_like(lo)
            acclh = jnp.zeros_like(lo)
            acchl = jnp.zeros_like(lo)
            acchh = jnp.zeros_like(lo)

            def acc_add(all_, alh, v_lo, c):
                # (all_, alh) += c * v_lo   where product < 2^38
                p_lo, p_hi = mul32x32(v_lo, jnp.full_like(v_lo, jnp.uint32(c)))
                s = all_ + p_lo
                carry = (s < all_).astype(u32)
                return s, alh + p_hi + carry

            for i, c in enumerate(circ):
                # logical roll by concatenation (avoids padded-sublane
                # ambiguity of pltpu.roll on a 12-row tile)
                rolled_lo = jnp.concatenate([lo[i:], lo[:i]], axis=0) if i else lo
                rolled_hi = jnp.concatenate([hi[i:], hi[:i]], axis=0) if i else hi
                accll, acclh = acc_add(accll, acclh, rolled_lo, c)
                acchl, acchh = acc_add(acchl, acchh, rolled_hi, c)
            if diag0:
                d_lo, d_lh = mul32x32(lo[0:1], jnp.full_like(lo[0:1], jnp.uint32(diag0)))
                s0 = accll[0:1] + d_lo
                carry = (s0 < accll[0:1]).astype(u32)
                accll = jnp.concatenate([s0, accll[1:]], axis=0)
                acclh = jnp.concatenate([acclh[0:1] + d_lh + carry, acclh[1:]], axis=0)
                e_lo, e_lh = mul32x32(hi[0:1], jnp.full_like(hi[0:1], jnp.uint32(diag0)))
                s1 = acchl[0:1] + e_lo
                carry1 = (s1 < acchl[0:1]).astype(u32)
                acchl = jnp.concatenate([s1, acchl[1:]], axis=0)
                acchh = jnp.concatenate([acchh[0:1] + e_lh + carry1, acchh[1:]], axis=0)
            # value = (accll + acclh*2^32) + 2^32*(acchl + acchh*2^32)
            #       = n0=accll, n1=acclh+acchl (w/ carry), n2=acchh+carry, n3=0
            n1 = acclh + acchl
            c6 = (n1 < acclh).astype(u32)
            n2 = acchh + c6
            lo, hi = reduce128(accll, n1, n2, jnp.zeros_like(n2))
        return lo, hi

    return permute_tile


def _make_kernel(tb: int):
    permute_tile = _make_permute_body()

    def kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, out_lo_ref, out_hi_ref):
        lo, hi = permute_tile(lo_ref[:], hi_ref[:], rc_lo_ref[:], rc_hi_ref[:])
        out_lo_ref[:] = lo
        out_hi_ref[:] = hi

    return kernel


def _make_sponge_kernel(width: int):
    """Fused rate-8 overwrite-absorb sponge over [width, TB] input planes:
    the whole ceil(width/8)-permutation chain runs in VMEM, emitting only
    the 4 digest lanes (plonky2 hash_n_to_hash_no_pad semantics)."""
    permute_tile = _make_permute_body()

    def kernel(in_lo_ref, in_hi_ref, rc_lo_ref, rc_hi_ref, out_lo_ref, out_hi_ref):
        rc_lo = rc_lo_ref[:]
        rc_hi = rc_hi_ref[:]
        in_lo = in_lo_ref[:]  # [width, TB]
        in_hi = in_hi_ref[:]
        lo = jnp.zeros((SPONGE_WIDTH,) + in_lo.shape[1:], dtype=jnp.uint32)
        hi = jnp.zeros_like(lo)
        for start in range(0, width, 8):
            c = min(8, width - start)
            lo = jnp.concatenate([in_lo[start : start + c], lo[c:]], axis=0)
            hi = jnp.concatenate([in_hi[start : start + c], hi[c:]], axis=0)
            lo, hi = permute_tile(lo, hi, rc_lo, rc_hi)
        out_lo_ref[:] = lo[:4]
        out_hi_ref[:] = hi[:4]

    return kernel


@partial(jax.jit, static_argnums=(1,))
def hash_no_pad_pallas(inputs: jax.Array, interpret: bool = False) -> jax.Array:
    """inputs [B, width] uint64 -> [B, 4] digests via the fused sponge
    kernel (B must be a multiple of 256, width > 4)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, width = inputs.shape
    TB = 256
    assert B % TB == 0
    st = jnp.transpose(inputs)  # [width, B]
    lo = (st & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (st >> jnp.uint64(32)).astype(jnp.uint32)

    kernel = _make_sponge_kernel(width)
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((width, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (N_ROUNDS, 12),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_ROUNDS, 12),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((4, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, B), jnp.uint32),
            jax.ShapeDtypeStruct((4, B), jnp.uint32),
        ],
        interpret=interpret,
    )(lo, hi, jnp.asarray(_RC_LO), jnp.asarray(_RC_HI))
    out = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << jnp.uint64(32))
    return jnp.transpose(out)


@partial(jax.jit, static_argnums=(1,))
def permute_pallas(states: jax.Array, interpret: bool = False) -> jax.Array:
    """states [B, 12] uint64 -> permuted [B, 12] uint64 via the Pallas
    kernel (B must be a multiple of 256).  ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU test path)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = states.shape[0]
    TB = 256
    assert B % TB == 0
    st = jnp.transpose(states)  # [12, B]
    lo = (st & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (st >> jnp.uint64(32)).astype(jnp.uint32)

    kernel = _make_kernel(TB)
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((12, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (N_ROUNDS, 12),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_ROUNDS, 12),
                lambda i: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((12, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((12, B), jnp.uint32),
            jax.ShapeDtypeStruct((12, B), jnp.uint32),
        ],
        interpret=interpret,
    )(lo, hi, jnp.asarray(_RC_LO), jnp.asarray(_RC_HI))
    out = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << jnp.uint64(32))
    return jnp.transpose(out)
