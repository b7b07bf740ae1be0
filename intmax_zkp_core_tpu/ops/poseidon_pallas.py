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

from . import limb64 as limb
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

# Row-form MDS matrix for the MXU path: value[r] = sum_i M[r, i] * state[i]
# with M[r, i] = circ[(i - r) % 12] and the diagonal term folded into M[0, 0].
_MDS_M = np.zeros((12, 12), dtype=np.float32)
for _r in range(12):
    for _i in range(12):
        _MDS_M[_r, _i] = MDS_MATRIX_CIRC[(_i - _r) % 12]
_MDS_M[0, 0] += MDS_MATRIX_DIAG[0]


def _mxu_enabled() -> bool:
    # default ON: bit-exact on chip (drive-verified) and 1.47x the VPU
    # accumulate path (17.21 vs 11.73 M perm/s at 2^20, v5e —
    # docs/perf_notes.md); INTMAX_TPU_POSEIDON_MXU=0 restores the VPU MDS
    import os

    return os.environ.get("INTMAX_TPU_POSEIDON_MXU", "1") == "1"


def _make_permute_body(mxu_mds: bool | None = None):
    """Returns ``permute_tile(lo, hi, rc_lo, rc_hi) -> (lo, hi)``: the full
    30-round permutation over [12, TB] u32 limb planes, shared by the plain
    permutation kernel and the fused sponge kernel.

    ``mxu_mds``: route the MDS layer over the MXU as an exact
    bf16xbf16->f32 matmul on 8-bit limb planes (matrix entries <= 49 and
    limbs <= 255 are exact in bf16; column sums <= 264*255 < 2^17 are
    exact in f32), freeing the VPU of the per-term multiply-accumulate
    carry chains.  When enabled, ``permute_tile`` takes a fifth argument:
    the [12, 12] bf16 MDS matrix (Mosaic kernels cannot capture array
    constants).  Defaults to the INTMAX_TPU_POSEIDON_MXU env switch
    (``_mxu_enabled``: ON unless explicitly set to 0)."""
    if mxu_mds is None:
        mxu_mds = _mxu_enabled()
    u32 = jnp.uint32
    add_canon = limb.add_canon
    mul32x32 = limb.mul32x32
    reduce128 = limb.reduce128
    reduce128_partial = limb.reduce128_partial
    sbox = limb.sbox7_partial

    circ = MDS_MATRIX_CIRC
    diag0 = MDS_MATRIX_DIAG[0]

    def mds_mxu(lo, hi, mds):
        """M @ state on the MXU: 8 exact bf16 matmuls over 8-bit limb
        planes, recombined into (n0, n1, n2) u32 limb columns (the
        caller folds the next round's constants in before reducing)."""
        v = []
        for src in (lo, hi):
            for s in (0, 8, 16, 24):
                # u32 -> i32 -> f32 -> bf16: Mosaic has neither u32->bf16
                # nor u32->f32 casts; every hop is exact for values <= 255
                plane = ((src >> u32(s)) & u32(0xFF)).astype(
                    jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
                prod = jnp.dot(mds, plane, preferred_element_type=jnp.float32)
                # f32 -> i32 -> u32 (values < 2^17, exact)
                v.append(prod.astype(jnp.int32).astype(u32))
        # value = sum_q w_q * 2^(16 q),  w_q = v[2q] + v[2q+1]*2^8 < 2^26
        w = [v[2 * q] + (v[2 * q + 1] << u32(8)) for q in range(4)]
        n0 = w[0] + ((w[1] & u32(0xFFFF)) << u32(16))
        c0 = (n0 < w[0]).astype(u32)
        mid = (w[1] >> u32(16)) + c0 + w[2]  # < 2^27, no overflow
        n1 = mid + ((w[3] & u32(0xFFFF)) << u32(16))
        c1 = (n1 < mid).astype(u32)
        n2 = (w[3] >> u32(16)) + c1
        return n0, n1, n2

    def fold_rc_reduce(n0, n1, n2, rnd, rc_lo, rc_hi, lo_shape):
        """Reduce the MDS limb columns, folding the NEXT round's
        constants into the 96-bit value first (a 64-bit add with carry
        into n2 — n2 stays far below 2^32) so no separate canonical
        add is needed; the state stays loose between rounds and is
        canonicalized once after the final round."""
        if rnd + 1 < N_ROUNDS:
            rlo = jnp.broadcast_to(rc_lo[rnd + 1][:, None], lo_shape)
            rhi = jnp.broadcast_to(rc_hi[rnd + 1][:, None], lo_shape)
            s0 = n0 + rlo
            c0 = (s0 < n0).astype(u32)
            s1a = n1 + rhi
            ca = (s1a < n1).astype(u32)
            s1 = s1a + c0
            cb = (s1 < s1a).astype(u32)
            return reduce128_partial(s0, s1, n2 + ca + cb, jnp.zeros_like(n2))
        return reduce128(n0, n1, n2, jnp.zeros_like(n2))

    def permute_tile(lo, hi, rc_lo, rc_hi, mds=None):
        # round-0 constants (the state is canonical at entry; later
        # rounds' constants are folded into the previous MDS reduction)
        lo, hi = add_canon(lo, hi,
                           jnp.broadcast_to(rc_lo[0][:, None], lo.shape),
                           jnp.broadcast_to(rc_hi[0][:, None], hi.shape))
        for rnd in range(N_ROUNDS):
            # sbox layer (loose: intermediates skip canonicalization)
            if rnd < HALF_N_FULL_ROUNDS or rnd >= HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS:
                lo, hi = sbox(lo, hi)
            else:
                l0, h0 = sbox(lo[0:1], hi[0:1])
                lo = jnp.concatenate([l0, lo[1:]], axis=0)
                hi = jnp.concatenate([h0, hi[1:]], axis=0)
            if mxu_mds:
                n0, n1, n2 = mds_mxu(lo, hi, mds)
                lo, hi = fold_rc_reduce(n0, n1, n2, rnd, rc_lo, rc_hi, lo.shape)
                continue
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
            lo, hi = fold_rc_reduce(accll, n1, n2, rnd, rc_lo, rc_hi, lo.shape)
        return lo, hi

    return permute_tile


def _make_kernel(tb: int, mxu_mds: bool = False):
    permute_tile = _make_permute_body(mxu_mds)

    if mxu_mds:

        def kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, mds_ref, out_lo_ref, out_hi_ref):
            lo, hi = permute_tile(
                lo_ref[:], hi_ref[:], rc_lo_ref[:], rc_hi_ref[:], mds_ref[:]
            )
            out_lo_ref[:] = lo
            out_hi_ref[:] = hi

    else:

        def kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, out_lo_ref, out_hi_ref):
            lo, hi = permute_tile(lo_ref[:], hi_ref[:], rc_lo_ref[:], rc_hi_ref[:])
            out_lo_ref[:] = lo
            out_hi_ref[:] = hi

    return kernel


def _make_sponge_kernel(width: int, mxu_mds: bool = False):
    """Fused rate-8 overwrite-absorb sponge over [width, TB] input planes:
    the whole ceil(width/8)-permutation chain runs in VMEM, emitting only
    the 4 digest lanes (plonky2 hash_n_to_hash_no_pad semantics)."""
    permute_tile = _make_permute_body(mxu_mds)

    def body(in_lo, in_hi, rc_lo, rc_hi, out_lo_ref, out_hi_ref, mds=None):
        lo = jnp.zeros((SPONGE_WIDTH,) + in_lo.shape[1:], dtype=jnp.uint32)
        hi = jnp.zeros_like(lo)
        for start in range(0, width, 8):
            c = min(8, width - start)
            lo = jnp.concatenate([in_lo[start : start + c], lo[c:]], axis=0)
            hi = jnp.concatenate([in_hi[start : start + c], hi[c:]], axis=0)
            lo, hi = permute_tile(lo, hi, rc_lo, rc_hi, mds)
        out_lo_ref[:] = lo[:4]
        out_hi_ref[:] = hi[:4]

    if mxu_mds:

        def kernel(in_lo_ref, in_hi_ref, rc_lo_ref, rc_hi_ref, mds_ref, out_lo_ref, out_hi_ref):
            body(in_lo_ref[:], in_hi_ref[:], rc_lo_ref[:], rc_hi_ref[:],
                 out_lo_ref, out_hi_ref, mds_ref[:])

    else:

        def kernel(in_lo_ref, in_hi_ref, rc_lo_ref, rc_hi_ref, out_lo_ref, out_hi_ref):
            body(in_lo_ref[:], in_hi_ref[:], rc_lo_ref[:], rc_hi_ref[:],
                 out_lo_ref, out_hi_ref)

    return kernel


def hash_no_pad_pallas(inputs: jax.Array, interpret: bool = False,
                       mxu: bool | None = None) -> jax.Array:
    """inputs [B, width] uint64 -> [B, 4] digests via the fused sponge
    kernel (B must be a multiple of 256, width > 4).  ``mxu`` routes the
    MDS layers over the MXU (default: INTMAX_TPU_POSEIDON_MXU env)."""
    if mxu is None:
        mxu = _mxu_enabled()
    return _hash_no_pad_pallas(inputs, interpret, mxu)


def _hash_no_pad_pallas(inputs: jax.Array, interpret: bool, mxu: bool) -> jax.Array:
    if isinstance(inputs, jax.core.Tracer):
        return _hash_no_pad_impl(inputs, interpret, mxu)
    from .pallas_aot import aot_kernel

    fn = aot_kernel(
        "poseidon_sponge_pallas",
        lambda: partial(_hash_no_pad_impl, interpret=interpret, mxu=mxu),
        (interpret, mxu),
    )
    return fn(inputs)


def _hash_no_pad_impl(inputs: jax.Array, interpret: bool, mxu: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, width = inputs.shape
    TB = 256
    assert B % TB == 0
    st = jnp.transpose(inputs)  # [width, B]
    lo = (st & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (st >> jnp.uint64(32)).astype(jnp.uint32)

    kernel = _make_sponge_kernel(width, mxu)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((width, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
        pl.BlockSpec((width, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
        const_spec((N_ROUNDS, 12)),
        const_spec((N_ROUNDS, 12)),
    ]
    operands = [lo, hi, jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)]
    if mxu:
        in_specs.append(const_spec((12, 12)))
        operands.append(jnp.asarray(_MDS_M, dtype=jnp.bfloat16))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((4, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, B), jnp.uint32),
            jax.ShapeDtypeStruct((4, B), jnp.uint32),
        ],
        interpret=interpret,
    )(*operands)
    out = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << jnp.uint64(32))
    return jnp.transpose(out)


def permute_pallas(states: jax.Array, interpret: bool = False,
                   mxu: bool | None = None) -> jax.Array:
    """states [B, 12] uint64 -> permuted [B, 12] uint64 via the Pallas
    kernel (B must be a multiple of 256).  ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU test path).  ``mxu`` routes the
    MDS layers over the MXU (default: INTMAX_TPU_POSEIDON_MXU env)."""
    if mxu is None:
        mxu = _mxu_enabled()
    return _permute_pallas(states, interpret, mxu)


def _permute_pallas(states: jax.Array, interpret: bool, mxu: bool) -> jax.Array:
    if isinstance(states, jax.core.Tracer):
        return _permute_impl(states, interpret, mxu)
    from .pallas_aot import aot_kernel

    fn = aot_kernel(
        "poseidon_permute_pallas",
        lambda: partial(_permute_impl, interpret=interpret, mxu=mxu),
        (interpret, mxu),
    )
    return fn(states)


def _permute_impl(states: jax.Array, interpret: bool, mxu: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = states.shape[0]
    TB = 256
    assert B % TB == 0
    st = jnp.transpose(states)  # [12, B]
    lo = (st & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (st >> jnp.uint64(32)).astype(jnp.uint32)

    kernel = _make_kernel(TB, mxu)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((12, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
        pl.BlockSpec((12, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
        const_spec((N_ROUNDS, 12)),
        const_spec((N_ROUNDS, 12)),
    ]
    operands = [lo, hi, jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)]
    if mxu:
        in_specs.append(const_spec((12, 12)))
        operands.append(jnp.asarray(_MDS_M, dtype=jnp.bfloat16))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((12, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, TB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((12, B), jnp.uint32),
            jax.ShapeDtypeStruct((12, B), jnp.uint32),
        ],
        interpret=interpret,
    )(*operands)
    out = out_lo.astype(jnp.uint64) | (out_hi.astype(jnp.uint64) << jnp.uint64(32))
    return jnp.transpose(out)
