"""Pallas TPU kernel for the initial FRI evaluation vector G.

``engine/batch_prover._fri_initial_one`` (and the equivalent inline code
in ``engine/prover.prove``) computes, per LDE point x:

    G(x) = (comb1(x) - comb1(zeta)) / (x - zeta)
         + (comb2(x) - comb2(g*zeta)) / (x - g*zeta)

over the quadratic extension GF(p^2) = F_p[X]/(X^2 - 7).  The two
extension inversions cost ~150 sequential base-field multiplies per
point, which the XLA u64 emulation compiles into 52-125 MB executables
(per-process load cost — docs/perf_notes.md rounds 3-4).  This kernel
runs the whole evaluation in VMEM on (lo, hi) uint32 limb planes.

Since the domain point x is base-field (imaginary part 0), the
denominator is (x - z0, -z1) with z1 a per-proof scalar, so the norm is
``(x - z0)^2 - 7*z1^2`` with the ``7*z1^2`` term precomputed outside the
kernel — value-identical to ``gl.ext_inv`` on the broadcast pair
(exact modular ops, canonical at every boundary), hence bit-identical
output (tests/test_fri_init_pallas.py vs the host-int oracle; chip
drives assert proof equality end-to-end).

Grid is (K, L-tiles): the proof axis folds into the grid (the batched
prover's vmap variant replaced by one small Mosaic program).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import goldilocks as gl
from . import limb64 as limb

u32 = jnp.uint32


def _split(x):
    return (x & jnp.uint64(0xFFFFFFFF)).astype(u32), (x >> jnp.uint64(32)).astype(u32)


def _fuse(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _mul7(lo, hi):
    """x * 7 mod p, canonical (value-equal to ``gl.mul_small(x, 7)``)."""
    seven = jnp.full_like(lo, u32(7))
    p0lo, p0hi = limb.mul32x32(lo, seven)
    p1lo, p1hi = limb.mul32x32(hi, seven)
    n1 = p0hi + p1lo
    c1 = (n1 < p0hi).astype(u32)
    n2 = p1hi + c1
    return limb.reduce128(p0lo, n1, n2, jnp.zeros_like(n2))


def _tile_compute(xlo, xhi, c10, c11, c20, c21, sc):
    """One proof, one [8, T] tile.  ``sc(j)``: scalar pair loads for
    j = 0..9: z0, z1, gz0, gz1, c1z0, c1z1, c2gz0, c2gz1, z1sq7,
    gz1sq7.  Returns (G0, G1) limb pairs."""

    def term(z0, z1, z1sq7, a0, a1, az0, az1):
        # denominator inverse: d = (x - z0) - z1*X; norm = d0^2 - 7 z1^2
        d0 = limb.sub_canon(xlo, xhi, *z0)
        nrm = limb.sub_canon(*limb.canon64(*limb.sqr_mod_partial(*d0)), *z1sq7)
        ninv = limb.inv(*nrm)
        di0 = limb.mul_mod(*d0, *ninv)
        di1 = limb.mul_mod(*ninv, *z1)  # -(-z1) * ninv
        # numerator: (a - a(z))
        n0 = limb.sub_canon(*a0, *az0)
        n1 = limb.sub_canon(*a1, *az1)
        # ext mul: (n0 d0 + 7 n1 d1, n0 d1 + n1 d0)
        g0 = limb.add_canon(
            *limb.mul_mod(*n0, *di0), *_mul7(*limb.mul_mod(*n1, *di1))
        )
        g1 = limb.add_canon(
            *limb.mul_mod(*n0, *di1), *limb.mul_mod(*n1, *di0)
        )
        return g0, g1

    def pair(j):
        return sc(j)

    t10, t11 = term(pair(0), pair(1), pair(8), (c10[0], c10[1]),
                    (c11[0], c11[1]), pair(4), pair(5))
    t20, t21 = term(pair(2), pair(3), pair(9), (c20[0], c20[1]),
                    (c21[0], c21[1]), pair(6), pair(7))
    return limb.add_canon(*t10, *t20), limb.add_canon(*t11, *t21)


def _make_kernel():
    def kernel(xlo_ref, xhi_ref, c10lo_ref, c10hi_ref, c11lo_ref, c11hi_ref,
               c20lo_ref, c20hi_ref, c21lo_ref, c21hi_ref, sc_ref,
               g0lo_ref, g0hi_ref, g1lo_ref, g1hi_ref):
        from jax.experimental import pallas as pl

        k = pl.program_id(0)
        g0, g1 = _tile_compute(
            xlo_ref[:], xhi_ref[:],
            (c10lo_ref[0], c10hi_ref[0]), (c11lo_ref[0], c11hi_ref[0]),
            (c20lo_ref[0], c20hi_ref[0]), (c21lo_ref[0], c21hi_ref[0]),
            lambda j: (sc_ref[k, j, 0], sc_ref[k, j, 1]),
        )
        g0lo_ref[0], g0hi_ref[0] = g0
        g1lo_ref[0], g1hi_ref[0] = g1

    return kernel


def _scalars(zetas, gzetas, c1z, c2gz):
    """[K, 10, 2] u32 SMEM table (see ``_tile_compute``); the 7*z1^2
    norm terms computed with the same gl ops as the jnp path."""
    z1sq7 = gl.mul_small(gl.square(zetas[:, 1]), 7)
    gz1sq7 = gl.mul_small(gl.square(gzetas[:, 1]), 7)
    vals = jnp.stack(
        [
            zetas[:, 0], zetas[:, 1], gzetas[:, 0], gzetas[:, 1],
            c1z[:, 0], c1z[:, 1], c2gz[:, 0], c2gz[:, 1],
            z1sq7, gz1sq7,
        ],
        axis=1,
    )  # [K, 10] u64
    return jnp.stack(
        [(vals & jnp.uint64(0xFFFFFFFF)).astype(u32),
         (vals >> jnp.uint64(32)).astype(u32)],
        axis=-1,
    )


def _stage(comb1, comb2, xs, sc, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, L = comb1.shape[0], comb1.shape[1]
    assert L % 8 == 0
    L8 = L // 8
    TX = min(512, L8)
    assert L8 % TX == 0

    xlo, xhi = _split(xs.reshape(8, L8))
    planes = []
    for comb in (comb1, comb2):
        for comp in (0, 1):
            planes.extend(_split(comb[..., comp].reshape(K, 8, L8)))

    shared = pl.BlockSpec(
        (8, TX), lambda k, i: (jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    per_k = pl.BlockSpec(
        (1, 8, TX), lambda k, i: (k, jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    sc_spec = pl.BlockSpec(
        (K, 10, 2),
        lambda k, i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.SMEM,
    )
    outs = pl.pallas_call(
        _make_kernel(),
        grid=(K, L8 // TX),
        in_specs=[shared, shared] + [per_k] * 8 + [sc_spec],
        out_specs=[per_k] * 4,
        out_shape=[jax.ShapeDtypeStruct((K, 8, L8), u32)] * 4,
        interpret=interpret,
    )(xlo, xhi, *planes, sc)
    g0 = _fuse(outs[0], outs[1]).reshape(K, L)
    g1 = _fuse(outs[2], outs[3]).reshape(K, L)
    return jnp.stack([g0, g1], axis=-1)


def fri_initial_pallas_batched(comb1, comb2, xs, zetas, gzetas, c1z, c2gz,
                               interpret: bool = False):
    """Batched drop-in for ``vmap(_fri_initial_one)``: comb1/comb2
    [K, L, 2] ext, xs [L] base domain points, per-proof scalars [K, 2]
    -> G [K, L, 2], bit-identical to the jnp path.  Disk-backed
    executable cache (ops/pallas_aot.py)."""
    from .pallas_aot import aot_kernel

    sc = _scalars(zetas, gzetas, c1z, c2gz)
    fn = aot_kernel(
        "fri_init_pallas",
        lambda: partial(_stage, interpret=interpret),
        (interpret,),
    )
    return fn(comb1, comb2, xs, sc)


def fri_initial_jnp_limb(comb1, comb2, xs, zeta, gzeta, c1z, c2gz):
    """Eager limb-plane path sharing ``_tile_compute`` — the CPU test
    oracle for the kernel math (single proof)."""
    L = comb1.shape[0]
    L8 = L // 8
    xlo, xhi = _split(xs.reshape(8, L8))
    comps = []
    for comb in (comb1, comb2):
        for c in (0, 1):
            comps.append(_split(comb[:, c].reshape(8, L8)))
    sc = _scalars(zeta[None], gzeta[None], c1z[None], c2gz[None])
    g0, g1 = _tile_compute(
        xlo, xhi, comps[0], comps[1], comps[2], comps[3],
        lambda j: (sc[0, j, 0], sc[0, j, 1]),
    )
    return jnp.stack(
        [_fuse(*g0).reshape(L), _fuse(*g1).reshape(L)], axis=-1
    )
