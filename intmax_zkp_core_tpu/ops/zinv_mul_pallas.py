"""Pallas TPU kernel for the quotient divide: q = acc * Z_H^{-1}.

The tail of the quotient computation divides the alpha-combined
constraint accumulator by the vanishing polynomial Z_H over the LDE
coset (``engine/prover.py::quotient_finish``).  The Fermat inversion
(~125 sequential modular squarings/muls) is the dominant part of that
kernel's XLA-emulated u64 graph (133 MB executable); here it runs in
VMEM on (lo, hi) uint32 limb planes via ``limb64.inv``, with Z_H^{-1}
computed once per tile and multiplied into every accumulator row.  The
inverse NTT + coset shift stay in XLA (small graphs).

Bit-identical to ``gl.mul(acc, gl.inv(z_h))`` (canonical values;
tests/test_perm_quotient_pallas.py drives ``limb64.inv`` exactness and
the chip drive asserts proof equality end-to-end).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import limb64 as limb

u32 = jnp.uint32


def _split(x):
    return (x & jnp.uint64(0xFFFFFFFF)).astype(u32), (x >> jnp.uint64(32)).astype(u32)


def _fuse(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _make_kernel(rows8: int):
    def kernel(zlo_ref, zhi_ref, alo_ref, ahi_ref, out_lo_ref, out_hi_ref):
        zinv_lo, zinv_hi = limb.inv(zlo_ref[:], zhi_ref[:])
        outs_lo = []
        outs_hi = []
        for r in range(rows8):
            olo, ohi = limb.mul_mod(
                alo_ref[8 * r : 8 * r + 8, :], ahi_ref[8 * r : 8 * r + 8, :],
                zinv_lo, zinv_hi,
            )
            outs_lo.append(olo)
            outs_hi.append(ohi)
        out_lo_ref[:] = jnp.concatenate(outs_lo, axis=0)
        out_hi_ref[:] = jnp.concatenate(outs_hi, axis=0)

    return kernel


def zinv_mul_pallas(acc, z_h, interpret: bool = False):
    """acc [..., L] u64, z_h [L] u64 -> acc * z_h^{-1} elementwise mod p.
    All leading axes fold into the row dimension of one Mosaic program
    (disk-backed executable cache — see ops/pallas_aot.py)."""
    from .pallas_aot import aot_kernel

    fn = aot_kernel(
        "zinv_mul_pallas",
        lambda: partial(_zinv_mul_impl, interpret=interpret),
        (interpret,),
    )
    return fn(acc, z_h)


def _zinv_mul_impl(acc, z_h, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = acc.shape[:-1]
    L = acc.shape[-1]
    S = 1
    for d in lead:
        S *= d
    assert L % 8 == 0
    L8 = L // 8
    TX = min(512, L8)
    assert L8 % TX == 0

    alo, ahi = _split(acc.reshape(S * 8, L8))
    zlo, zhi = _split(z_h.reshape(8, L8))

    kernel = _make_kernel(S)
    spec = lambda rows_: pl.BlockSpec(
        (rows_, TX), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(L8 // TX,),
        in_specs=[spec(8), spec(8), spec(S * 8), spec(S * 8)],
        out_specs=[spec(S * 8), spec(S * 8)],
        out_shape=[
            jax.ShapeDtypeStruct((S * 8, L8), u32),
            jax.ShapeDtypeStruct((S * 8, L8), u32),
        ],
        interpret=interpret,
    )(zlo, zhi, alo, ahi)
    return _fuse(out_lo, out_hi).reshape(acc.shape)
