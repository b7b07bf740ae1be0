"""Pallas TPU kernel for the permutation-argument quotient terms.

``engine/prover.py::perm_quotient_part`` alpha-combines the L_0 boundary
term and the nch permutation-chunk transition terms over the LDE coset.
Its XLA-emulated u64 graph compiles to 190-280 MB executables whose
per-process device loads dominate fresh-process proving through a remote
backend (docs/perf_notes.md rounds 3-4).  This kernel evaluates the whole
computation per LDE tile in VMEM on (lo, hi) uint32 limb planes.

Alpha-combination: the jnp path folds ``acc += apow * term_k, apow *=
alpha`` over the nch+1 terms.  Field ops are exact, so this equals
``acc = sum_k table[k] * term_k`` with ``table[c, k] = alpha_c^k``
computed outside the kernel (nch tiny muls) and passed in SMEM —
the same table trick as ``ops/gate_quotient_pallas``.  The cyclic Z
shift (``roll(Z, -blowup)``) crosses tile boundaries, so it is applied
in XLA before the kernel and ``Z_shift`` rides in as an input.

Outputs are bit-identical to the jnp path (same left-fold order, exact
modular ops; tests/test_perm_quotient_pallas.py vs the host-int oracle).

The grid is (K*C, L-tiles) — proof batch x challenge — so the batched
prover reuses the SAME kernel with a bigger grid instead of the
separately-compiled 190-284 MB vmap variants.

Reference scope: plonky2's vanishing-polynomial permutation terms in
``eval_vanishing_poly_base_batch`` (SURVEY §2.1 prover row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import goldilocks as gl
from . import limb64 as limb

u32 = jnp.uint32

CHUNK = 7


def _split(x):
    return (x & jnp.uint64(0xFFFFFFFF)).astype(u32), (x >> jnp.uint64(32)).astype(u32)


def _fuse(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _split_tbl(x):
    """u64 [...] -> u32 [..., 2] (lo, hi) for SMEM scalar tables."""
    return jnp.stack(
        [(x & jnp.uint64(0xFFFFFFFF)).astype(u32), (x >> jnp.uint64(32)).astype(u32)],
        axis=-1,
    )


def _tile_compute(R: int, nch: int, wlo, whi, siglo, sighi, xlo, xhi,
                  l0lo, l0hi, zlo, zhi, zslo, zshi, pplo, pphi,
                  sc, bk, tbl):
    """One (proof, challenge), one [*, T] tile -> acc (lo, hi) [8, T].

    ``sc``: scalar loads (beta_lo, beta_hi, gamma_lo, gamma_hi);
    ``bk[i]``: (beta*k_i) scalar pair loads; ``tbl[k]``: alpha-power
    scalar pair loads — all callables indexing SMEM refs (or plain
    arrays in the eager test path)."""
    beta_lo, beta_hi, gamma_lo, gamma_hi = sc

    one_lo = jnp.ones_like(zlo)
    one_hi = jnp.zeros_like(zhi)
    # term 0: l0 * (Z - 1)
    t_lo, t_hi = limb.sub_canon(zlo, zhi, one_lo, one_hi)
    t_lo, t_hi = limb.mul_mod(l0lo, l0hi, t_lo, t_hi)
    k0_lo, k0_hi = tbl(0)
    acc = limb.mul_mod(t_lo, t_hi, k0_lo, k0_hi)

    prev = (zlo, zhi)
    for j in range(nch):
        f = None
        g = None
        for i in range(j * CHUNK, min((j + 1) * CHUNK, R)):
            wl = wlo[8 * i : 8 * i + 8, :]
            wh = whi[8 * i : 8 * i + 8, :]
            bk_lo, bk_hi = bk(i)
            # f_i = w + (beta*k_i)*x + gamma
            plo, phi = limb.mul_mod(xlo, xhi, bk_lo, bk_hi)
            flo, fhi = limb.add_canon(wl, wh, plo, phi)
            flo, fhi = limb.add_canon(flo, fhi, gamma_lo, gamma_hi)
            # g_i = w + beta*sigma + gamma
            qlo, qhi = limb.mul_mod(siglo[8 * i : 8 * i + 8, :],
                                    sighi[8 * i : 8 * i + 8, :],
                                    beta_lo, beta_hi)
            glo, ghi = limb.add_canon(wl, wh, qlo, qhi)
            glo, ghi = limb.add_canon(glo, ghi, gamma_lo, gamma_hi)
            f = (flo, fhi) if f is None else limb.mul_mod(*f, flo, fhi)
            g = (glo, ghi) if g is None else limb.mul_mod(*g, glo, ghi)
        if j == nch - 1:
            nxt = (zslo, zshi)
        else:
            nxt = (pplo[8 * j : 8 * j + 8, :], pphi[8 * j : 8 * j + 8, :])
        t = limb.sub_canon(*limb.mul_mod(*nxt, *g), *limb.mul_mod(*prev, *f))
        kj_lo, kj_hi = tbl(j + 1)
        term = limb.mul_mod(*t, kj_lo, kj_hi)
        acc = limb.add_canon(*acc, *term)
        if j < nch - 1:
            prev = nxt
    return acc


def _make_kernel(R: int, nch: int):
    def kernel(wlo_ref, whi_ref, siglo_ref, sighi_ref, xlo_ref, xhi_ref,
               l0lo_ref, l0hi_ref, zlo_ref, zhi_ref, zslo_ref, zshi_ref,
               pplo_ref, pphi_ref, sc_ref, bk_ref, tbl_ref,
               out_lo_ref, out_hi_ref):
        from jax.experimental import pallas as pl

        # SMEM tables ride in whole (Mosaic requires full SMEM blocks);
        # the grid is (K, C, tiles) so rows index directly off the
        # program ids — no arithmetic on traced ids (see
        # perm_columns_pallas._make_kernel)
        k = pl.program_id(0)
        c = pl.program_id(1)
        acc_lo, acc_hi = _tile_compute(
            R, nch,
            wlo_ref[0], whi_ref[0],
            siglo_ref[:], sighi_ref[:],
            xlo_ref[:], xhi_ref[:],
            l0lo_ref[:], l0hi_ref[:],
            zlo_ref[0, 0], zhi_ref[0, 0],
            zslo_ref[0, 0], zshi_ref[0, 0],
            pplo_ref[0, 0], pphi_ref[0, 0],
            (sc_ref[k, c, 0], sc_ref[k, c, 1], sc_ref[k, c, 2],
             sc_ref[k, c, 3]),
            lambda i: (bk_ref[k, c, i, 0], bk_ref[k, c, i, 1]),
            lambda j: (tbl_ref[k, c, j, 0], tbl_ref[k, c, j, 1]),
        )
        out_lo_ref[0, 0] = acc_lo
        out_hi_ref[0, 0] = acc_hi

    return kernel


def _stage_batched(wires_lde, zs_lde, zs_shift, pps_lde, sc, bk, tbl,
                   sigma_lde, xs, l0, interpret: bool):
    """wires_lde [K, R, L] (routed wires only), zs/zs_shift [K, C, L],
    pps [K, C, nch-1, L]; sc [K*C, 4], bk [K*C, R, 2], tbl
    [K*C, nch+1, 2] u32 scalar tables -> acc [K, C, L]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, R, L = wires_lde.shape
    C = zs_lde.shape[1]
    nch = (R + CHUNK - 1) // CHUNK
    assert L % 8 == 0
    L8 = L // 8
    TX = min(256, L8)
    assert L8 % TX == 0

    wlo, whi = _split(wires_lde.reshape(K, R * 8, L8))
    siglo, sighi = _split(sigma_lde.reshape(R * 8, L8))
    xlo, xhi = _split(xs.reshape(8, L8))
    l0lo, l0hi = _split(l0.reshape(8, L8))
    zlo, zhi = _split(zs_lde.reshape(K, C, 8, L8))
    zslo, zshi = _split(zs_shift.reshape(K, C, 8, L8))
    pp_rows = max(nch - 1, 1)
    if nch > 1:
        pp = pps_lde.reshape(K, C, (nch - 1) * 8, L8)
    else:
        pp = jnp.zeros((K, C, 8, L8), jnp.uint64)
    pplo, pphi = _split(pp)
    sc = sc.reshape((K, C) + sc.shape[1:])
    bk = bk.reshape((K, C) + bk.shape[1:])
    tbl = tbl.reshape((K, C) + tbl.shape[1:])

    kernel = _make_kernel(R, nch)
    shared = lambda rows_: pl.BlockSpec(
        (rows_, TX), lambda k, c, i: (jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    per_k = pl.BlockSpec(
        (1, R * 8, TX), lambda k, c, i: (k, jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    per_kc = lambda rows_: pl.BlockSpec(
        (1, 1, rows_, TX), lambda k, c, i: (k, c, jnp.int32(0), i),
        memory_space=pltpu.VMEM,
    )
    smem = lambda shape: pl.BlockSpec(
        (K, C) + shape,
        lambda k, c, i: tuple(jnp.int32(0) for _ in range(len(shape) + 2)),
        memory_space=pltpu.SMEM,
    )
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(K, C, L8 // TX),
        in_specs=[
            per_k, per_k,
            shared(R * 8), shared(R * 8),
            shared(8), shared(8),
            shared(8), shared(8),
            per_kc(8), per_kc(8),
            per_kc(8), per_kc(8),
            per_kc(pp_rows * 8), per_kc(pp_rows * 8),
            smem((4,)), smem((R, 2)), smem((nch + 1, 2)),
        ],
        out_specs=[per_kc(8), per_kc(8)],
        out_shape=[
            jax.ShapeDtypeStruct((K, C, 8, L8), u32),
            jax.ShapeDtypeStruct((K, C, 8, L8), u32),
        ],
        interpret=interpret,
    )(wlo, whi, siglo, sighi, xlo, xhi, l0lo, l0hi,
      zlo, zhi, zslo, zshi, pplo, pphi, sc, bk, tbl)
    return _fuse(out_lo, out_hi).reshape(K, C, L)


def _scalar_tables(betas, gammas, alphas, k_is, nch: int):
    """(sc [K*C, 4], bk [K*C, R, 2], tbl [K*C, nch+1, 2]) u32 tables —
    tiny eager device ops computed outside the Mosaic program."""
    b_flat = betas.reshape(-1)
    g_flat = gammas.reshape(-1)
    a_flat = alphas.reshape(-1)
    sc = jnp.concatenate([_split_tbl(b_flat), _split_tbl(g_flat)], axis=-1)
    bk = _split_tbl(gl.mul(b_flat[:, None], jnp.asarray(k_is)[None, :]))
    rows = [jnp.ones_like(a_flat)]
    for _ in range(nch):
        rows.append(gl.mul(rows[-1], a_flat))
    tbl = _split_tbl(jnp.stack(rows, axis=1))
    return sc, bk, tbl


def perm_quotient_pallas_batched(wires_lde, zs_lde, pps_lde, betas, gammas,
                                 alphas, sigma_lde, xs, l0, k_is,
                                 blowup: int, interpret: bool = False):
    """Batched drop-in for ``vmap(perm_quotient_part)``: returns
    (acc [K, C, L], apows [K, C]), bit-identical to the jnp path.
    ``wires_lde`` may carry all W wires; only the routed R = sigma rows
    are read.  ``k_is``: the [R] coset-shift constants of the circuit."""
    from .pallas_aot import aot_kernel

    R = sigma_lde.shape[0]
    nch = (R + CHUNK - 1) // CHUNK
    zs_shift = jnp.roll(zs_lde, -blowup, axis=-1)
    sc, bk, tbl = _scalar_tables(betas, gammas, alphas, k_is, nch)
    fn = aot_kernel(
        "perm_quotient_pallas",
        lambda: partial(_stage_batched, interpret=interpret),
        (interpret,),
    )
    acc = fn(
        wires_lde[:, :R], zs_lde, zs_shift, pps_lde, sc, bk, tbl,
        sigma_lde, xs, l0,
    )
    return acc, gl.pow_const(alphas, nch + 1)


def perm_quotient_pallas(wires_lde, zs_lde, pps_lde, betas, gammas, alphas,
                         sigma_lde, xs, l0, k_is, blowup: int,
                         interpret: bool = False):
    """Single-proof drop-in for ``perm_quotient_part``."""
    acc, apows = perm_quotient_pallas_batched(
        wires_lde[None], zs_lde[None], pps_lde[None], betas[None],
        gammas[None], alphas[None], sigma_lde, xs, l0, k_is, blowup,
        interpret,
    )
    return acc[0], apows[0]


def perm_quotient_jnp_limb(wires_lde, zs_lde, pps_lde, betas, gammas, alphas,
                           sigma_lde, xs, l0, k_is, blowup: int):
    """Eager limb-plane path sharing ``_tile_compute`` — the CPU test
    oracle for the kernel math (XLA:CPU cannot compile the deep chains)."""
    R, L = sigma_lde.shape
    C = betas.shape[0]
    nch = (R + CHUNK - 1) // CHUNK
    L8 = L // 8
    wlo, whi = _split(wires_lde[:R].reshape(R * 8, L8))
    siglo, sighi = _split(sigma_lde.reshape(R * 8, L8))
    xlo, xhi = _split(xs.reshape(8, L8))
    l0lo, l0hi = _split(l0.reshape(8, L8))
    zs_shift = jnp.roll(zs_lde, -blowup, axis=-1)
    out = []
    for c in range(C):
        zlo, zhi = _split(zs_lde[c].reshape(8, L8))
        zslo, zshi = _split(zs_shift[c].reshape(8, L8))
        if nch > 1:
            pplo, pphi = _split(pps_lde[c].reshape((nch - 1) * 8, L8))
        else:
            pplo = pphi = jnp.zeros((8, L8), u32)
        sc_v = _split_tbl(jnp.stack([betas[c], gammas[c]]))
        bk_v = _split_tbl(gl.mul(betas[c], jnp.asarray(k_is)))
        rows = [jnp.ones((), jnp.uint64)]
        for _ in range(nch):
            rows.append(gl.mul(rows[-1], alphas[c]))
        tbl_v = _split_tbl(jnp.stack(rows))
        acc_lo, acc_hi = _tile_compute(
            R, nch, wlo, whi, siglo, sighi, xlo, xhi, l0lo, l0hi,
            zlo, zhi, zslo, zshi, pplo, pphi,
            (sc_v[0, 0], sc_v[0, 1], sc_v[1, 0], sc_v[1, 1]),
            lambda i: (bk_v[i, 0], bk_v[i, 1]),
            lambda k: (tbl_v[k, 0], tbl_v[k, 1]),
        )
        out.append(_fuse(acc_lo, acc_hi).reshape(L))
    return jnp.stack(out), gl.pow_const(alphas, nch + 1)
