"""Pallas TPU kernel for the permutation-argument columns.

``engine/prover.py::perm_columns_impl`` computes, per challenge, the
running-product column Z and the chunk partial products of the Plonk
permutation argument.  The XLA-emulated u64 graph for it compiles to a
~91 MB executable (264 MB for the batched variant) whose per-process
device load through a remote backend dominates "warm" proving
(docs/perf_notes.md round 3).  This kernel evaluates the elementwise-heavy
part — the (wire + beta*id + gamma) factor products, chunk prefix/suffix
products and the single Fermat inversion — entirely in VMEM on (lo, hi)
uint32 limb planes (``ops/limb64.py``), leaving only the log-depth
cumulative product over the row axis (a cross-tile dependency) and two
small elementwise muls to XLA.

Math identical to the jnp path (canonical values at every boundary), so
outputs are bit-identical — asserted by tests/test_perm_columns_pallas.py
against an exact host-integer oracle.  Following
``ops/gate_quotient_pallas``, the tile computation is factored into a
pure-jnp function (``_tile_compute``) shared by the Pallas kernel body
and an EAGER test path (``perm_columns_jnp_limb``) — XLA:CPU cannot
compile the deep sequential Fermat chain in reasonable time, so CPU
correctness runs eagerly and the Mosaic path compiles only on TPU.

Layout: the row axis n is viewed as [8, n/8] so every value is a full
8-sublane tile; wire/id/sigma tables ride in as [R*8, n/8] with wire i at
row block 8i..8i+8.  Grid is (K*C, n-tiles) — proof batch x challenge —
with per-(proof, challenge) (beta, gamma) scalars in SMEM blocks indexed
by the leading grid axis, so the batched prover reuses the SAME kernel
with a bigger grid instead of a separately-compiled vmap variant.

Reference scope: plonky2's ``all_wires_permutation_partial_products``
during ``CircuitData::prove`` (SURVEY §2.1 prover row).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from . import goldilocks as gl
from . import limb64 as limb

u32 = jnp.uint32

# chunk width (7 routed wires per partial product keeps constraint degree 8)
CHUNK = 7


def _split(x):
    return (x & jnp.uint64(0xFFFFFFFF)).astype(u32), (x >> jnp.uint64(32)).astype(u32)


def _fuse(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _tile_compute(R: int, nch: int, wlo, whi, idlo, idhi, siglo, sighi,
                  beta_lo, beta_hi, gamma_lo, gamma_hi):
    """One challenge, one [R*8, T] tile of u32 limb planes -> (f_pref
    [nch*8, T] x2, g_pref_inv [max(nch-1,1)*8, T] x2, row_quot [8, T] x2).
    Pure jnp on u32 planes: runs inside the Mosaic kernel body and (for
    tests) eagerly on CPU."""

    def factor(vlo, vhi, tlo, thi):
        # v + beta*t + gamma  (all canonical)
        plo, phi = limb.mul_mod(tlo, thi, beta_lo, beta_hi)
        slo, shi = limb.add_canon(vlo, vhi, plo, phi)
        return limb.add_canon(slo, shi, gamma_lo, gamma_hi)

    f_ch = []
    g_ch = []
    for j in range(nch):
        f = None
        g = None
        for i in range(j * CHUNK, min((j + 1) * CHUNK, R)):
            wl = wlo[8 * i : 8 * i + 8, :]
            wh = whi[8 * i : 8 * i + 8, :]
            fi = factor(wl, wh, idlo[8 * i : 8 * i + 8, :],
                        idhi[8 * i : 8 * i + 8, :])
            gi = factor(wl, wh, siglo[8 * i : 8 * i + 8, :],
                        sighi[8 * i : 8 * i + 8, :])
            f = fi if f is None else limb.mul_mod(f[0], f[1], *fi)
            g = gi if g is None else limb.mul_mod(g[0], g[1], *gi)
        assert f is not None, "empty chunk (nch inconsistent with R)"
        f_ch.append(f)
        g_ch.append(g)

    f_pref = [f_ch[0]]
    for j in range(1, nch):
        f_pref.append(limb.mul_mod(*f_pref[-1], *f_ch[j]))
    g_suff = [g_ch[nch - 1]]
    for j in range(nch - 2, -1, -1):
        g_suff.append(limb.mul_mod(*g_suff[-1], *g_ch[j]))
    g_suff.reverse()

    g_total_inv = limb.inv(*g_suff[0])
    rq_lo, rq_hi = limb.mul_mod(*f_pref[-1], *g_total_inv)

    fp_lo = jnp.concatenate([p[0] for p in f_pref], axis=0)
    fp_hi = jnp.concatenate([p[1] for p in f_pref], axis=0)
    if nch > 1:
        gpi = [limb.mul_mod(*g_suff[j + 1], *g_total_inv) for j in range(nch - 1)]
        gpi_lo = jnp.concatenate([p[0] for p in gpi], axis=0)
        gpi_hi = jnp.concatenate([p[1] for p in gpi], axis=0)
    else:
        # [8, T] placeholder keeps the output tree static
        gpi_lo = jnp.zeros_like(rq_lo)
        gpi_hi = jnp.zeros_like(rq_hi)
    return fp_lo, fp_hi, gpi_lo, gpi_hi, rq_lo, rq_hi


def _make_kernel(R: int, nch: int):
    def kernel(wlo_ref, whi_ref, idlo_ref, idhi_ref, siglo_ref, sighi_ref,
               bg_ref, fp_lo_ref, fp_hi_ref, gpi_lo_ref, gpi_hi_ref,
               rq_lo_ref, rq_hi_ref):
        from jax.experimental import pallas as pl

        # the SMEM scalar table rides in whole (Mosaic requires full
        # blocks in SMEM); the grid is (K, C, tiles) so the row indexes
        # directly off the program ids — index maps and body do NO
        # arithmetic on traced ids (a `kc // C` index map recursed
        # forever in the x64 rewriter's dtype promotion)
        k = pl.program_id(0)
        c = pl.program_id(1)
        fp_lo, fp_hi, gpi_lo, gpi_hi, rq_lo, rq_hi = _tile_compute(
            R, nch, wlo_ref[0], whi_ref[0], idlo_ref[:], idhi_ref[:],
            siglo_ref[:], sighi_ref[:],
            bg_ref[k, c, 0], bg_ref[k, c, 1], bg_ref[k, c, 2], bg_ref[k, c, 3],
        )
        fp_lo_ref[0, 0] = fp_lo
        fp_hi_ref[0, 0] = fp_hi
        gpi_lo_ref[0, 0] = gpi_lo
        gpi_hi_ref[0, 0] = gpi_hi
        rq_lo_ref[0, 0] = rq_lo
        rq_hi_ref[0, 0] = rq_hi

    return kernel


def _bg_table(betas, gammas):
    """[..., 4] u32 SMEM table: beta_lo, beta_hi, gamma_lo, gamma_hi."""
    return jnp.stack(
        [
            (betas & jnp.uint64(0xFFFFFFFF)).astype(u32),
            (betas >> jnp.uint64(32)).astype(u32),
            (gammas & jnp.uint64(0xFFFFFFFF)).astype(u32),
            (gammas >> jnp.uint64(32)).astype(u32),
        ],
        axis=-1,
    )


def _stage1_batched(wires, betas, gammas, id_vals, sigma, interpret: bool):
    """Pallas stage over wires [K, R, n] and challenges [K, C]:
    (f_pref [K, C, nch, n], g_pref_inv [K, C, nch-1, n], row_quot
    [K, C, n]).  Grid is (K*C, n-tiles); the shared id/sigma tables are
    broadcast across the leading grid axis."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, R, n = wires.shape
    C = betas.shape[-1]
    nch = (R + CHUNK - 1) // CHUNK
    assert n % 8 == 0, n
    n8 = n // 8
    # Lane-tile width: each unrolled op in the (huge) kernel body works
    # on a [8, TX] tile, so TX sets how much per-op issue overhead is
    # amortized; the stage's arithmetic is tiny (~2 ms at block shapes)
    # while the measured kernel time is seconds — issue-bound
    # (docs/perf_notes.md round 5).  Env-overridable for A/B.
    TX = min(int(os.environ.get("INTMAX_TPU_PERM_TX", "256")), n8)
    assert n8 % TX == 0, (n8, TX)

    wlo, whi = _split(wires.reshape(K, R * 8, n8))
    idlo, idhi = _split(id_vals.reshape(R * 8, n8))
    siglo, sighi = _split(sigma.reshape(R * 8, n8))
    bg = _bg_table(betas, gammas)  # [K, C, 4]

    kernel = _make_kernel(R, nch)
    w_spec = pl.BlockSpec(
        (1, R * 8, TX), lambda k, c, i: (k, jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    tbl_spec = pl.BlockSpec(
        (R * 8, TX), lambda k, c, i: (jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    bg_spec = pl.BlockSpec(
        (K, C, 4), lambda k, c, i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)), memory_space=pltpu.SMEM
    )
    out_spec = lambda rows: pl.BlockSpec(
        (1, 1, rows, TX), lambda k, c, i: (k, c, jnp.int32(0), i),
        memory_space=pltpu.VMEM,
    )
    out_shape = lambda rows: jax.ShapeDtypeStruct((K, C, rows, n8), u32)
    gpi_rows = max(nch - 1, 1) * 8
    fp_lo, fp_hi, gpi_lo, gpi_hi, rq_lo, rq_hi = pl.pallas_call(
        kernel,
        grid=(K, C, n8 // TX),
        in_specs=[w_spec, w_spec, tbl_spec, tbl_spec, tbl_spec, tbl_spec, bg_spec],
        out_specs=[
            out_spec(nch * 8), out_spec(nch * 8),
            out_spec(gpi_rows), out_spec(gpi_rows),
            out_spec(8), out_spec(8),
        ],
        out_shape=[
            out_shape(nch * 8), out_shape(nch * 8),
            out_shape(gpi_rows), out_shape(gpi_rows),
            out_shape(8), out_shape(8),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(wlo, whi, idlo, idhi, siglo, sighi, bg)

    f_pref = _fuse(fp_lo, fp_hi).reshape(K, C, nch, n)
    g_pref_inv = _fuse(gpi_lo, gpi_hi).reshape(K, C, -1, n)[:, :, : nch - 1]
    row_quot = _fuse(rq_lo, rq_hi).reshape(K, C, n)
    return f_pref, g_pref_inv, row_quot


def _finish(f_pref, g_pref_inv, row_quot, nch: int):
    """XLA tail shared by every path: cumulative product over the row
    axis (cross-tile), Z assembly and the pp combination.  Exact modular
    ops in the same order as ``perm_columns_impl`` -> bit-identical."""
    K, C, n = row_quot.shape
    flat = row_quot.reshape(K * C, n)
    cum = jax.vmap(lambda r: jax.lax.associative_scan(gl.mul, r))(flat)
    cum = cum.reshape(K, C, n)
    z = jnp.concatenate(
        [jnp.ones((K, C, 1), jnp.uint64), cum[:, :, :-1]], axis=-1
    )
    if nch > 1:
        pp = gl.mul(z[:, :, None, :], gl.mul(f_pref[:, :, :-1], g_pref_inv))
    else:
        pp = jnp.zeros((K, C, 0, n), jnp.uint64)
    return z, pp, cum[:, :, -1]


def _perm_columns_batched_impl(wires, betas, gammas, id_vals, sigma,
                               interpret: bool):
    nch = (wires.shape[1] + CHUNK - 1) // CHUNK
    f_pref, g_pref_inv, row_quot = _stage1_batched(
        wires, betas, gammas, id_vals, sigma, interpret
    )
    return _finish(f_pref, g_pref_inv, row_quot, nch)


# kept under the old name for tests/drives that trace it directly
_perm_columns_batched_jit = partial(jax.jit, static_argnums=(5,))(
    _perm_columns_batched_impl
)


def perm_columns_pallas_batched(wires, betas, gammas, id_vals, sigma,
                                interpret: bool = False):
    """Batched drop-in for ``vmap(perm_columns_impl)``: wires [K, R, n],
    challenges [K, C] -> (z [K, C, n], pp [K, C, nch-1, n], wrap [K, C]),
    bit-identical to the jnp path.  Runs through the disk-backed
    executable cache: a pallas_call's lowering is not byte-stable across
    processes, so the HLO-keyed compile cache misses every process and
    triggers a remote recompile (ops/pallas_aot.py)."""
    from .pallas_aot import aot_kernel

    fn = aot_kernel(
        "perm_columns_pallas",
        lambda: partial(_perm_columns_batched_impl, interpret=interpret),
        # TX and the vmem-limit param shape the traced graph (v2); the
        # effective tile is min(TX, n8) but shapes already ride the key
        (interpret, "tx", os.environ.get("INTMAX_TPU_PERM_TX", "256"), "v2"),
    )
    return fn(wires, betas, gammas, id_vals, sigma)


def perm_columns_pallas(wires, betas, gammas, id_vals, sigma,
                        interpret: bool = False):
    """Single-proof drop-in for ``perm_columns_impl``: wires [R, n],
    challenges [C] -> (z [C, n], pp [C, nch-1, n], wrap [C])."""
    z, pp, wrap = perm_columns_pallas_batched(
        wires[None], betas[None], gammas[None], id_vals, sigma, interpret
    )
    return z[0], pp[0], wrap[0]


def perm_columns_jnp_limb(wires, betas, gammas, id_vals, sigma):
    """The same limb-plane tile computation run as plain (eager) jnp —
    the CPU test oracle for the kernel math (compiling the deep Fermat
    chain through XLA:CPU takes unbounded time; eager dispatch at test
    sizes is seconds)."""
    R, n = wires.shape
    C = betas.shape[0]
    nch = (R + CHUNK - 1) // CHUNK
    n8 = n // 8
    wlo, whi = _split(wires.reshape(R * 8, n8))
    idlo, idhi = _split(id_vals.reshape(R * 8, n8))
    siglo, sighi = _split(sigma.reshape(R * 8, n8))
    bg = _bg_table(betas, gammas)
    fps, gpis, rqs = [], [], []
    for c in range(C):
        fp_lo, fp_hi, gpi_lo, gpi_hi, rq_lo, rq_hi = _tile_compute(
            R, nch, wlo, whi, idlo, idhi, siglo, sighi,
            bg[c, 0], bg[c, 1], bg[c, 2], bg[c, 3],
        )
        fps.append(_fuse(fp_lo, fp_hi).reshape(nch, n))
        gpis.append(_fuse(gpi_lo, gpi_hi).reshape(-1, n)[: nch - 1])
        rqs.append(_fuse(rq_lo, rq_hi).reshape(n))
    z, pp, wrap = _finish(
        jnp.stack(fps)[None], jnp.stack(gpis)[None], jnp.stack(rqs)[None], nch
    )
    return z[0], pp[0], wrap[0]
