"""Pallas TPU kernel for the Poseidon-gate quotient contribution.

The prover's quotient phase alpha-combines the selector-filtered gate
constraints over the LDE coset (``engine/prover.py::_gate_quotient_chunk``).
For the Poseidon gate — 123 constraints whose evaluation is essentially a
full width-12 permutation re-derived symbolically per LDE point — the
XLA-emulated u64 path runs far from the chip's issue bound: the
constraint graph (~9k u64 muls over [lde_n] columns) is memory-bound on
materialized intermediates.  This kernel evaluates the whole gate inside
VMEM on (lo, hi) uint32 limb planes (``ops/limb64.py``), one output
write per tile, exactly like the Poseidon permutation kernel that runs
at ~47% of the VPU issue bound (docs/perf_notes.md).

Single source of truth: the constraints are NOT re-implemented here —
``PoseidonGate.eval_constraints`` runs inside the kernel body against
``LimbAlgebra`` (the same algebra-shim interface the batched-jnp prover
path and the scalar verifier use), so any gate change propagates to all
three consumers and bit-exactness is structural.

Alpha-combination: the jnp path folds ``acc[c] += apow * sel * t_k,
apow *= alpha`` per constraint.  Field ops are exact, so this equals
``acc[c] += sel * sum_k table[c, k] * t_k`` with
``table[c, k] = apows_in[c] * alphas[c]^k`` — the table is computed
outside the kernel (123 tiny [C] muls) and passed in, saving the apow
chain per point.  Outputs are bit-identical to the jnp path
(tests/test_gate_quotient_pallas.py).

Layout: the LDE axis L is viewed as [8, L/8] so every value is a full
8-sublane tile (a [1, T] row would waste 7/8 of each VPU issue);
wires ride in as [W*8, L/8] with wire w at row block 8w..8w+8.

Reference scope: plonky2's ``eval_vanishing_poly_base_batch`` gate
evaluation during ``CircuitData::prove`` (SURVEY.md §2.1 prover row).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import goldilocks as gl
from . import limb64 as limb

P = gl.P_INT
u32 = jnp.uint32


def _pair_of_const(c: int, like_lo):
    c = c % P
    return (
        jnp.full_like(like_lo, u32(c & 0xFFFFFFFF)),
        jnp.full_like(like_lo, u32(c >> 32)),
    )


class LimbAlgebra:
    """Algebra shim over (lo, hi) uint32 limb-plane pairs, usable inside
    Pallas kernel bodies.  Python ints stand in for constants until they
    meet an array operand (so ``const(0)`` costs nothing)."""

    def const(self, c: int):
        return c % P

    def _coerce(self, v, like_lo):
        if isinstance(v, int):
            return _pair_of_const(v, like_lo)
        return v

    def add(self, a, b):
        if isinstance(a, int) and isinstance(b, int):
            return (a + b) % P
        if isinstance(a, int):
            a = self._coerce(a, b[0])
        else:
            b = self._coerce(b, a[0])
        return limb.add_canon(a[0], a[1], b[0], b[1])

    def sub(self, a, b):
        if isinstance(a, int) and isinstance(b, int):
            return (a - b) % P
        if isinstance(a, int):
            a = self._coerce(a, b[0])
        else:
            b = self._coerce(b, a[0])
        return limb.sub_canon(a[0], a[1], b[0], b[1])

    def mul(self, a, b):
        if isinstance(a, int) and isinstance(b, int):
            return (a * b) % P
        if isinstance(a, int):
            a, b = b, a
        if isinstance(b, int):
            return self.mul_const(a, b)
        return limb.mul_mod(a[0], a[1], b[0], b[1])

    def add_const(self, a, c: int):
        if isinstance(a, int):
            return (a + c) % P
        return self.add(a, c % P)

    def mul_const(self, a, c: int):
        c = c % P
        if isinstance(a, int):
            return (a * c) % P
        if c == 0:
            return 0
        if c == 1:
            return a
        alo, ahi = a
        if c < (1 << 32):
            cb = jnp.full_like(alo, u32(c))
            p0lo, p0hi = limb.mul32x32(alo, cb)
            p1lo, p1hi = limb.mul32x32(ahi, cb)
            n1 = p0hi + p1lo
            c1 = (n1 < p0hi).astype(u32)
            n2 = p1hi + c1
            return limb.reduce128(p0lo, n1, n2, jnp.zeros_like(n2))
        clo, chi = _pair_of_const(c, alo)
        return limb.mul_mod(alo, ahi, clo, chi)

    def exp7(self, a):
        if isinstance(a, int):
            return pow(a, 7, P)
        return limb.sbox7(a[0], a[1])


def _tile_compute(gate, n_cs: int, C: int, wlo, whi, sel_lo, sel_hi,
                  tbl_lo, tbl_hi, acc_lo, acc_hi):
    """Pure-jnp tile computation shared by the Pallas kernel body and the
    plain-jit test path: evaluate the gate's constraints on an
    [W*8, T]-blocked point tile and fold the sel-filtered alpha
    combination into acc [C*8, T].  Returns (out_lo, out_hi).
    ``tbl_lo``/``tbl_hi`` may be 2-D indexables (SMEM refs / arrays) or
    callables ``(c, k) -> scalar`` (the batched kernel's extra leading
    block axis)."""
    alg = LimbAlgebra()
    num_wires = wlo.shape[0] // 8
    wires = [
        (wlo[8 * w : 8 * w + 8, :], whi[8 * w : 8 * w + 8, :])
        for w in range(num_wires)
    ]
    cs = gate.eval_constraints(alg, wires, [], None)
    assert len(cs) == n_cs
    t_lo = tbl_lo if callable(tbl_lo) else lambda c, k: tbl_lo[c, k]
    t_hi = tbl_hi if callable(tbl_hi) else lambda c, k: tbl_hi[c, k]
    out_lo = []
    out_hi = []
    for c in range(C):
        comb = None
        for k, t in enumerate(cs):
            # scalar loads (tables ride in SMEM in the Pallas kernel) —
            # Mosaic cannot lower a (1,1)->(8,T) vector broadcast, but
            # vector-times-scalar is native
            w_lo = t_lo(c, k)
            w_hi = t_hi(c, k)
            term = limb.mul_mod(t[0], t[1], w_lo, w_hi)
            comb = term if comb is None else limb.add_canon(*comb, *term)
        flo, fhi = limb.mul_mod(comb[0], comb[1], sel_lo, sel_hi)
        alo = acc_lo[8 * c : 8 * c + 8, :]
        ahi = acc_hi[8 * c : 8 * c + 8, :]
        olo, ohi = limb.add_canon(alo, ahi, flo, fhi)
        out_lo.append(olo)
        out_hi.append(ohi)
    return jnp.concatenate(out_lo, axis=0), jnp.concatenate(out_hi, axis=0)


def _make_kernel(gate, num_wires: int, n_cs: int, C: int):
    """Pallas kernel body wrapping ``_tile_compute``."""

    def kernel(wlo_ref, whi_ref, sel_lo_ref, sel_hi_ref,
               tbl_lo_ref, tbl_hi_ref, acc_lo_ref, acc_hi_ref,
               out_lo_ref, out_hi_ref):
        # table refs ride through UNLOADED: they live in SMEM, which only
        # supports scalar loads — _tile_compute indexes tbl[c, k]
        out_lo, out_hi = _tile_compute(
            gate, n_cs, C, wlo_ref[:], whi_ref[:], sel_lo_ref[:], sel_hi_ref[:],
            tbl_lo_ref, tbl_hi_ref, acc_lo_ref[:], acc_hi_ref[:],
        )
        out_lo_ref[:] = out_lo
        out_hi_ref[:] = out_hi

    return kernel


def _split(x):
    return (x & jnp.uint64(0xFFFFFFFF)).astype(u32), (x >> jnp.uint64(32)).astype(u32)


def _fuse(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _combine_table(alphas, apows, n_cs: int):
    """table[c, k] = apows[c] * alphas[c]^k and the outgoing apows."""
    rows = [apows]
    for _ in range(n_cs - 1):
        rows.append(gl.mul(rows[-1], alphas))
    return jnp.stack(rows, axis=1), gl.mul(rows[-1], alphas)


def poseidon_gate_quotient_jnp_limb(wires_lde, sel_col, alphas, acc, apows,
                                    C: int):
    """The same limb-plane tile computation as the Pallas kernel, run as a
    plain (eager) jnp graph — the test oracle for the kernel math.  Left
    unjitted on purpose: XLA compile of the ~100k-op limb graph takes
    minutes on CPU, while eager dispatch at test sizes is seconds."""
    from ..engine.gates import GATE_TYPES

    gate = GATE_TYPES["poseidon"]
    n_cs = gate.num_constraints
    W, L = wires_lde.shape
    assert L % 8 == 0, L
    L8 = L // 8
    table, out_apows = _combine_table(alphas, apows, n_cs)
    wlo, whi = _split(wires_lde.reshape(W * 8, L8))
    slo, shi = _split(sel_col.reshape(8, L8))
    tlo, thi = _split(table)
    alo, ahi = _split(acc.reshape(C * 8, L8))
    out_lo, out_hi = _tile_compute(gate, n_cs, C, wlo, whi, slo, shi,
                                   tlo, thi, alo, ahi)
    return _fuse(out_lo, out_hi).reshape(C, L), out_apows


def poseidon_gate_quotient_pallas(wires_lde, sel_col, alphas, acc, apows,
                                  C: int, interpret: bool = False):
    """Drop-in for the jnp poseidon ``_gate_quotient_chunk`` run function
    (full constraint range): returns (acc', apows'), bit-identical.
    Disk-backed executable cache (ops/pallas_aot.py).

    wires_lde [W, L] u64; sel_col [L]; alphas [C]; acc [C, L]; apows [C].
    L must be a multiple of 64 (8 sublanes x 8-lane minimum tile).
    """
    from .pallas_aot import aot_kernel

    fn = aot_kernel(
        "gate_quotient_pallas",
        lambda: partial(_gate_quotient_impl, C=C, interpret=interpret),
        (C, interpret),
    )
    return fn(wires_lde, sel_col, alphas, acc, apows)


def _gate_quotient_impl(wires_lde, sel_col, alphas, acc, apows,
                        C: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..engine.gates import GATE_TYPES

    gate = GATE_TYPES["poseidon"]
    n_cs = gate.num_constraints
    W, L = wires_lde.shape
    assert L % 64 == 0, L
    L8 = L // 8
    # [135*8, TX] u32 x 2 planes x 2 (pipeline double-buffer) + live
    # intermediates must fit ~16 MB VMEM: TX=256 ~ 6 MB
    TX = min(256, L8)
    assert L8 % TX == 0, (L8, TX)

    # table[c, k] = apows[c] * alphas[c]^k  (exact field ops — the fold
    # order change vs the jnp path is associativity, not rounding)
    table, out_apows = _combine_table(alphas, apows, n_cs)

    wlo, whi = _split(wires_lde.reshape(W * 8, L8))
    slo, shi = _split(sel_col.reshape(8, L8))
    tlo, thi = _split(table)
    alo, ahi = _split(acc.reshape(C * 8, L8))

    kernel = _make_kernel(gate, W, n_cs, C)
    col_spec = lambda rows_: pl.BlockSpec(
        (rows_, TX), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    # combine tables are scalar-indexed inside the kernel -> SMEM
    const_spec = pl.BlockSpec(
        (C, n_cs), lambda i: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.SMEM
    )
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(L8 // TX,),
        in_specs=[
            col_spec(W * 8), col_spec(W * 8),
            col_spec(8), col_spec(8),
            const_spec, const_spec,
            col_spec(C * 8), col_spec(C * 8),
        ],
        out_specs=[col_spec(C * 8), col_spec(C * 8)],
        out_shape=[
            jax.ShapeDtypeStruct((C * 8, L8), u32),
            jax.ShapeDtypeStruct((C * 8, L8), u32),
        ],
        interpret=interpret,
    )(wlo, whi, slo, shi, tlo, thi, alo, ahi)
    return _fuse(out_lo, out_hi).reshape(C, L), out_apows


def _make_batched_kernel(gate, n_cs: int, C: int):
    """Kernel over (proof k, L-tile) grid blocks: wires/acc carry a
    leading block axis of 1; the alpha table rides in SMEM per proof."""

    def kernel(wlo_ref, whi_ref, sel_lo_ref, sel_hi_ref,
               tbl_lo_ref, tbl_hi_ref, acc_lo_ref, acc_hi_ref,
               out_lo_ref, out_hi_ref):
        from jax.experimental import pallas as pl

        # SMEM tables ride in whole (Mosaic requires full SMEM blocks);
        # index the proof row dynamically
        kk = pl.program_id(0)
        out_lo, out_hi = _tile_compute(
            gate, n_cs, C, wlo_ref[0], whi_ref[0], sel_lo_ref[:],
            sel_hi_ref[:],
            lambda c, k: tbl_lo_ref[kk, c, k],
            lambda c, k: tbl_hi_ref[kk, c, k],
            acc_lo_ref[0], acc_hi_ref[0],
        )
        out_lo_ref[0] = out_lo
        out_hi_ref[0] = out_hi

    return kernel


def poseidon_gate_quotient_pallas_batched(wires_lde, sel_col, alphas, acc,
                                          apows, C: int,
                                          interpret: bool = False):
    """Batched drop-in for ``vmap`` of the poseidon gate-chunk run
    function: wires_lde [K, W, L], sel_col [L] (shared), alphas/apows
    [K, C], acc [K, C, L] -> (acc' [K, C, L], apows' [K, C]),
    bit-identical to the jnp path.  The proof axis folds into the Mosaic
    grid, so the batched prover loads ONE small program instead of the
    330-476 MB per-K vmap executables.  Disk-backed executable cache
    (ops/pallas_aot.py)."""
    from .pallas_aot import aot_kernel

    fn = aot_kernel(
        "gate_quotient_pallas_batched",
        lambda: partial(_gate_quotient_batched_impl, C=C,
                        interpret=interpret),
        (C, interpret),
    )
    return fn(wires_lde, sel_col, alphas, acc, apows)


def _gate_quotient_batched_impl(wires_lde, sel_col, alphas, acc,
                                apows, C: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..engine.gates import GATE_TYPES

    gate = GATE_TYPES["poseidon"]
    n_cs = gate.num_constraints
    K, W, L = wires_lde.shape
    assert L % 64 == 0, L
    L8 = L // 8
    TX = min(256, L8)
    assert L8 % TX == 0, (L8, TX)

    table, out_apows = _combine_table(
        alphas.reshape(K * C), apows.reshape(K * C), n_cs
    )
    wlo, whi = _split(wires_lde.reshape(K, W * 8, L8))
    slo, shi = _split(sel_col.reshape(8, L8))
    tlo, thi = _split(table.reshape(K, C, n_cs))
    alo, ahi = _split(acc.reshape(K, C * 8, L8))

    kernel = _make_batched_kernel(gate, n_cs, C)
    per_k = lambda rows_: pl.BlockSpec(
        (1, rows_, TX), lambda k, i: (k, jnp.int32(0), i),
        memory_space=pltpu.VMEM,
    )
    shared_spec = pl.BlockSpec(
        (8, TX), lambda k, i: (jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    tbl_spec = pl.BlockSpec(
        (K, C, n_cs),
        lambda k, i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.SMEM,
    )
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(K, L8 // TX),
        in_specs=[
            per_k(W * 8), per_k(W * 8),
            shared_spec, shared_spec,
            tbl_spec, tbl_spec,
            per_k(C * 8), per_k(C * 8),
        ],
        out_specs=[per_k(C * 8), per_k(C * 8)],
        out_shape=[
            jax.ShapeDtypeStruct((K, C * 8, L8), u32),
            jax.ShapeDtypeStruct((K, C * 8, L8), u32),
        ],
        interpret=interpret,
    )(wlo, whi, slo, shi, tlo, thi, alo, ahi)
    return (
        _fuse(out_lo, out_hi).reshape(K, C, L),
        out_apows.reshape(K, C),
    )
