"""Pallas TPU kernel NTT: four-step decomposition with VMEM-resident
pass-fused local transforms on (lo, hi) uint32 limb planes.

The XLA Stockham kernel (``ops/ntt.py``) reaches 444 ntt/s at 2^20 on
v5e — 50% of a design floor that itself assumes the x64 rewriter's
emulated ``gl.mul`` (~10% of the u32 issue bound); the gap is inter-pass
fusion breaks and relayout churn (docs/perf_notes.md round 3).  This
kernel removes both: the transform runs as two Mosaic programs
(n = n1 x n2):

  1. column NTTs of size n1 over the SUBLANE axis of [n1, TL] tiles —
     all log(n1) Stockham passes fused in VMEM — then the four-step
     twiddle w^(i1_out * i2);
  2. an XLA transpose (the only HBM relayout, tiled, fast);
  3. row NTTs of size n2, same kernel structure; the output layout
     [k2, k1] flattens row-major to exactly the natural order
     k = k2*n1 + k1 — no bit-reversal or final permutation anywhere.

Per-pass twiddles of the local transforms depend only on the sublane
index, so they ride in as constant [S, TL] blocks (one tile's worth,
index map pinned to 0 — resident in VMEM, not streamed).  All
arithmetic is the canonical limb-plane schedule of ``ops/limb64.py``;
outputs are bit-identical to ``ops/ntt.ntt`` (exact mod-p arithmetic is
order-independent; asserted by tests/test_ntt_pallas.py and the chip
drives).

Reference scope: plonky2's ``fft_root_table``/``fft_classic`` under
``CircuitData::prove`` (SURVEY §2.1 prover row).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from . import goldilocks as gl
from . import limb64 as limb

u32 = jnp.uint32
P = gl.P_INT

# Bumped whenever the traced graph of any kernel here changes: every AOT
# cache key whose graph embeds this kernel must include it (the AOT key
# does not hash the jaxpr).  v2 = four-step twiddle applied by fused XLA
# between the stages (with n^-1 folded into the inverse table) +
# adaptive lane-tile width.
NTT_GRAPH_VERSION = 2

# minimum lane tile of the local-NTT kernels
TL = 128


def _tile_lanes(S: int, M: int) -> int:
    """Lane-tile width for a [S, M] local stage: wider tiles mean fewer
    grid steps and better VPU pipelining (measured 2^20: TL 128 -> 1024
    took 611 -> 907 ntt/s), bounded so the block + resident pass tables
    stay comfortably inside VMEM (~(S*TL) * 4 B * 2 planes * (passes+2))."""
    return max(TL, min(M, 1024, (1 << 20) // S))


def _split(x):
    return (x & jnp.uint64(0xFFFFFFFF)).astype(u32), (x >> jnp.uint64(32)).astype(u32)


def _fuse(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


@lru_cache(maxsize=32)
def _local_pass_plan(log_s: int, inverse: bool):
    """Stockham pass plan for a size-2^log_s local transform: list of
    (r_log, A, B, twiddle_vec | None) with twiddle_vec a [S] numpy u64
    vector over the post-DFT [A, r, B] sublane layout (None for the
    final pass, which has no twiddle)."""
    S = 1 << log_s
    plan = []
    A = 1
    rem = log_s
    while rem > 0:
        r_log = 1 if rem % 2 else 2
        r = 1 << r_log
        B = (1 << rem) // r
        if rem > r_log:
            w = gl.primitive_root_of_unity(rem)
            if inverse:
                w = pow(w, P - 2, P)
            tw = np.empty((r, B), dtype=np.uint64)
            for j in range(r):
                base = pow(w, j, P)
                acc = 1
                for b in range(B):
                    tw[j, b] = acc
                    acc = acc * base % P
            # post-rearrangement [r, A, B] sublane layout: factor f[j, b]
            # replicated over a
            vec = np.repeat(tw[:, None, :], A, axis=1).reshape(r * A * B)
        else:
            vec = None
        plan.append((r_log, A, B, vec))
        A *= r
        rem -= r_log
    return plan


@lru_cache(maxsize=32)
def _w4_scalar(inverse: bool) -> int:
    w = gl.primitive_root_of_unity(2)
    return pow(w, P - 2, P) if inverse else w


def _const_planes(c: int, like):
    return (jnp.full_like(like, u32(c & 0xFFFFFFFF)),
            jnp.full_like(like, u32(c >> 32)))


def _local_ntt(lo, hi, tw_refs, log_s: int, inverse: bool):
    """In-kernel size-2^log_s NTT over the sublane axis of [S, TL] limb
    planes.  ``tw_refs``: per-twiddled-pass (lo, hi) [S, TL] refs."""
    S = 1 << log_s
    plan = _local_pass_plan(log_s, inverse)
    w4 = _w4_scalar(inverse)
    ti = 0
    for r_log, A, B, vec in plan:
        r = 1 << r_log
        l = lo.reshape(A, r, B, lo.shape[-1])
        h = hi.reshape(A, r, B, hi.shape[-1])
        if r == 2:
            e_lo, e_hi = l[:, 0], h[:, 0]
            o_lo, o_hi = l[:, 1], h[:, 1]
            y0 = limb.add_canon(e_lo, e_hi, o_lo, o_hi)
            y1 = limb.sub_canon(e_lo, e_hi, o_lo, o_hi)
            ys = [y0, y1]
        else:
            a = limb.add_canon(l[:, 0], h[:, 0], l[:, 2], h[:, 2])
            b = limb.sub_canon(l[:, 0], h[:, 0], l[:, 2], h[:, 2])
            c = limb.add_canon(l[:, 1], h[:, 1], l[:, 3], h[:, 3])
            d0 = limb.sub_canon(l[:, 1], h[:, 1], l[:, 3], h[:, 3])
            w4lo, w4hi = _const_planes(w4, d0[0])
            d = limb.mul_mod(d0[0], d0[1], w4lo, w4hi)
            ys = [
                limb.add_canon(*a, *c),
                limb.add_canon(*b, *d),
                limb.sub_canon(*a, *c),
                limb.sub_canon(*b, *d),
            ]
        # stack prepends the new digit: components [A, B, TL] -> layout
        # [r, A, B, TL], flattened digit-major (the Stockham invariant)
        lo = jnp.stack([y[0] for y in ys], axis=0).reshape(S, lo.shape[-1])
        hi = jnp.stack([y[1] for y in ys], axis=0).reshape(S, hi.shape[-1])
        if vec is not None:
            tlo, thi = tw_refs[ti]
            ti += 1
            lo, hi = limb.mul_mod(lo, hi, tlo[:], thi[:])
    return lo, hi


@lru_cache(maxsize=32)
def _local_pass_tables_np(log_s: int, inverse: bool, tl: int):
    """Per-twiddled-pass [S, tl] (lo, hi) u32 tables (one lane-tile wide;
    the factor depends only on the sublane index)."""
    out = []
    for _r, _a, _b, vec in _local_pass_plan(log_s, inverse):
        if vec is None:
            continue
        col = np.repeat(vec[:, None], tl, axis=1)
        out.append(((col & 0xFFFFFFFF).astype(np.uint32),
                    (col >> 32).astype(np.uint32)))
    return out


def _make_kernel(log_s: int, inverse: bool, n_tw: int):
    def kernel(*refs):
        in_lo, in_hi = refs[0], refs[1]
        tw_refs = [(refs[2 + 2 * i], refs[3 + 2 * i]) for i in range(n_tw)]
        out_lo, out_hi = refs[2 + 2 * n_tw], refs[3 + 2 * n_tw]
        lo, hi = _local_ntt(in_lo[0], in_hi[0], tw_refs, log_s, inverse)
        out_lo[0] = lo
        out_hi[0] = hi

    return kernel


def _local_stage(x, log_s: int, inverse: bool, interpret: bool):
    """x [Bt, S, M] u64 -> local NTTs over the S axis, one Mosaic program
    with grid (Bt, M/tl).

    The four-step twiddle is deliberately NOT applied here: a streamed
    [S, tl] twiddle block per grid step measured ~1 ms of the 2.57 ms
    stage at 2^20 (vs 0.18 ms for a VMEM-resident constant mul) — the
    fused XLA pointwise between the stages does the same multiply at
    full u64-emulation throughput riding the transpose's HBM pass
    (docs/perf_notes.md round 5)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bt, S, M = x.shape
    tl = _tile_lanes(S, M)
    assert S == 1 << log_s and M % tl == 0, (S, M, tl)
    lo, hi = _split(x)
    tables = _local_pass_tables_np(log_s, inverse, tl)
    n_tw = len(tables)

    data_spec = pl.BlockSpec(
        (1, S, tl), lambda b, i: (b, jnp.int32(0), i), memory_space=pltpu.VMEM
    )
    const_spec = pl.BlockSpec(
        (S, tl), lambda b, i: (jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    operands = [lo, hi]
    in_specs = [data_spec, data_spec]
    for tlo, thi in tables:
        operands += [jnp.asarray(tlo), jnp.asarray(thi)]
        in_specs += [const_spec, const_spec]
    kernel = _make_kernel(log_s, inverse, n_tw)
    # the unrolled pass chain's live intermediates exceed the default
    # 16 MB scoped-VMEM stack at S >= 512 (measured: 29 MB at the block
    # circuit's [135, 2^18] intt); v5e has headroom above the default
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(Bt, M // tl),
        in_specs=in_specs,
        out_specs=[data_spec, data_spec],
        out_shape=[jax.ShapeDtypeStruct((Bt, S, M), u32)] * 2,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*operands)
    return _fuse(out_lo, out_hi)


@lru_cache(maxsize=16)
def _fourstep_tw_np(log_n1: int, log_n2: int, inverse: bool):
    """[n1, n2] u64 four-step twiddle w^{±i2 k1}; for the inverse the
    1/n output scale is folded in (every output passes through exactly
    one table element), so the whole transform needs no separate scale
    multiply."""
    from ..parallel.ntt_sharded import _twiddle_matrix

    n1, n2 = 1 << log_n1, 1 << log_n2
    if not inverse:
        return _twiddle_matrix(log_n1, log_n2)
    w = gl.primitive_root_of_unity(log_n1 + log_n2)
    w_inv = pow(w, P - 2, P)
    n_inv = pow(n1 * n2, P - 2, P)
    m = np.empty((n1, n2), dtype=np.uint64)
    for k1 in range(n1):
        base = pow(w_inv, k1, P)
        acc = n_inv
        for i2 in range(n2):
            m[k1, i2] = acc
            acc = acc * base % P
    return m


# device-resident four-step twiddle planes per (log_n1, log_n2, inverse).
# Only concrete arrays are cached: inside a trace jnp.asarray yields a
# TRACER constant, and caching it would leak it out of the transform.
_FS_TW_CACHE: dict = {}


def _fourstep_tw(log_n1: int, log_n2: int, inverse: bool):
    key = (log_n1, log_n2, inverse)
    ent = _FS_TW_CACHE.get(key)
    if ent is None:
        ent = jnp.asarray(_fourstep_tw_np(log_n1, log_n2, inverse))
        if not isinstance(ent, jax.core.Tracer):
            _FS_TW_CACHE[key] = ent
    return ent


def can_pallas_ntt(n: int) -> bool:
    """Shapes the kernel supports: power of two, both four-step factors
    at least one lane tile, VMEM-resident pass tables."""
    if n <= 0 or n & (n - 1):
        return False
    log_n = n.bit_length() - 1
    log_n1 = log_n // 2
    return (1 << log_n1) >= TL and log_n <= 21


def ntt_pallas(x, inverse: bool = False, interpret: bool = False):
    """[B, n] u64 -> NTT along the last axis, natural order, bit-identical
    to ``ops.ntt.ntt``/``intt`` (which remain the oracle).  Disk-backed
    executable cache (ops/pallas_aot.py); inside an enclosing trace
    (``ops.ntt.ntt`` is jitted and dispatches here) the kernel inlines
    into the caller's graph instead."""
    if isinstance(x, jax.core.Tracer):
        return _ntt_impl_pallas(x, inverse, interpret)
    from .pallas_aot import aot_kernel

    fn = aot_kernel(
        "ntt_pallas",
        lambda: partial(_ntt_impl_pallas, inverse=inverse,
                        interpret=interpret),
        (inverse, interpret, f"v{NTT_GRAPH_VERSION}"),
    )
    return fn(x)


def _ntt_impl_pallas(x, inverse: bool = False, interpret: bool = False):
    B, n = x.shape
    log_n = n.bit_length() - 1
    assert can_pallas_ntt(n), n
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2

    xm = x.reshape(B, n1, n2)
    a = _local_stage(xm, log_n1, inverse, interpret)  # [B, k1, i2]
    # four-step twiddle (and inverse 1/n scale) as fused XLA pointwise,
    # riding the transpose's HBM pass — see _local_stage's docstring
    a = gl.mul(a, _fourstep_tw(log_n1, log_n2, inverse)[None])
    b = jnp.swapaxes(a, 1, 2)  # [B, i2, k1]
    c = _local_stage(b, log_n2, inverse, interpret)  # [B, k2, k1]
    return c.reshape(B, n)

