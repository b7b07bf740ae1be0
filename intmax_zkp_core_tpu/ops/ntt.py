"""NTT / inverse NTT / coset LDE over Goldilocks on TPU (JAX).

This is the polynomial engine under the prover's commitments and quotient
(the work plonky2 does in its ``fft``/``coset_fft`` during
``CircuitData::prove`` — reference call stack ``SURVEY.md`` §3.1).

TPU-native design
-----------------
* Batch-first layout ``[batch, n]``: many polynomials transform at once
  (wire columns, quotient chunks), so every stage is a fully vectorized
  elementwise op over the VPU — no scalar loops, no dynamic shapes; the
  level recursion unrolls at trace time.
* **Gather-free Stockham radix-4** (the TPU default): no bit-reversal
  permutation anywhere — on TPU the size-n random gather alone cost more
  than the rest of the transform (22.5 ms of a 28 ms 2^20 NTT, measured
  v5e; docs/perf_notes.md).  Each pass views the state as ``[A, 4, B]``
  (A = digits already produced, B = remaining block), does the radix-4
  DFT on the middle axis (one field mul per 4 points: w4^2 = -1), applies
  the pass twiddle, and PREPENDS the new output digit by swapping the two
  leading axes — a relayout with contiguous length-B row blocks, which
  XLA's tiled transpose handles, unlike a gather.  After the last pass
  the digits sit in natural order by construction.  The per-pass twiddle
  w^{i2·k1} is applied as two factored rank-1 tables (w^{i2·k1} =
  T_hi[k1, i2//S] · T_lo[k1, i2%S]) so closed-over constants stay a few
  KB — multi-megabyte baked literals OOM the remote compile helper.
  Measured v5e: 444 ntt/s at 2^20 (batch 2) vs 35.4/s for the round-2
  radix-2 kernel — 12.6x.
* The pre-rework radix-2 stage kernel is kept as ``INTMAX_TPU_NTT=stages``
  (and stays the CPU default — host gathers are cheap and it does fewer
  muls); both are exact mod p and bit-identical.
* Multi-chip scaling shards the batch axis (embarrassingly parallel) and,
  for single huge polynomials, the four-step algorithm in
  ``parallel/ntt_sharded.py`` turns one size-n NTT into two batched
  sqrt(n)-NTTs + a transpose (the all-to-all axis).

Order convention: ``ntt`` maps coefficients -> evaluations at powers of the
canonical 2^k-th root of unity, natural order; NTT(a)[i] = sum_j a_j w^(ij).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from . import goldilocks as gl

P = gl.P_INT

# "stockham" | "stages" | "auto" (stages on CPU — cheap gathers, fewer
# muls; stockham on TPU where the size-n gather is the dominant cost)
_NTT_MODE = os.environ.get("INTMAX_TPU_NTT", "auto")


def _mode() -> str:
    if _NTT_MODE != "auto":
        return _NTT_MODE
    return "stages" if jax.default_backend() == "cpu" else "stockham"


@lru_cache(maxsize=64)
def _root_scalar(log_n: int, inverse: bool) -> int:
    w = gl.primitive_root_of_unity(log_n)
    return pow(w, P - 2, P) if inverse else w


@lru_cache(maxsize=128)
def _twiddle_factored(log_n: int, log_n1: int, inverse: bool):
    """Rank-1 factorization of the four-step twiddle w^{i2*k1} for the
    split n = n1*n2: returns (t_hi [n1, n2//S], t_lo [n1, S], S) numpy
    tables with w^{i2*k1} = t_hi[k1, i2//S] * t_lo[k1, i2%S]."""
    n1 = 1 << log_n1
    log_n2 = log_n - log_n1
    n2 = 1 << log_n2
    s_log = log_n2 // 2
    S = 1 << s_log
    w = _root_scalar(log_n, inverse)
    t_lo = np.empty((n1, S), dtype=np.uint64)
    t_hi = np.empty((n1, n2 >> s_log), dtype=np.uint64)
    for k1 in range(n1):
        base = pow(w, k1, P)           # w^{k1}
        base_hi = pow(base, S, P)      # w^{S*k1}
        acc = 1
        for j in range(S):
            t_lo[k1, j] = acc
            acc = acc * base % P
        acc = 1
        for j in range(n2 >> s_log):
            t_hi[k1, j] = acc
            acc = acc * base_hi % P
    return t_hi, t_lo, S


def _dft4_axis(parts, inverse: bool, axis: int):
    """Radix-4 DFT of 4 equal-shape arrays (one field mul per 4 points:
    w4^2 = -1, so only the odd-difference term needs a multiply)."""
    x0, x1, x2, x3 = parts
    w4 = jnp.uint64(_root_scalar(2, inverse))
    a = gl.add(x0, x2)
    b = gl.sub(x0, x2)
    c = gl.add(x1, x3)
    d = gl.mul(gl.sub(x1, x3), w4)
    return jnp.stack(
        [gl.add(a, c), gl.add(b, d), gl.sub(a, c), gl.sub(b, d)], axis=axis
    )


def _ntt_stockham(x: jax.Array, log_n: int, inverse: bool) -> jax.Array:
    """Natural-order DFT along the last axis: Stockham-style passes, each
    prepending its output digit to the already-produced digits, so the
    final pass leaves natural order with no permutation step.  An odd
    log_n takes one radix-2 pass first, then radix-4 all the way down."""
    bshape = x.shape[:-1]
    n = 1 << log_n
    A = 1
    cur = x.reshape(bshape + (1, n))
    rem = log_n
    while rem > 0:
        r_log = 1 if rem % 2 else 2
        r = 1 << r_log
        B = (1 << rem) // r
        xm = cur.reshape(bshape + (A, r, B))
        if r == 2:
            e, o = xm[..., 0, :], xm[..., 1, :]
            Y = jnp.stack([gl.add(e, o), gl.sub(e, o)], axis=-2)
        else:
            Y = _dft4_axis([xm[..., i, :] for i in range(4)], inverse, axis=-2)
        if rem > r_log:
            t_hi, t_lo, S = _twiddle_factored(rem, r_log, inverse)
            Yr = Y.reshape(bshape + (A, r, B // S, S))
            Y = gl.mul(
                gl.mul(Yr, jnp.asarray(t_hi)[:, :, None]),
                jnp.asarray(t_lo)[:, None, :],
            ).reshape(bshape + (A, r, B))
        Y = jnp.swapaxes(Y, -3, -2)  # prepend the new digit: [A, r, B] -> [r, A, B]
        A *= r
        rem -= r_log
        cur = Y.reshape(bshape + (A, B))
    return cur.reshape(bshape + (n,))


@lru_cache(maxsize=40)
def _twiddle_tables(log_n: int, inverse: bool):
    """Per-stage twiddle factors (numpy uint64), plus bit-reversal perm."""
    n = 1 << log_n
    w_n = gl.primitive_root_of_unity(log_n)
    if inverse:
        w_n = pow(w_n, P - 2, P)
    # bit reversal permutation
    rev = np.zeros(n, dtype=np.int64)
    for i in range(n):
        rev[i] = int(format(i, f"0{log_n}b")[::-1], 2) if log_n else 0
    tables = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w_m = pow(w_n, n // m, P)
        tw = np.empty(m // 2, dtype=np.uint64)
        acc = 1
        for j in range(m // 2):
            tw[j] = acc
            acc = acc * w_m % P
        tables.append(tw)
    return rev, tables


def _pallas_ntt_enabled() -> bool:
    """Route big transforms through the Mosaic four-step kernel
    (ops/ntt_pallas): pass-fused VMEM local NTTs, one HBM transpose.
    Defaults to serving mode on non-CPU backends (the program-load
    economics of docs/perf_notes.md round 4); INTMAX_TPU_NTT_PALLAS
    overrides either way."""
    v = os.environ.get("INTMAX_TPU_NTT_PALLAS")
    if v == "1":
        return True
    if v == "0":
        return False
    from ..runtime import serving_enabled

    return serving_enabled()


def _ntt_impl(a: jax.Array, inverse: bool) -> jax.Array:
    n = a.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "length must be a power of two"
    if jax.default_backend() != "cpu" and _pallas_ntt_enabled():
        from .ntt_pallas import can_pallas_ntt, ntt_pallas

        if can_pallas_ntt(n):
            flat = a.reshape(-1, n)
            return ntt_pallas(flat, inverse).reshape(a.shape)
    return ntt_jnp(a, inverse)


def ntt_jnp(a: jax.Array, inverse: bool = False) -> jax.Array:
    """The pure-XLA formulation, never the Mosaic kernel.

    shard_map bodies MUST use this (parallel/ntt_sharded): a pallas_call
    inlined into an SPMD-partitioned graph is an untested Mosaic/SPMD
    interaction, which is why every sibling Pallas dispatch site guards
    with ``mesh is None`` (ADVICE round 4)."""
    n = a.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "length must be a power of two"
    if _mode() == "stockham":
        x = _ntt_stockham(a, log_n, inverse)
        if inverse:
            x = gl.mul(x, jnp.uint64(pow(n, P - 2, P)))
        return x
    return _ntt_stages(a, inverse)


def _ntt_stages(a: jax.Array, inverse: bool) -> jax.Array:
    """Pre-rework radix-2 stage kernel (bit-reversal gather + per-stage
    concatenate); kept for A/B measurement via INTMAX_TPU_NTT=stages."""
    orig_shape = a.shape
    n = orig_shape[-1]
    log_n = n.bit_length() - 1
    rev, tables = _twiddle_tables(log_n, inverse)
    x = a[..., jnp.asarray(rev)]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw = jnp.asarray(tables[s - 1])  # [half]
        x = x.reshape(orig_shape[:-1] + (n // m, m))
        even = x[..., :half]
        odd = x[..., half:]
        t = gl.mul(odd, tw)
        x = jnp.concatenate([gl.add(even, t), gl.sub(even, t)], axis=-1)
    x = x.reshape(orig_shape)
    if inverse:
        n_inv = jnp.uint64(pow(n, P - 2, P))
        x = gl.mul(x, n_inv)
    return x


def _aot_entry(name: str, make_fn, statics: tuple):
    """Eager entry points go through the disk-backed executable cache
    when the Pallas NTT is active: a pallas_call's lowering is not
    byte-stable across processes, so any plain-jit graph embedding one
    misses the HLO-keyed compile cache every process and triggers a
    remote recompile (ops/pallas_aot.py).  Pure-jnp graphs keep plain
    jit (their cache keys are stable)."""
    from .pallas_aot import aot_kernel

    # The AOT key does not hash the jaxpr: fold in every env flag the
    # traced graph depends on (ADVICE round 4) — the XLA-formulation mode
    # (stockham/stages) used for non-Pallas-eligible shapes — plus the
    # embedded Mosaic kernel's graph version (these entries exist only
    # when the Pallas NTT is enabled).
    from .ntt_pallas import NTT_GRAPH_VERSION

    return aot_kernel(
        name, make_fn,
        statics + ("m:" + _mode(), f"pv{NTT_GRAPH_VERSION}"),
    )


def ntt(a: jax.Array) -> jax.Array:
    """Coefficients -> evaluations on the size-n subgroup (natural order)."""
    if isinstance(a, jax.core.Tracer) or not (
        jax.default_backend() != "cpu" and _pallas_ntt_enabled()
    ):
        return _ntt_jit(a)
    fn = _aot_entry("ntt", lambda: partial(_ntt_impl, inverse=False),
                    ("fwd",))
    return fn(a)


def intt(a: jax.Array) -> jax.Array:
    """Evaluations -> coefficients."""
    if isinstance(a, jax.core.Tracer) or not (
        jax.default_backend() != "cpu" and _pallas_ntt_enabled()
    ):
        return _intt_jit(a)
    fn = _aot_entry("intt", lambda: partial(_ntt_impl, inverse=True),
                    ("inv",))
    return fn(a)


_ntt_jit = jax.jit(partial(_ntt_impl, inverse=False))
_intt_jit = jax.jit(partial(_ntt_impl, inverse=True))


@lru_cache(maxsize=40)
def _shift_powers(n: int, shift: int):
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * shift % P
    return out


def _coset_lde_impl(a: jax.Array, rate_bits: int, shift: int) -> jax.Array:
    n = a.shape[-1]
    lde_n = n << rate_bits
    powers = jnp.asarray(_shift_powers(n, shift % P))
    shifted = gl.mul(a, powers)
    padded = jnp.zeros(a.shape[:-1] + (lde_n,), dtype=jnp.uint64)
    padded = padded.at[..., :n].set(shifted)
    return ntt(padded)


_coset_lde_jit = jax.jit(_coset_lde_impl, static_argnums=(1, 2))


def coset_lde(a: jax.Array, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> jax.Array:
    """Low-degree extension: evaluate the polynomial with coefficients `a`
    (shape [..., n]) on the coset ``shift * H`` of the 2^rate_bits-times
    larger subgroup H.  Mirrors plonky2's ``coset_fft`` with
    ``F::coset_shift`` used by all prover commitments."""
    if isinstance(a, jax.core.Tracer) or not (
        jax.default_backend() != "cpu" and _pallas_ntt_enabled()
    ):
        return _coset_lde_jit(a, rate_bits, shift)
    fn = _aot_entry(
        "coset_lde",
        lambda: partial(_coset_lde_impl, rate_bits=rate_bits, shift=shift),
        (rate_bits, shift),
    )
    return fn(a)


def _coset_ilde_impl(evals: jax.Array, rate_bits: int, shift: int) -> jax.Array:
    lde_n = evals.shape[-1]
    n = lde_n >> rate_bits
    coeffs = intt(evals)
    inv_shift = pow(shift % P, P - 2, P)
    powers = jnp.asarray(_shift_powers(lde_n, inv_shift))
    unshifted = gl.mul(coeffs, powers)
    return unshifted[..., :n]


_coset_ilde_jit = jax.jit(_coset_ilde_impl, static_argnums=(1, 2))


def coset_ilde(evals: jax.Array, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> jax.Array:
    """Inverse of coset_lde: recover the n low-order coefficients."""
    if isinstance(evals, jax.core.Tracer) or not (
        jax.default_backend() != "cpu" and _pallas_ntt_enabled()
    ):
        return _coset_ilde_jit(evals, rate_bits, shift)
    fn = _aot_entry(
        "coset_ilde",
        lambda: partial(_coset_ilde_impl, rate_bits=rate_bits, shift=shift),
        (rate_bits, shift),
    )
    return fn(evals)


def eval_poly_at(coeffs: jax.Array, x: jax.Array) -> jax.Array:
    """Horner evaluation of [..., n] coefficient arrays at scalar/batched x
    (base field)."""
    n = coeffs.shape[-1]
    acc = coeffs[..., n - 1]
    for i in range(n - 2, -1, -1):
        acc = gl.add(gl.mul(acc, x), coeffs[..., i])
    return acc


def eval_poly_at_ext(coeffs: jax.Array, x: jax.Array) -> jax.Array:
    """Horner evaluation of base-field coefficients [..., n] at an
    extension-field point x [..., 2]."""
    n = coeffs.shape[-1]
    acc = gl.ext_from_base(coeffs[..., n - 1])
    for i in range(n - 2, -1, -1):
        acc = gl.ext_add(gl.ext_mul(acc, x), gl.ext_from_base(coeffs[..., i]))
    return acc
