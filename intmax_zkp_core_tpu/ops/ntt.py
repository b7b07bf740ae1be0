"""Radix-2 NTT / inverse NTT / coset LDE over Goldilocks on TPU (JAX).

This is the polynomial engine under the prover's commitments and quotient
(the work plonky2 does in its ``fft``/``coset_fft`` during
``CircuitData::prove`` — reference call stack ``SURVEY.md`` §3.1).

TPU-native design
-----------------
* Batch-first layout ``[batch, n]``: many polynomials transform at once
  (wire columns, quotient chunks), so every butterfly stage is a fully
  vectorized elementwise op over the VPU — no scalar loops, no dynamic
  shapes; the stage loop unrolls at trace time (log2(n) stages).
* Twiddle tables are precomputed per size on host (numpy, exact ints) and
  closed over as constants; XLA hoists them to device once.
* Multi-chip scaling shards the batch axis (embarrassingly parallel) and,
  for single huge polynomials, the four-step algorithm in
  ``parallel/ntt_sharded.py`` turns one size-n NTT into two batched
  sqrt(n)-NTTs + a transpose (the all-to-all axis).

Order convention: ``ntt`` maps coefficients -> evaluations at powers of the
canonical 2^k-th root of unity, natural order; NTT(a)[i] = sum_j a_j w^(ij).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from . import goldilocks as gl

P = gl.P_INT


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


def _ntt_impl(a: jax.Array, inverse: bool) -> jax.Array:
    orig_shape = a.shape
    n = orig_shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "length must be a power of two"
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


@jax.jit
def ntt(a: jax.Array) -> jax.Array:
    """Coefficients -> evaluations on the size-n subgroup (natural order)."""
    return _ntt_impl(a, inverse=False)


@jax.jit
def intt(a: jax.Array) -> jax.Array:
    """Evaluations -> coefficients."""
    return _ntt_impl(a, inverse=True)


@lru_cache(maxsize=40)
def _shift_powers(n: int, shift: int):
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * shift % P
    return out


from functools import partial


@partial(jax.jit, static_argnums=(1, 2))
def coset_lde(a: jax.Array, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> jax.Array:
    """Low-degree extension: evaluate the polynomial with coefficients `a`
    (shape [..., n]) on the coset ``shift * H`` of the 2^rate_bits-times
    larger subgroup H.  Mirrors plonky2's ``coset_fft`` with
    ``F::coset_shift`` used by all prover commitments."""
    n = a.shape[-1]
    lde_n = n << rate_bits
    powers = jnp.asarray(_shift_powers(n, shift % P))
    shifted = gl.mul(a, powers)
    padded = jnp.zeros(a.shape[:-1] + (lde_n,), dtype=jnp.uint64)
    padded = padded.at[..., :n].set(shifted)
    return ntt(padded)


@partial(jax.jit, static_argnums=(1, 2))
def coset_ilde(evals: jax.Array, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> jax.Array:
    """Inverse of coset_lde: recover the n low-order coefficients."""
    lde_n = evals.shape[-1]
    n = lde_n >> rate_bits
    coeffs = intt(evals)
    inv_shift = pow(shift % P, P - 2, P)
    powers = jnp.asarray(_shift_powers(lde_n, inv_shift))
    unshifted = gl.mul(coeffs, powers)
    return unshifted[..., :n]


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
