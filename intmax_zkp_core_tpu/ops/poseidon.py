"""Batched Poseidon-12 permutation and sponge hashing on TPU (JAX).

The permutation is the hot primitive of the whole framework: every SMT node
hash, Merkle cap, transcript challenge and in-circuit Poseidon gate boils
down to it (reference usage: ``PoseidonHash::{two_to_one,hash_pad,
hash_no_pad}`` at ``src/sparse_merkle_tree/goldilocks_poseidon/mod.rs:
158-184``).

TPU-native design
-----------------
* State layout is ``[batch, 12]`` uint64 — the batch axis vectorizes over the
  VPU lanes; all 30 rounds are unrolled at trace time into one fused XLA
  computation (static shapes, no data-dependent control flow).
* The MDS layer multiplies by small integer constants only, so it runs on
  32-bit limb accumulators without full modular multiplies: products of a
  64-bit limb split by constants <= 41 summed over 13 terms stay well below
  2^64, needing a single 128-bit reduction per lane.
* S-box x^7 costs 4 modular multiplies (x2, x3=x2*x, x6=x3^2? -> chain
  x2, x3, x7 = (x3)^2 * x).

Sponge semantics match the engine: rate 8, capacity 4, zero-initialized
state, overwrite absorption, no padding for ``hash_n_to_hash_no_pad``;
``hash_pad`` appends 1, zero-fills to 11 mod 12, appends 1 (the 12-lane leaf
padding mirrored in-circuit at reference
``src/sparse_merkle_tree/gadgets/common.rs:87-101``).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from . import goldilocks as gl
from .poseidon_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_RATE,
    SPONGE_WIDTH,
)

_RC = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, SPONGE_WIDTH)

# MDS as a dense 12x12 small-int matrix: M[r][c] = CIRC[(c-r) % 12] + diag.
_MDS = np.zeros((SPONGE_WIDTH, SPONGE_WIDTH), dtype=np.uint64)
for _r in range(SPONGE_WIDTH):
    for _c in range(SPONGE_WIDTH):
        _MDS[_r, _c] = MDS_MATRIX_CIRC[(_c - _r) % SPONGE_WIDTH]
    _MDS[_r, _r] += MDS_MATRIX_DIAG[_r]


def _sbox(x: jax.Array) -> jax.Array:
    x2 = gl.square(x)
    x3 = gl.mul(x2, x)
    x6 = gl.square(x3)
    return gl.mul(x6, x)


def _mds_layer(state: jax.Array) -> jax.Array:
    """state: [..., 12] -> M @ state, via 32-bit limb accumulation.

    The circulant structure turns the matrix product into 12 lane-rolls
    scaled by small constants (out[r] = sum_i CIRC[i] * state[(r+i) % 12],
    plus DIAG[0] * state[0] on lane 0) — pure elementwise u64 ops, no
    dot_general (which the TPU X64 rewriter does not support).  With
    coefficients <= 49 and 13 terms the limb accumulators stay < 2^42, so a
    single (hi, lo) recombination + reduce128 per output lane suffices.
    """
    lo = state & gl.MASK32  # [..., 12]
    hi = state >> jnp.uint64(32)
    acc_lo = jnp.zeros_like(lo)
    acc_hi = jnp.zeros_like(hi)
    for i, c in enumerate(MDS_MATRIX_CIRC):
        # out[r] += c * state[r+i mod 12]  -> roll by -i along the lane axis
        acc_lo = acc_lo + jnp.uint64(c) * jnp.roll(lo, -i, axis=-1)
        acc_hi = acc_hi + jnp.uint64(c) * jnp.roll(hi, -i, axis=-1)
    d = jnp.uint64(MDS_MATRIX_DIAG[0])
    acc_lo = acc_lo.at[..., 0].add(d * lo[..., 0])
    acc_hi = acc_hi.at[..., 0].add(d * hi[..., 0])
    # value = acc_lo + acc_hi * 2^32, both < 2^42
    s = acc_lo + (acc_hi << jnp.uint64(32))
    carry = (s < acc_lo).astype(jnp.uint64)
    top = (acc_hi >> jnp.uint64(32)) + carry
    return gl.reduce128(top, s)


def permute(state: jax.Array) -> jax.Array:
    """Poseidon permutation over [..., 12] canonical uint64 arrays.

    The round loop is three ``lax.scan``s (4 full / 22 partial / 4 full
    rounds, round constants as scanned inputs) rather than a 30x unrolled
    trace: the traced graph is ~20x smaller, which makes the per-batch-shape
    trace+compile of the eager dispatch path (``_permute_dispatch``) cheap —
    a Merkle tree build touches one shape per level, and with the unrolled
    form each cost seconds of tracing per process.  Bit-identical math; the
    Pallas TPU kernel (``poseidon_pallas``) still uses its own unrolled body.
    """
    rc = jnp.asarray(_RC)

    def full_round(st, rc_row):
        st = gl.add(st, rc_row)
        st = _sbox(st)
        return _mds_layer(st), None

    def partial_round(st, rc_row):
        st = gl.add(st, rc_row)
        st = st.at[..., 0].set(_sbox(st[..., 0]))
        return _mds_layer(st), None

    h = HALF_N_FULL_ROUNDS
    state, _ = jax.lax.scan(full_round, state, rc[:h])
    state, _ = jax.lax.scan(partial_round, state, rc[h : h + N_PARTIAL_ROUNDS])
    state, _ = jax.lax.scan(full_round, state, rc[h + N_PARTIAL_ROUNDS :])
    return state


permute_jit = jax.jit(permute)

_PALLAS_MIN_BATCH = 256


def _pallas_bucket(nrows: int) -> int:
    """Round a row count up to the next 256*4^k bucket.

    Every distinct batch shape is a distinct compiled program, and through
    the remote axon backend each program costs ~10-80 s of per-process
    first-call load (measured; docs/perf_notes.md round 3) — a Merkle tree
    build alone touches ~14 level shapes.  Bucketing to powers of four
    caps the process at ~7 permutation programs for ANY workload, at the
    price of <= 4x padded compute on an op that runs 2^20 rows in ~80 ms."""
    b = _PALLAS_MIN_BATCH
    while b < nrows:
        b *= 4
    return b


def _permute_via_pallas(state: jax.Array, interpret: bool = False) -> jax.Array:
    """Run [..., 12] through the Pallas kernel: flatten leading dims, zero-pad
    the row count to the next 256*4^k program bucket, unpad and reshape
    back."""
    from .poseidon_pallas import permute_pallas

    batch = state.shape[:-1]
    nrows = 1
    for d in batch:
        nrows *= d
    flat = state.reshape(nrows, SPONGE_WIDTH)
    pad = _pallas_bucket(nrows) - nrows
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, SPONGE_WIDTH), dtype=jnp.uint64)], axis=0
        )
    out = permute_pallas(flat, interpret)
    if pad:
        out = out[:nrows]
    return out.reshape(state.shape)


def permute_auto(state: jax.Array) -> jax.Array:
    """``permute`` with trace-time dispatch to the Pallas TPU kernel.

    On non-CPU backends a batch of >= 256 states goes through
    ``ops.poseidon_pallas`` (bit-identical to the jnp path, ~2.2x faster on
    v5e — the XLA u64 emulation splits every add/mul generically while the
    kernel keeps hand-scheduled u32 limb planes in VMEM).  Small batches and
    CPU runs keep the portable jnp path.
    """
    nrows = 1
    for d in state.shape[:-1]:
        nrows *= d
    if jax.default_backend() == "cpu" or nrows < _PALLAS_MIN_BATCH:
        return permute(state)
    from ..runtime import poseidon_pallas_enabled

    if not poseidon_pallas_enabled():
        # Default: the jnp body.  The Pallas kernel computes ~2x faster
        # (80 ms vs 40 ms at 2^18 rows) but through the remote axon
        # backend each Mosaic program's per-process first call costs
        # 20-80 s vs 2-8 s for the jnp program (docs/perf_notes.md round
        # 3) — for anything but a long-lived server the load dominates.
        # INTMAX_TPU_POSEIDON_PALLAS=1 or serving mode
        # (INTMAX_TPU_SERVING=1, runtime.py) opts in.
        return permute(state)
    try:
        return _permute_via_pallas(state)
    except Exception:
        return permute(state)


_permute_jnp_jit = jax.jit(permute)
# Kept deliberately pallas-free: every caller below wants the plain-jnp
# program (small batches, the Pallas-failure fallback, and warmup
# preloads) — tracing ``permute_auto`` here instead would, under serving
# mode, embed the pallas_call in a plain-jit graph whose HLO cache key is
# not process-stable (ADVICE round 4, medium).
_permute_auto_jit = _permute_jnp_jit


def _permute_dispatch(state: jax.Array) -> jax.Array:
    """The permutation is THE jit boundary for host-driven hashing.

    Called eagerly (tree builds, commitments), each distinct batch shape
    [B, 12] lowers a single ~1.5k-op permutation graph once (~1s) and is
    shared across every leaf width, tree level and circuit.  Jitting whole
    sponge chains or whole trees instead produces 30-200x larger graphs
    whose MLIR lowering (minutes per shape, not covered by the persistent
    compile cache) dominates fresh-process wall-clock.  Inside an enclosing
    jit trace this is a no-op passthrough to ``permute_auto``.
    """
    if isinstance(state, jax.core.Tracer):
        return permute_auto(state)
    nrows = 1
    for d in state.shape[:-1]:
        nrows *= d
    if jax.default_backend() == "cpu" or nrows < _PALLAS_MIN_BATCH:
        return _permute_auto_jit(state)
    # eager accelerator path: bucket the batch BEFORE the jit boundary so
    # the process compiles/loads at most ~7 permutation programs total
    # (one per 256*4^k bucket) instead of one per caller batch shape —
    # through the remote backend each program's first call costs ~10-80 s
    # (docs/perf_notes.md round 3).  The pad/slice ops are tiny eager
    # programs that load in ~0.1 s.
    flat = state.reshape(nrows, SPONGE_WIDTH)
    bucket = _pallas_bucket(nrows)
    if bucket != nrows:
        flat = jnp.concatenate(
            [flat, jnp.zeros((bucket - nrows, SPONGE_WIDTH), dtype=jnp.uint64)],
            axis=0,
        )
    from ..runtime import poseidon_pallas_enabled

    if poseidon_pallas_enabled():
        # straight to the disk-backed-executable Pallas kernel: wrapping
        # it in _permute_auto_jit would embed the pallas_call in a
        # plain-jit graph whose HLO cache key is not process-stable
        # (every fresh process would remote-recompile; ops/pallas_aot.py)
        try:
            out = _permute_via_pallas(flat)
        except Exception:
            # pallas-free fallback: _permute_jnp_jit traces ``permute``
            # directly, never the Pallas branch (process-stable HLO key)
            out = _permute_jnp_jit(flat)
    else:
        out = _permute_jnp_jit(flat)
    if bucket != nrows:
        out = out[:nrows]
    return out.reshape(state.shape)


def hash_n_to_m_no_pad(inputs: jax.Array, num_outputs: int = 4) -> jax.Array:
    """Sponge over [..., n] inputs -> [..., num_outputs].

    n must be static.  Zero-initialized width-12 state, overwrite-absorb in
    rate-8 chunks, permute after each chunk, squeeze from the front.

    The chained ``permute_auto`` absorb below already runs each permutation
    in the Pallas kernel on TPU; the fully-fused sponge kernel
    (``poseidon_pallas.hash_no_pad_pallas``) measures within ~2% of this
    chain at batch >= 2^13 (both are compute-bound in the permutation), so
    it is kept as an opt-in for dispatch-latency-sensitive callers rather
    than wired in here.
    """
    inputs = jnp.asarray(inputs, dtype=jnp.uint64)
    n = inputs.shape[-1]
    batch = inputs.shape[:-1]
    state = jnp.zeros(batch + (SPONGE_WIDTH,), dtype=jnp.uint64)
    for start in range(0, n, SPONGE_RATE):
        chunk = inputs[..., start : start + SPONGE_RATE]
        state = state.at[..., : chunk.shape[-1]].set(chunk)
        state = _permute_dispatch(state)
    assert num_outputs <= SPONGE_WIDTH
    return state[..., :num_outputs]


def hash_no_pad(inputs: jax.Array) -> jax.Array:
    """4-limb digest of [..., n] inputs (plonky2 ``hash_n_to_hash_no_pad``)."""
    return hash_n_to_m_no_pad(inputs, 4)


def hash_pad(inputs: jax.Array) -> jax.Array:
    """Padded hash: append 1, zero-fill until len % 12 == 11, append 1.

    This is the sponge-level counterpart of the in-circuit 12-lane leaf
    padding (reference ``common.rs:87-101``: flag lanes 8 and 11 for 8-lane
    payloads).
    """
    inputs = jnp.asarray(inputs, dtype=jnp.uint64)
    n = inputs.shape[-1]
    batch = inputs.shape[:-1]
    padded_len = n + 1
    while (padded_len + 1) % SPONGE_WIDTH != 0:
        padded_len += 1
    padded_len += 1
    pad = jnp.zeros(batch + (padded_len - n,), dtype=jnp.uint64)
    pad = pad.at[..., 0].set(1)
    pad = pad.at[..., -1].set(1)
    return hash_no_pad(jnp.concatenate([inputs, pad], axis=-1))


def two_to_one(left: jax.Array, right: jax.Array) -> jax.Array:
    """Compress two [..., 4] digests into one (internal Merkle nodes)."""
    return hash_no_pad(jnp.concatenate([left, right], axis=-1))


# ---------------------------------------------------------------------------
# Scalar (Python int) reference implementation — host-side witness
# generation and exactness tests.
# ---------------------------------------------------------------------------

_P = gl.P_INT
_MDS_INT = [[int(_MDS[r, c]) for c in range(SPONGE_WIDTH)] for r in range(SPONGE_WIDTH)]


def _sbox_s(x: int) -> int:
    x2 = x * x % _P
    x3 = x2 * x % _P
    return x3 * x3 % _P * x % _P


def permute_s(state):
    """Scalar reference permutation over a length-12 list of ints."""
    state = [int(x) for x in state]
    for rnd in range(N_ROUNDS):
        rcs = ALL_ROUND_CONSTANTS[rnd * SPONGE_WIDTH : (rnd + 1) * SPONGE_WIDTH]
        state = [(s + c) % _P for s, c in zip(state, rcs)]
        if rnd < HALF_N_FULL_ROUNDS or rnd >= HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS:
            state = [_sbox_s(s) for s in state]
        else:
            state[0] = _sbox_s(state[0])
        state = [
            sum(m * s for m, s in zip(row, state)) % _P for row in _MDS_INT
        ]
    return state


def permute_host(state):
    """Scalar permutation dispatching to the native C++ accelerator when
    available (exact Python fallback otherwise)."""
    from ..native.loader import native_permute_batch

    out = native_permute_batch(np.array([state], dtype=np.uint64))
    if out is not None:
        return [int(x) for x in out[0]]
    return permute_s(state)


def hash_n_to_m_no_pad_s(inputs, num_outputs=4):
    inputs = [int(x) for x in inputs]
    if num_outputs == 4:
        from ..native.loader import native_hash_no_pad

        out = native_hash_no_pad(inputs)
        if out is not None:
            return list(out)
    state = [0] * SPONGE_WIDTH
    for start in range(0, len(inputs), SPONGE_RATE):
        chunk = inputs[start : start + SPONGE_RATE]
        state[: len(chunk)] = chunk
        state = permute_s(state)
    return state[:num_outputs]


def hash_no_pad_s(inputs):
    return hash_n_to_m_no_pad_s(inputs, 4)


def hash_pad_s(inputs):
    inputs = [int(x) for x in inputs] + [1]
    while (len(inputs) + 1) % SPONGE_WIDTH != 0:
        inputs.append(0)
    inputs.append(1)
    return hash_no_pad_s(inputs)


def two_to_one_s(left, right):
    return hash_no_pad_s(list(left) + list(right))
