"""Multi-device NTT via the four-step (Bailey) algorithm with one
all-to-all stage exchange — the TPU-native analogue of plonky2's
rayon-parallel FFT (SURVEY §2.3).

Decompose i = i1*n2 + i2 (matrix [n1, n2], row-major), k = k2*n1 + k1:

  A[k1, i2] = sum_{i1} x[i1, i2] * (w^{n2})^{i1 k1}   column NTTs (size n1)
  B[k1, i2] = A[k1, i2] * w^{i2 k1}                    twiddle
  X[k2*n1 + k1] = sum_{i2} B[k1, i2] * (w^{n1})^{i2 k2}  row NTTs (size n2)

Sharding: the input matrix is sharded over columns (i2) so the column NTTs
are local; the stage exchange is one all-to-all re-sharding rows (k1);
the row NTTs are then local, and a final all-to-all transposes back to
natural order.  All collectives ride ICI via shard_map.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec
try:  # jax >= 0.8 top-level API; experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import goldilocks as gl
from ..ops import ntt as nt

P = gl.P_INT


@lru_cache(maxsize=32)
def _twiddle_matrix(log_n1: int, log_n2: int):
    """w^{i2*k1} as [n1, n2] numpy table."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    w = gl.primitive_root_of_unity(log_n1 + log_n2)
    out = np.empty((n1, n2), dtype=np.uint64)
    for k1 in range(n1):
        base = pow(w, k1, P)
        acc = 1
        for i2 in range(n2):
            out[k1, i2] = acc
            acc = acc * base % P
    return out


def can_shard(n: int, d: int) -> bool:
    """True if a length-n NTT four-step-decomposes with both factors
    divisible by the device count (n1 = 2^(log n//2))."""
    if n & (n - 1) or n <= 0:
        return False
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    return n1 % d == 0 and n2 % d == 0


def ntt_sharded_batch(x: jax.Array, mesh: Mesh, axis_name: str = "d") -> jax.Array:
    """Batched four-step NTT: ``[B, n]`` coefficient rows -> evaluations in
    natural order, sharded over the mesh on the domain axis.  The domain is
    viewed as an ``[n1, n2]`` matrix sharded over columns; column NTTs are
    local, one all-to-all re-shards to rows for the row NTTs, a second
    all-to-all transposes back.  Bit-identical to ``ops.ntt.ntt`` (exact
    modular arithmetic, canonical residues)."""
    B, n = x.shape
    d = mesh.shape[axis_name]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    log_n1 = log_n // 2
    n1 = 1 << log_n1
    n2 = n // n1
    assert n1 % d == 0 and n2 % d == 0, "n1 and n2 must be divisible by device count"

    tw = jnp.asarray(_twiddle_matrix(log_n1, log_n - log_n1))

    def local_fn(xm, twm):
        # xm: [B, n1, n2/d] — this device's column slice.  ntt_jnp, not
        # ntt: a Mosaic pallas_call must not be inlined into an
        # SPMD-partitioned shard_map graph (see ops/ntt.ntt_jnp).
        a = jnp.transpose(nt.ntt_jnp(jnp.transpose(xm, (0, 2, 1))), (0, 2, 1))
        b = gl.mul(a, twm[None])
        b = jax.lax.all_to_all(b, axis_name, split_axis=1, concat_axis=2, tiled=True)
        c = nt.ntt_jnp(b)  # row NTTs on [B, n1/d, n2]
        c = jax.lax.all_to_all(c, axis_name, split_axis=2, concat_axis=1, tiled=True)
        # natural order k = k2*n1 + k1 within the local k2 slice
        return jnp.transpose(c, (0, 2, 1)).reshape(B, -1)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(PSpec(None, None, axis_name), PSpec(None, axis_name)),
        out_specs=PSpec(None, axis_name),
        check_vma=False,
    )
    return fn(x.reshape(B, n1, n2), tw)


def coset_lde_sharded(
    a: jax.Array,
    rate_bits: int,
    mesh: Mesh,
    shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
    axis_name: str = "d",
) -> jax.Array:
    """Sharded counterpart of ``ops.ntt.coset_lde``: ``[B, n]`` coefficient
    rows -> evaluations on the shifted 2^rate_bits-blowup coset, computed
    with the four-step all-to-all NTT so one huge LDE spreads across the
    mesh (the prover's ``_commit`` uses this above a size threshold)."""
    B, n = a.shape
    lde_n = n << rate_bits
    powers = jnp.asarray(nt._shift_powers(n, shift % P))
    shifted = gl.mul(a, powers)
    padded = jnp.zeros((B, lde_n), dtype=jnp.uint64)
    padded = padded.at[:, :n].set(shifted)
    return ntt_sharded_batch(padded, mesh, axis_name)


def ntt_sharded(x: jax.Array, mesh: Mesh, axis_name: str = "d") -> jax.Array:
    """Single-polynomial NTT of length n = n1*n2 over an n-device-sharded
    domain; returns evaluations in natural order, sharded over the mesh."""
    n = x.shape[-1]
    d = mesh.shape[axis_name]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    # choose n1 = d * k rows so both the column dim and row dim shard evenly
    log_n1 = log_n // 2
    n1 = 1 << log_n1
    n2 = n // n1
    assert n1 % d == 0 and n2 % d == 0, "n1 and n2 must be divisible by device count"

    tw = jnp.asarray(_twiddle_matrix(log_n1, log_n - log_n1))

    def local_fn(xm, twm):
        # xm: [n1, n2/d] — this device's column slice
        # column NTTs of size n1: transpose to batch over local columns
        a = nt.ntt_jnp(jnp.transpose(xm))  # [n2/d, n1]
        a = jnp.transpose(a)  # [n1, n2/d]
        b = gl.mul(a, twm)
        # stage exchange: reshard from column slices (i2) to row slices (k1)
        b = jax.lax.all_to_all(b, axis_name, split_axis=0, concat_axis=1, tiled=True)
        # row NTTs of size n2 on [n1/d, n2]
        c = nt.ntt_jnp(b)
        # transpose back: reshard rows (k1) -> columns (k2); [n1, n2/d]
        c = jax.lax.all_to_all(c, axis_name, split_axis=1, concat_axis=0, tiled=True)
        # natural order k = k2*n1 + k1: transpose the local [n1, k2-slice]
        return jnp.transpose(c).reshape(-1)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(PSpec(None, axis_name), PSpec(None, axis_name)),
        out_specs=PSpec(axis_name),
        check_vma=False,
    )
    xm = x.reshape(n1, n2)
    return fn(xm, tw)
