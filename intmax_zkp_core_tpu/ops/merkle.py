"""Batched Merkle-tree commitments with caps (TPU).

The prover commits to polynomial evaluation matrices by Merkle-hashing every
LDE row (leaf = all column values at one domain point) and reducing to a
2^cap_height cap — the plonky2 ``MerkleTree``/``MerkleCap`` shape the
reference relies on for every commitment (``constants_sigmas_cap`` is baked
into recursive verifier data, reference ``recursion/gadgets/mod.rs:85-100``).

All hashing is the batched Poseidon kernel: one ``hash_no_pad`` over [n,
leaf_width] for leaves, then log2(n) - cap_height rounds of batched
``two_to_one`` — each level one fused TPU dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import poseidon as ps


def fetch_arrays(*arrs) -> list:
    """Device -> host transfer of several arrays in ONE readback.

    Through a remote/tunneled backend every ``np.asarray(device_array)`` is
    a blocking round-trip, so fetching a Merkle tree level-by-level costs
    O(log n) RTTs.  Here all arrays are raveled and concatenated on device
    and read back with a single transfer, then split/reshaped on host.  On
    the CPU backend transfers are free, so the concat copy is skipped.
    """
    if any(not getattr(a, "is_fully_addressable", True) for a in arrs):
        # multi-process mesh: some shards live on other processes'
        # devices, so a plain np.asarray raises.  process_allgather
        # assembles the GLOBAL value on every process (each host then
        # runs the same transcript on identical data — SPMD).
        from jax.experimental import multihost_utils

        return [
            np.asarray(multihost_utils.process_allgather(a, tiled=True))
            for a in arrs
        ]
    if jax.default_backend() == "cpu" or len(arrs) == 1:
        return [np.asarray(a) for a in arrs]
    flat = jnp.concatenate([jnp.ravel(a) for a in arrs])
    flat_np = np.asarray(flat)
    out = []
    off = 0
    for a in arrs:
        size = int(np.prod(a.shape)) if a.ndim else 1
        out.append(flat_np[off : off + size].reshape(a.shape))
        off += size
    return out


@dataclass
class MerkleTree:
    """levels[0] = leaf digests [n, 4]; levels[-1] = cap [2^cap_height, 4].
    Kept as numpy for cheap host-side path extraction."""

    levels: list
    cap_height: int

    @property
    def cap(self) -> np.ndarray:
        return self.levels[-1]

    def prove(self, index: int) -> list:
        """Sibling digests from leaf level up to (excluding) the cap."""
        path = []
        for level in self.levels[:-1]:
            path.append(level[index ^ 1])
            index >>= 1
        return path


def hash_leaves(leaf_data: jnp.ndarray) -> jnp.ndarray:
    """[n, leaf_width] -> [n, 4] digests.

    Matches plonky2's hash_or_noop: a leaf of width <= 4 is used directly
    (zero-padded), wider leaves are hash_no_pad'ed.
    """
    n, width = leaf_data.shape
    if width <= 4:
        out = jnp.zeros((n, 4), dtype=jnp.uint64)
        return out.at[:, :width].set(leaf_data)
    return ps.hash_no_pad(leaf_data)


@jax.jit
def _level_two_to_one(cur):
    """One tree level: [m, 4] digests -> [m/2, 4].  Jitted as a unit so the
    strided even/odd gather, the absorb concatenate and the permutation fuse
    into ONE dispatch per level — and the compiled graph is keyed only on
    the level shape [m, 4], so every tree in the process (wires, zs_pp,
    quotient, constants for every circuit) shares the same per-level
    compilations."""
    return ps.two_to_one(cur[0::2], cur[1::2])


def build_merkle_levels(leaf_data, cap_height: int) -> list:
    """Device-resident tree levels (levels[0] = leaf digests, levels[-1] =
    cap).  The jit boundary is the LEVEL, not the single permutation (one
    fused dispatch per level, compilations shared across all same-width
    trees) and not the whole tree (which would recompile per (n, leaf_width)
    combination)."""
    leaf_data = jnp.asarray(leaf_data, dtype=jnp.uint64)
    n = leaf_data.shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    assert n >= 1 << cap_height
    levels_dev = [hash_leaves(leaf_data)]
    while levels_dev[-1].shape[0] > 1 << cap_height:
        levels_dev.append(_level_two_to_one(levels_dev[-1]))
    return levels_dev


def build_merkle_tree(leaf_data, cap_height: int) -> MerkleTree:
    """leaf_data: [n, leaf_width] uint64 (n a power of two >= 2^cap_height).

    All levels come back to host in one transfer (``fetch_arrays``)."""
    levels_dev = build_merkle_levels(leaf_data, cap_height)
    return MerkleTree(levels=fetch_arrays(*levels_dev), cap_height=cap_height)


@jax.jit
def _level_two_to_one_batch(cur):
    """Batched tree level: [K, m, 4] -> [K, m/2, 4] in one fused dispatch
    (see ``_level_two_to_one``)."""
    K, m, _ = cur.shape
    half = m // 2
    return ps.two_to_one(
        cur[:, 0::2].reshape(K * half, 4), cur[:, 1::2].reshape(K * half, 4)
    ).reshape(K, half, 4)


def build_merkle_levels_batch(leaf_data, cap_height: int) -> list:
    """Device-resident levels of K same-shape trees: leaf_data [K, m, w] ->
    list of [K, m_i, 4] arrays.  Every level hashes ALL K trees' nodes in
    one fused dispatch (the batch axis folds into the row axis), so the
    device cost of K trees is one tree's dispatch count."""
    leaf_data = jnp.asarray(leaf_data, dtype=jnp.uint64)
    K, m, w = leaf_data.shape
    assert m & (m - 1) == 0, "leaf count must be a power of two"
    assert m >= 1 << cap_height
    digests = hash_leaves(leaf_data.reshape(K * m, w)).reshape(K, m, 4)
    levels_dev = [digests]
    while levels_dev[-1].shape[1] > 1 << cap_height:
        levels_dev.append(_level_two_to_one_batch(levels_dev[-1]))
    return levels_dev


def trees_from_batch_levels(levels_np: list, cap_height: int) -> list:
    """Host [K, m_i, 4] level arrays -> K ``MerkleTree``s."""
    K = levels_np[0].shape[0]
    return [
        MerkleTree(levels=[lv[k] for lv in levels_np], cap_height=cap_height)
        for k in range(K)
    ]


def build_merkle_trees_batch(leaf_data, cap_height: int) -> list:
    """K independent same-shape trees in one pass (one host transfer):
    leaf_data [K, m, w].  Returns K ``MerkleTree``s."""
    levels_dev = build_merkle_levels_batch(leaf_data, cap_height)
    return trees_from_batch_levels(fetch_arrays(*levels_dev), cap_height)


def verify_merkle_proof(
    leaf_data, index: int, path: list, cap: np.ndarray
) -> bool:
    """Scalar verification (host): fold leaf up the path, compare to cap."""
    leaf = [int(x) for x in leaf_data]
    if len(leaf) <= 4:
        digest = tuple((leaf + [0, 0, 0, 0])[:4])
    else:
        digest = tuple(ps.hash_no_pad_s(leaf))
    for sibling in path:
        sib = tuple(int(x) for x in sibling)
        if index & 1:
            digest = tuple(ps.two_to_one_s(sib, digest))
        else:
            digest = tuple(ps.two_to_one_s(digest, sib))
        index >>= 1
    return digest == tuple(int(x) for x in cap[index])
