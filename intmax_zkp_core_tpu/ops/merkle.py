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


@dataclass
class DeviceMerkleTree:
    """Merkle tree whose levels stay DEVICE-resident; only the cap (which
    the Fiat-Shamir transcript needs on host) is fetched eagerly.

    Rationale: a commitment tree over a [2^18, 135] LDE is ~300 MB of
    levels+leaves, but a proof only ever touches ~num_query_rounds leaf
    rows and auth paths (a few KB).  Fetching the whole tree made
    ``commit_wires`` 18 s at the tunnel's healthy ~16 MB/s and 450+ s
    when the relay is congested, vs ~0.7 s of actual device compute
    (docs/perf_notes.md round-3 notes).  Query-time extraction gathers
    just the touched digests on device (``path_gathers``) and rides one
    tiny combined fetch.

    The host-levels ``MerkleTree`` remains the CPU-backend default,
    where transfers are free."""

    levels_dev: list  # device [m_i, 4], levels_dev[0] = leaf digests
    cap_height: int
    cap_np: np.ndarray = None

    @property
    def cap(self) -> np.ndarray:
        return self.cap_np

    @property
    def levels(self):  # duck-type the parts of MerkleTree that only
        return self.levels_dev  # need shapes (e.g. fri.query bookkeeping)

    def path_gathers(self, indices) -> list:
        """Device gathers of the sibling digests for each query index:
        returns a list over levels of [nq, 4] device arrays (excluding
        the cap).  Combine across trees with one ``fetch_arrays``.

        Under serving mode the whole per-level gather chain runs as ONE
        AOT-cached program per tree shape (the eager loop issues one
        tiny program per level whose per-process loads add up through
        the remote backend)."""
        if _fused_hash_enabled():
            idx_dev = jnp.asarray(np.array(indices, dtype=np.int64))
            fn = _fused("tree_paths", _paths_impl, hashes=False)
            return list(fn(idx_dev, *self.levels_dev[:-1]))
        # np.array (not asarray): >>= below mutates, callers reuse indices
        idx = np.array(indices, dtype=np.int64)
        out = []
        for level in self.levels_dev[:-1]:
            out.append(jnp.take(level, jnp.asarray(idx ^ 1), axis=0))
            idx >>= 1
        return out

    def open_gathers(self, indices) -> list:
        """[leaf rows at ``indices``] + ``path_gathers``: the full query
        opening of this tree as device gathers, fused into one program
        per tree shape under serving mode."""
        if _fused_hash_enabled():
            idx_dev = jnp.asarray(np.array(indices, dtype=np.int64))
            fn = _fused("tree_open", _open_impl, hashes=False)
            return list(fn(idx_dev, *self.levels_dev[:-1]))
        idx = np.asarray(indices, dtype=np.int64)
        return [jnp.take(self.levels_dev[0], jnp.asarray(idx), axis=0)] + (
            self.path_gathers(indices)
        )

    @staticmethod
    def paths_from_fetched(fetched: list, indices) -> list:
        """Rebuild per-query path lists from the host arrays that
        ``path_gathers`` produced (after fetching): returns, per query
        index, a list of 4-tuples from leaf level up."""
        nq = len(indices)
        return [
            [tuple(int(x) for x in lv[k]) for lv in fetched]
            for k in range(nq)
        ]


def device_merkle_tree(leaf_data, cap_height: int) -> DeviceMerkleTree:
    """Like ``build_merkle_tree`` but fetches ONLY the cap."""
    levels_dev = build_merkle_levels(leaf_data, cap_height)
    cap_np = fetch_arrays(levels_dev[-1])[0]
    return DeviceMerkleTree(levels_dev=levels_dev, cap_height=cap_height, cap_np=cap_np)


def hash_leaves(leaf_data: jnp.ndarray) -> jnp.ndarray:
    """[n, leaf_width] -> [n, 4] digests.

    Matches plonky2's hash_or_noop: a leaf of width <= 4 is used directly
    (zero-padded), wider leaves are hash_no_pad'ed.
    """
    n, width = leaf_data.shape
    if width <= 4:
        out = jnp.zeros((n, 4), dtype=jnp.uint64)
        return out.at[:, :width].set(leaf_data)
    if _fused_hash_enabled() and not isinstance(leaf_data, jax.core.Tracer):
        return _fused("merkle_leaves", ps.hash_no_pad)(leaf_data)
    return ps.hash_no_pad(leaf_data)


def _paths_impl(idx, *levels):
    out = []
    cur = idx
    for level in levels:
        out.append(jnp.take(level, cur ^ 1, axis=0))
        cur = cur >> 1
    return tuple(out)


def _open_impl(idx, *levels):
    return (jnp.take(levels[0], idx, axis=0),) + _paths_impl(idx, *levels)


def _fused_hash_enabled() -> bool:
    """Serving mode: fuse each tree level's reshape + sponge into ONE
    AOT-cached program per level shape (inside: the Pallas permutation).
    The eager path issues ~5 tiny programs per level whose per-process
    loads dominate fresh-process tree building through the remote
    backend (~0.1-1 s each x hundreds of shapes); the fused programs are
    keyed stably by (name, shapes) in the executable cache, so a warm
    process loads ~18 programs total for all trees."""
    import jax as _jax

    from ..runtime import poseidon_pallas_enabled

    return _jax.default_backend() != "cpu" and poseidon_pallas_enabled()


def _fused(name: str, fn, hashes: bool = True):
    from .pallas_aot import aot_kernel

    # The AOT key does not hash the jaxpr, so every env flag that changes
    # the traced graph must appear in the statics (ADVICE round 4): the
    # hashing entries embed the Pallas permutation, whose MDS layer is
    # selected by INTMAX_TPU_POSEIDON_MXU at trace time.  (The Pallas-
    # vs-jnp choice itself is fixed True here by ``_fused_hash_enabled``.)
    # Pure gather entries (tree_paths/tree_open) have no flag dependence.
    statics: tuple = ()
    if hashes:
        from .poseidon_pallas import _mxu_enabled

        statics = ("mxu", _mxu_enabled())
    return aot_kernel(name, lambda: fn, statics)


def _level_two_to_one(cur):
    """One tree level: [m, 4] digests -> [m/2, 4].

    Siblings are ADJACENT rows, so the pair table is a free reshape
    [m, 4] -> [m/2, 8] (no strided gather), and the sponge runs through
    the eager ``hash_no_pad`` path whose permutation dispatch buckets the
    batch shape — ALL tree levels of all trees in the process share the
    same ~7 bucketed permutation programs.  (The previous per-level-shape
    jit compiled one program per level: ~14 programs per tree height,
    each costing 10-80 s of per-process first-call load through the
    remote backend — docs/perf_notes.md round 3; under serving mode the
    level is one fused AOT-cached program instead, see
    ``_fused_hash_enabled``.)"""
    m = cur.shape[0]
    if _fused_hash_enabled() and not isinstance(cur, jax.core.Tracer):
        return _fused("merkle_level", _level_impl)(cur)
    return ps.hash_no_pad(cur.reshape(m // 2, 8))


def _level_impl(cur):
    return ps.hash_no_pad(cur.reshape(cur.shape[0] // 2, 8))


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


def _level_two_to_one_batch(cur):
    """Batched tree level: [K, m, 4] -> [K, m/2, 4] (see
    ``_level_two_to_one`` — adjacent-pair reshape + bucketed sponge)."""
    K, m, _ = cur.shape
    half = m // 2
    if _fused_hash_enabled() and not isinstance(cur, jax.core.Tracer):
        return _fused("merkle_level_batch", _level_batch_impl)(cur)
    return ps.hash_no_pad(cur.reshape(K * half, 8)).reshape(K, half, 4)


def _level_batch_impl(cur):
    K, m, _ = cur.shape
    half = m // 2
    return ps.hash_no_pad(cur.reshape(K * half, 8)).reshape(K, half, 4)


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
