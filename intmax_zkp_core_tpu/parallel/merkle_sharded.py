"""Mesh-sharded Merkle-tree construction for the prover's commitments.

SURVEY §2.3's tree/collective axis: the TPU analogue of plonky2's
rayon-parallel Merkle hashing (reference ``Cargo.toml:16,20``).  Inside
``engine.prover._commit`` the leaves arrive sharded over the evaluation
domain (contiguous blocks per device — the four-step NTT's natural
output), so each device Poseidon-hashes its own leaf block and folds the
subtree over it locally; only the d block roots cross the interconnect
(one [d, 4] all_gather), after which the few top levels are computed
replicated.  No full-size array is ever gathered: the expensive work —
leaf hashing (the LDE row count × a Poseidon sponge) and virtually all
two_to_one folds — stays on the shard that already holds the data, which
is what makes the sharded LDE's win survive through the commitment
instead of being paid back by an implicit gather at the tree step.

Pairing is the plain even/odd fold of ``ops.merkle.build_merkle_levels``;
since blocks are contiguous powers of two, no pair ever crosses a device
boundary and every level is bit-identical to the single-device builder
(asserted by tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PSpec

try:  # jax >= 0.8 top-level API; experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import merkle as mk
from ..ops import poseidon as ps

# observability hook for tests: bumped on every sharded-tree build
SHARDED_TREE_CALLS = 0


def can_shard_tree(n: int, d: int, cap_height: int) -> bool:
    """True if n leaves split into d contiguous power-of-two blocks that
    cover the cap level (cap nodes must not be finer than one per leaf)."""
    if n <= 0 or n & (n - 1) or d <= 1:
        return False
    if n % d or (n // d) & (n // d - 1):
        return False
    return n >= (1 << cap_height) and n > d


def build_merkle_levels_sharded(
    leaves: jax.Array, cap_height: int, mesh: Mesh, axis_name: str = "d"
) -> list:
    """[n, w] leaf rows (sharded or shardable over rows) -> device-resident
    tree levels, like ``ops.merkle.build_merkle_levels`` but with hashing
    and folding sharded over ``mesh``.  Levels of global size >= max(d,
    2^cap_height) come back sharded over the mesh axis; any smaller top
    levels are replicated (they are at most [d, 4])."""
    global SHARDED_TREE_CALLS
    n, w = leaves.shape
    d = mesh.shape[axis_name]
    assert can_shard_tree(n, d, cap_height), (n, d, cap_height)
    cap_n = 1 << cap_height
    lowest_sharded = max(d, cap_n)
    n_sharded_levels = (n // lowest_sharded).bit_length()
    n_top_levels = 0 if cap_n >= d else (d // cap_n).bit_length() - 1

    def local_fn(lv):
        digs = mk.hash_leaves(lv)
        levels = [digs]
        while levels[-1].shape[0] * d > lowest_sharded:
            cur = levels[-1]
            levels.append(ps.two_to_one(cur[0::2], cur[1::2]))
        if n_top_levels == 0:
            return tuple(levels)
        # one tiny collective: the d block roots ([d, 4]); the top levels
        # fold replicated on every device
        roots = jax.lax.all_gather(levels[-1], axis_name).reshape(d, 4)
        top = []
        cur = roots
        while cur.shape[0] > cap_n:
            cur = ps.two_to_one(cur[0::2], cur[1::2])
            top.append(cur)
        return tuple(levels) + tuple(top)

    out_specs = tuple([PSpec(axis_name, None)] * n_sharded_levels) + tuple(
        [PSpec(None, None)] * n_top_levels
    )
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(PSpec(axis_name, None),),
        out_specs=out_specs,
        check_vma=False,
    )
    SHARDED_TREE_CALLS += 1
    return list(fn(leaves))
