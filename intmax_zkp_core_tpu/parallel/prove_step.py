"""Distributed proving primitives: the multi-chip step combining the three
TPU parallel axes of this framework (SURVEY §2.3):

* data parallelism — batched Poseidon permutations sharded over the mesh
  (hash/witness instances are embarrassingly parallel);
* intra-op parallelism — one large NTT via the four-step algorithm with
  all-to-all stage exchange;
* collective tree reduction — Merkle-cap construction: local tree hashing,
  then an all_gather of per-device roots folded into the global root.
"""

from __future__ import annotations

from functools import partial

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
from ..ops import poseidon as ps
from .ntt_sharded import ntt_sharded


def _local_merkle_root(digests):
    """[L, 4] -> [4] by repeated two_to_one (L a power of two, static)."""
    while digests.shape[0] > 1:
        digests = ps.two_to_one(digests[0::2], digests[1::2])
    return digests[0]


def make_distributed_prove_step(mesh: Mesh, axis_name: str = "d"):
    """Returns a jitted function (states [B, 12], poly [n]) ->
    (hashed [B, 12], evals [n], root [4]) with B and the NTT batch sharded
    over the mesh and the Merkle root reduced with collectives."""

    d = mesh.shape[axis_name]

    def local_hash_and_root(states):
        hashed = ps.permute_auto(states)  # [B/d, 12] (Pallas kernel on TPU)
        local_root = _local_merkle_root(hashed[:, :4])
        roots = jax.lax.all_gather(local_root, axis_name)  # [d, 4]
        root = _local_merkle_root(roots)
        return hashed, root

    hash_fn = shard_map(
        local_hash_and_root,
        mesh=mesh,
        in_specs=(PSpec(axis_name, None),),
        out_specs=(PSpec(axis_name, None), PSpec()),
        check_vma=False,
    )

    def step(states, poly):
        hashed, root = hash_fn(states)
        evals = ntt_sharded(poly, mesh, axis_name)
        return hashed, evals, root

    return jax.jit(step)
