"""Host-side Poseidon hashing over ``HashOut`` values.

Witness generation (SMT updates, block assembly) is pointer-chasing host
logic; it uses the exact scalar Poseidon here, while bulk hashing (tree
builds, prover commitments) uses the batched TPU kernels in
``ops.poseidon``.  A small cache keeps the ubiquitous zero-subtree chains
free (the reference recomputes them per call, e.g.
``src/merkle_tree/tree.rs:67-72``).
"""

from __future__ import annotations

from functools import lru_cache

from ..ops import poseidon as ps
from .hash_out import HashOut


@lru_cache(maxsize=1 << 16)
def _two_to_one_cached(left: tuple, right: tuple) -> tuple:
    return tuple(ps.two_to_one_s(list(left), list(right)))


def two_to_one(left: HashOut, right: HashOut) -> HashOut:
    return HashOut(_two_to_one_cached(left.elements, right.elements))


def hash_no_pad(inputs: list[int]) -> HashOut:
    return HashOut(tuple(ps.hash_no_pad_s([int(x) for x in inputs])))


def hash_pad(inputs: list[int]) -> HashOut:
    return HashOut(tuple(ps.hash_pad_s([int(x) for x in inputs])))


@lru_cache(maxsize=64)
def zero_subtree_root(level: int) -> HashOut:
    """Root of a depth-`level` all-zero-leaf subtree."""
    if level == 0:
        return HashOut.ZERO
    child = zero_subtree_root(level - 1)
    return two_to_one(child, child)
