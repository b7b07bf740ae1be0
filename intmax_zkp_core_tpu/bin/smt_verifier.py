"""Randomized out-of-circuit SMT process-proof check loop (reference
``src/bin/smt_verifier.rs:6-36``).

Usage: python -m intmax_zkp_core_tpu.bin.smt_verifier [n_iters]
"""

from __future__ import annotations

import random
import sys


def main(n_iters: int = 10) -> None:
    from ..models.sparse_merkle_tree import SparseMerkleTree
    from ..utils.hash_out import HashOut

    rng = random.Random()
    tree = SparseMerkleTree()
    keys = []
    for i in range(n_iters):
        if keys and rng.random() < 0.3:
            key = rng.choice(keys)
        else:
            key = HashOut.rand()
            keys.append(key)
        value = HashOut.ZERO if rng.random() < 0.3 else HashOut.rand()
        proof = tree.set(key, value)
        proof.check()
        print(f"iter {i}: {proof.fnc.name} ok; root {tree.get_root().to_hex()[:18]}…")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
