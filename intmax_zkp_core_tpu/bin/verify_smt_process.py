"""Randomized in-circuit SMT-process prove loop (reference
``src/bin/verify_smt_process.rs:24-114``; reference runs endless at
N_LEVELS=256).

Usage: python -m intmax_zkp_core_tpu.bin.verify_smt_process [n_iters] [n_levels]
"""

from __future__ import annotations

import random
import sys
import time


def main(n_iters: int = 3, n_levels: int = 32) -> None:
    from ..engine.circuit import CircuitBuilder
    from ..engine.config import CircuitConfig
    from ..engine.witness import PartialWitness
    from ..models.sparse_merkle_tree import SparseMerkleTree
    from ..models.sparse_merkle_tree.gadgets import SparseMerkleProcessProofTarget
    from ..utils.hash_out import HashOut

    print(f"building SMT process circuit at n_levels={n_levels}", flush=True)
    t0 = time.time()
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    target = SparseMerkleProcessProofTarget.add_virtual_to(builder, n_levels)
    builder.register_public_inputs(list(target.old_root))
    builder.register_public_inputs(list(target.new_root))
    data = builder.build()
    print(f"built in {time.time() - t0:.1f}s; rows={data.common.n}", flush=True)

    rng = random.Random()
    tree = SparseMerkleTree()
    keys = []
    for i in range(n_iters):
        # keep keys within the first n_levels bits to stay provable
        key = HashOut.from_u32(rng.randrange(1 << min(n_levels - 1, 30)))
        keys.append(key)
        value = HashOut.rand()
        proof = tree.set(key, value)
        pw = PartialWitness()
        target.set_witness(pw, proof)
        t0 = time.time()
        zk_proof = data.prove(pw)
        data.verify(zk_proof)
        print(
            f"iter {i}: {proof.fnc.name} proved+verified in {time.time() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_levels = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    main(n_iters, n_levels)
