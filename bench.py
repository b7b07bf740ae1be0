"""Benchmark: batched Poseidon permutation throughput on the current JAX
backend (the framework's dominant primitive — every SMT node, Merkle cap,
transcript challenge and in-circuit hash gate is this permutation).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference (intmax-zkp-core, Rust/plonky2) publishes no
numbers (BASELINE.md); plonky2's CPU Poseidon is commonly measured around
~1.2 us/permutation single-thread on server-class x86 (~0.8e6 perm/s).
vs_baseline is measured against that reference-class figure.
"""

import json
import time

import numpy as np

REFERENCE_CPU_HASHES_PER_S = 0.8e6


def main():
    import jax
    import jax.numpy as jnp

    from intmax_zkp_core_tpu.ops import poseidon as ps

    batch = 1 << 15
    rng = np.random.default_rng(7)
    states = jnp.asarray(
        rng.integers(0, 0xFFFFFFFF00000001, size=(batch, 12), dtype=np.uint64)
    )

    fn = jax.jit(ps.permute)
    # warm-up / compile
    fn(states).block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    out = states
    for _ in range(iters):
        out = fn(out)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    hashes_per_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "poseidon_permutations_per_s",
                "value": round(hashes_per_s, 1),
                "unit": "perm/s",
                "vs_baseline": round(hashes_per_s / REFERENCE_CPU_HASHES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
