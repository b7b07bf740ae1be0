"""intmax_zkp_core_tpu — a TPU-native (JAX/XLA/Pallas) ZK-rollup proving framework.

A from-scratch rebuild of the capabilities of
``InternetMaximalism/intmax-zkp-core`` (reference: pure-Rust on top of a
plonky2 fork).  Two halves:

* the *engine* (Goldilocks field, Poseidon-12, NTT/LDE, FRI, Plonk-style
  circuit builder / prover / verifier, recursion) — rebuilt as batched
  JAX/Pallas kernels (the reference outsources this to the plonky2 dep,
  see reference ``Cargo.toml:11``);
* the *application layer* (sparse Merkle trees with process proofs, rollup
  circuits: user transaction merge+purge, zkDSA signatures, block
  production, recursive aggregation) — semantics match the reference
  (``src/sparse_merkle_tree/``, ``src/transaction/``, ``src/rollup/``,
  ``src/zkdsa/``).

Layout:
  ops/       TPU kernels: field arithmetic, Poseidon, NTT, Merkle hashing
  engine/    proving system: circuit IR, prover, verifier, FRI, transcript
  models/    application circuits: SMT, zkdsa, transaction, rollup, recursion
  parallel/  mesh / sharding / multi-chip NTT and proof aggregation
  utils/     hex codecs, wrapped digest types
"""

import os
import sys

import jax

# Goldilocks field elements are uint64; enable 64-bit types once, at import.
jax.config.update("jax_enable_x64", True)

# Tracing a Pallas kernel from inside the prover's call stack nests JAX's
# recursive tracers past CPython's default 1000-frame limit (observed:
# RecursionError in dtype promotion while tracing a BlockSpec index map
# mid-prove).  The graphs themselves are bounded; only the limit is low.
if sys.getrecursionlimit() < 10000:
    sys.setrecursionlimit(10000)

# Persistent compilation cache: the prover's jitted kernels are large; reuse
# compilations across processes (first TPU compile can take minutes).
_cache_dir = os.environ.get(
    "INTMAX_TPU_JAX_CACHE", os.path.expanduser("~/.cache/intmax_zkp_core_tpu_jax")
)
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # cache is best-effort
    pass

__version__ = "0.1.0"
