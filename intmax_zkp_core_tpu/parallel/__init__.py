"""Multi-chip execution: device mesh helpers, sharded NTT (the four-step
all-to-all algorithm), and data-parallel proving primitives.

The reference has no distributed execution at all (its only parallelism is
rayon inside the prover, ``Cargo.toml:16,20``); these are the TPU-native
axes per SURVEY §2.3: batch parallelism over hash/witness instances,
intra-op parallelism for big NTTs, collective tree reductions for Merkle
caps, and proof-level parallelism across hosts."""

from .mesh import make_mesh  # noqa: F401
from .ntt_sharded import ntt_sharded  # noqa: F401
