"""The proving engine: circuit IR, Plonk-style prover/verifier with FRI
commitments — the TPU-native rebuild of the plonky2 surface the reference
consumes (``CircuitBuilder``, ``CircuitData::prove/verify``,
``PartialWitness``, recursion)."""
