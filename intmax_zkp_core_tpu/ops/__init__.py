"""TPU compute kernels: Goldilocks field, Poseidon, NTT, Merkle hashing."""
