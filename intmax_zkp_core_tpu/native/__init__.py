"""Native (C++) host-side kernels, built on demand with g++ and loaded via
ctypes.  The TPU compute path is JAX/Pallas; this covers the host runtime
around it — currently the Poseidon permutation that dominates witness
generation (SMT walks, transcript replay).  Falls back to the exact Python
implementation when a toolchain is unavailable."""

from .loader import native_hash_no_pad, native_permute_batch, native_available  # noqa: F401
