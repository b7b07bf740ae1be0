"""On-disk circuit cache: build once, reload in any later process.

The reference rebuilds every circuit per process (plonky2 supports
serializing ``CircuitData``; the reference never uses it).  Here a built
circuit object — including the model-layer target structs and the full
``ProverCircuitData`` — pickles directly (witness generators are
declarative records, ``engine/generators.py``), so a prover service pays
the constraint-emission + preprocessing cost once per (circuit, config)
and every warm run starts from disk in seconds.

Enabled by pointing ``INTMAX_TPU_CIRCUIT_CACHE`` at a directory (callers
can also pass ``cache_dir``).  Cache keys must capture everything that
changes the circuit: callers pass a descriptive name plus the config, and
the block builder folds the inner circuits' digests into the name.  The
payload is framed with its sha256, verified on load, so a truncated or
corrupted file fails loudly instead of deserializing garbage.  The format
is pickle: this is a LOCAL build cache (same trust domain as the source
tree), never a channel for circuits from elsewhere — a verifier never
reads it, and a mismatched circuit yields proofs the verifier rejects.
"""

from __future__ import annotations

import hashlib
import os
import pickle

_MAGIC = b"IZCT1\n"  # format tag; bump when the framing changes

# in-process memo on top of the disk cache: a serving loop (bench.py's
# steady-state stage, a block-producer service) calls the flow repeatedly
# in one process, and re-unpickling the 32768-row block circuit cost
# ~1.5 s per run; reusing the object also keeps its attached device
# kernels (prover.get_circuit_kernels) and witness fill plan alive
_MEMO: dict = {}


def cache_dir() -> str | None:
    return os.environ.get("INTMAX_TPU_CIRCUIT_CACHE") or None


def _key_of(name: str, config) -> str:
    fri = config.fri
    return (
        f"{name}-w{config.num_wires}-r{config.num_routed_wires}"
        f"-c{config.num_challenges}-b{fri.rate_bits}-h{fri.cap_height}"
        f"-q{fri.num_query_rounds}-p{fri.proof_of_work_bits}"
    )


def load_or_build(name: str, config, build_fn, directory: str | None = None):
    """Return ``build_fn()``'s result, cached on disk under a key derived
    from ``name`` + the circuit config.  ``build_fn`` must be deterministic;
    the result must expose ``.data`` (a ``CircuitData``) or be one."""
    directory = directory or cache_dir()
    if directory is None:
        return build_fn()
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, _key_of(name, config) + ".ckt")
    memo = _MEMO.get(path)
    if memo is not None:
        return memo
    if os.path.exists(path):
        with open(path, "rb") as f:
            magic = f.read(len(_MAGIC))
            if magic == _MAGIC:
                stored = f.read(32)
                payload = f.read()
                if hashlib.sha256(payload).digest() != stored:
                    raise ValueError(
                        f"circuit cache file {path} is corrupted "
                        "(sha256 mismatch); delete it and rebuild"
                    )
                circuit = pickle.loads(payload)
                _MEMO[path] = circuit
                return circuit
        # unframed legacy file: ignore it and rebuild (overwritten below)
    circuit = build_fn()
    payload = pickle.dumps(circuit, protocol=pickle.HIGHEST_PROTOCOL)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(hashlib.sha256(payload).digest())
        f.write(payload)
    os.replace(tmp, path)
    _MEMO[path] = circuit
    return circuit
