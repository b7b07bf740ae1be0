"""Proof-level parallelism.

The natural multi-host axis of this framework (SURVEY §2.3): the N user-tx
proofs + N signature proofs verified inside one block circuit are
embarrassingly parallel to *generate*, then aggregated by the block /
batch circuits.

On a multi-process deployment (``jax.distributed.initialize``), each
process proves its slice of transitions against its local devices and the
aggregator gathers proofs (they are plain JSON-serializable host objects —
``engine/serde.py``) before running the block circuit.  This module
provides the single-process building block: proving a list of independent
transitions, overlapping each proof's host phase (witness generation) with
the previous proof's device phase via a two-stage pipeline.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from ..engine.witness import PartialWitness


def prove_many(circuit, set_witness_fns: list) -> list:
    """Prove independent witnesses on one circuit.

    ``set_witness_fns``: callables ``f(pw) -> None`` filling a
    PartialWitness for each proof.  Host witness generation for proof i+1
    overlaps the device work of proof i (the device queue serializes the
    accelerator side while the Python side prepares the next witness).

    On accelerators the proofs are generated in ONE batched device pass
    (``engine.batch_prover.prove_batch``, bit-identical to sequential);
    the pipelined sequential path remains for CPU, where vmap-eager
    dispatch is slower than looping.
    """
    import jax

    n_dev = len(jax.devices())
    if len(set_witness_fns) > 1 and (jax.default_backend() != "cpu" or n_dev > 1):
        from ..engine.batch_prover import prove_batch

        pws = []
        for fn in set_witness_fns:
            pw = PartialWitness()
            fn(pw)
            pws.append(pw)
        if n_dev > 1:
            from .mesh import make_mesh

            return prove_batch(circuit.data, pws, mesh=make_mesh(n_dev))
        return prove_batch(circuit.data, pws)

    results: list = [None] * len(set_witness_fns)

    def prepare(i):
        pw = PartialWitness()
        set_witness_fns[i](pw)
        return pw

    with ThreadPoolExecutor(max_workers=2) as pool:
        next_pw = pool.submit(prepare, 0) if set_witness_fns else None
        for i in range(len(set_witness_fns)):
            pw = next_pw.result()
            if i + 1 < len(set_witness_fns):
                next_pw = pool.submit(prepare, i + 1)
            results[i] = circuit.data.prove(pw)
    return results
