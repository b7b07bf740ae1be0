"""Circuit serialization: a built circuit pickles (declarative witness
generators, engine/generators.py), reloads in-place, and produces
bit-identical proofs; the on-disk cache (engine/circuit_cache.py) round-trips
through load_or_build.  The reference's plonky2 dependency offers CircuitData
serialization; this is the TPU build's counterpart."""

import dataclasses
import pickle

from intmax_zkp_core_tpu.engine.circuit_cache import load_or_build
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.models.sparse_merkle_tree import SparseMerkleTree
from intmax_zkp_core_tpu.models.sparse_merkle_tree.node_data import (
    NodeDataMemory,
    RootDataTmp,
)
from intmax_zkp_core_tpu.models.zkdsa.circuits import make_simple_signature_circuit
from intmax_zkp_core_tpu.utils.hash_out import HashOut

CFG = CircuitConfig(fri=FriConfig(num_query_rounds=3, proof_of_work_bits=2))


def _proof_fields(proof):
    return (
        proof.public_inputs,
        proof.wires_cap,
        proof.zs_pp_cap,
        proof.quotient_cap,
        proof.openings,
        dataclasses.asdict(proof.fri),
        proof.initial_openings,
    )


def test_pickled_circuit_proves_bit_identically():
    circ = make_simple_signature_circuit(CFG)
    sk, msg = HashOut.from_u64(42), HashOut.from_u64(0xABCDEF)
    p1 = circ.prove(sk, msg)
    circ.verify(p1)

    reloaded = pickle.loads(pickle.dumps(circ))
    # the commitment tables survive the round-trip and re-verify vs the cap
    assert (reloaded.data.prover.cs_lde == circ.data.prover.cs_lde).all()
    p2 = reloaded.prove(sk, msg)
    reloaded.verify(p2)
    assert _proof_fields(p1) == _proof_fields(p2)


def test_pickled_circuit_covers_all_engine_generator_kinds(tmp_path):
    """An SMT-process circuit exercises split_le / poseidon / arith /
    inv_or_zero generator records through a pickle round-trip."""
    from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
    from intmax_zkp_core_tpu.engine.witness import PartialWitness
    from intmax_zkp_core_tpu.models.sparse_merkle_tree.gadgets.process import (
        SparseMerkleProcessProofTarget,
    )

    builder = CircuitBuilder(CFG)
    target = SparseMerkleProcessProofTarget.add_virtual_to(builder, n_levels=8)
    data = builder.build()
    kinds = {rec[0] for rec in data.prover.generators if isinstance(rec, tuple)}
    assert {"split_le", "poseidon", "arith", "inv_or_zero"} <= kinds
    assert all(isinstance(rec, tuple) for rec in data.prover.generators)

    tree = SparseMerkleTree(NodeDataMemory(), RootDataTmp())
    proof = tree.set(HashOut.from_u128(5), HashOut.from_u128(77))
    reloaded_data = pickle.loads(pickle.dumps(data))
    for d in (data, reloaded_data):
        pw = PartialWitness()
        target.set_witness(pw, proof)
        d.check_witness(pw)


def test_load_or_build_cache_roundtrip(tmp_path):
    calls = []

    def build():
        calls.append(1)
        return make_simple_signature_circuit(CFG)

    from intmax_zkp_core_tpu.engine import circuit_cache

    c1 = load_or_build("zkdsa-test", CFG, build, directory=str(tmp_path))
    c2 = load_or_build("zkdsa-test", CFG, build, directory=str(tmp_path))
    assert len(calls) == 1 and c2 is c1, (
        "second load must hit the in-process memo"
    )
    # drop the memo: the third load must deserialize from disk
    circuit_cache._MEMO.clear()
    c3 = load_or_build("zkdsa-test", CFG, build, directory=str(tmp_path))
    assert len(calls) == 1 and c3 is not c1, "third load must come from disk"
    assert c3.data.common.circuit_digest == c1.data.common.circuit_digest
    sk, msg = HashOut.from_u64(3), HashOut.from_u64(9)
    p1, p3 = c1.prove(sk, msg), c3.prove(sk, msg)
    assert _proof_fields(p1) == _proof_fields(p3)
