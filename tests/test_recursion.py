"""True recursion: an outer circuit verifies an inner zkDSA proof fully
in-circuit (transcript replay, vanishing identity at zeta, FRI queries),
then the outer proof itself is proved and verified (mirrors reference
``recursion/gadgets/mod.rs:130-251``)."""

import copy

import pytest

from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.engine.witness import PartialWitness
from intmax_zkp_core_tpu.models.recursion.gadgets import RecursiveProofTarget
from intmax_zkp_core_tpu.models.zkdsa import make_simple_signature_circuit
from intmax_zkp_core_tpu.utils.hash_out import HashOut
from intmax_zkp_core_tpu.utils.poseidon_host import two_to_one

P = 0xFFFFFFFF00000001


@pytest.fixture(scope="module")
def recursive_setup():
    cfg = CircuitConfig(fri=FriConfig(num_query_rounds=3, proof_of_work_bits=2))
    inner = make_simple_signature_circuit(cfg)
    builder = CircuitBuilder(cfg)
    target = RecursiveProofTarget.add_virtual_to(builder, inner.data, in_circuit=True)
    builder.register_public_inputs(list(target.public_inputs))
    outer = builder.build()
    return cfg, inner, outer, target


def test_recursive_verification(recursive_setup):
    cfg, inner, outer, target = recursive_setup
    sk, msg = HashOut.from_u32(7), HashOut.from_u32(555)
    inner_proof = inner.prove(sk, msg)
    inner.verify(inner_proof)

    pw = PartialWitness()
    target.set_witness(pw, inner_proof, True)
    outer_proof = outer.prove(pw)
    # the outer proof carries the inner proof's public inputs through
    assert outer_proof.public_inputs == inner_proof.public_inputs
    assert outer_proof.public_inputs[8:12] == list(two_to_one(sk, msg).elements)
    outer.verify(outer_proof)


def test_recursive_verification_rejects_tampered_inner(recursive_setup):
    cfg, inner, outer, target = recursive_setup
    inner_proof = inner.prove(HashOut.from_u32(9), HashOut.from_u32(1))
    bad = copy.deepcopy(inner_proof)
    # claim a different signature public input
    bad.public_inputs[8] = (bad.public_inputs[8] + 1) % P
    pw = PartialWitness()
    target.set_witness(pw, bad, True)
    with pytest.raises(AssertionError):
        outer.prove(pw)
    # tampered FRI pow witness
    bad2 = copy.deepcopy(inner_proof)
    bad2.fri.pow_witness += 1
    pw = PartialWitness()
    target.set_witness(pw, bad2, True)
    with pytest.raises(AssertionError):
        outer.prove(pw)
