"""In-circuit SMT gadget tests: one circuit, witnesses from real tree ops of
every role (insert/update/delete/noop), prove + verify (mirrors reference
``gadgets/process/mod.rs`` / ``gadgets/verify`` tests at small depth)."""

import pytest

from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.engine.witness import PartialWitness
from intmax_zkp_core_tpu.models.sparse_merkle_tree import SparseMerkleTree
from intmax_zkp_core_tpu.models.sparse_merkle_tree.gadgets import (
    SparseMerkleInclusionProofTarget,
    SparseMerkleProcessProofTarget,
)
from intmax_zkp_core_tpu.utils.hash_out import HashOut

N_LEVELS = 8


def tiny_config():
    return CircuitConfig(fri=FriConfig(num_query_rounds=4, proof_of_work_bits=2))


def key(i):
    return HashOut.from_u32(i)


def val(i):
    return HashOut.from_u32(i)


def make_proofs():
    tree = SparseMerkleTree()
    p_ins = tree.set(key(1), val(10))  # insert into empty (is_old0)
    p_ins2 = tree.set(key(2), val(20))  # insert next to a leaf
    p_upd = tree.set(key(1), val(11))  # update
    p_del = tree.set(key(2), HashOut.ZERO)  # delete
    p_noop = tree.set(key(5), HashOut.ZERO)  # noop
    incl = tree.find(key(1))  # inclusion
    excl = tree.find(key(7))  # exclusion
    return [p_ins, p_ins2, p_upd, p_del, p_noop], incl, excl


@pytest.fixture(scope="module")
def process_circuit():
    builder = CircuitBuilder(tiny_config())
    target = SparseMerkleProcessProofTarget.add_virtual_to(builder, N_LEVELS)
    builder.register_public_inputs(list(target.old_root))
    builder.register_public_inputs(list(target.new_root))
    data = builder.build()
    return data, target


def test_process_gadget_all_roles(process_circuit):
    data, target = process_circuit
    proofs, _, _ = make_proofs()
    for p in proofs:
        pw = PartialWitness()
        target.set_witness(pw, p)
        proof = data.prove(pw)
        assert proof.public_inputs[:4] == list(p.old_root.elements)
        assert proof.public_inputs[4:8] == list(p.new_root.elements)
        data.verify(proof)


def test_process_gadget_rejects_bad_witness(process_circuit):
    data, target = process_circuit
    proofs, _, _ = make_proofs()
    p = proofs[1]
    import copy

    bad = copy.deepcopy(p)
    bad.new_value = HashOut.from_u32(999)  # inconsistent with new_root
    pw = PartialWitness()
    target.set_witness(pw, bad)
    with pytest.raises(AssertionError):
        data.prove(pw)  # constraint violation surfaces as witness conflict
