"""Dense-Merkle gadget tests: in-circuit root-from-proof and
root-from-all-leaves vs the out-of-circuit tree, prove + verify (mirrors
reference ``src/merkle_tree/gadgets/mod.rs:113-172``)."""

import pytest

from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.engine.witness import PartialWitness
from intmax_zkp_core_tpu.models.merkle_tree.gadgets import (
    MerkleProofTarget,
    get_merkle_root_target_from_leaves,
)
from intmax_zkp_core_tpu.models.merkle_tree.tree import (
    get_merkle_proof_with_zero,
    get_merkle_root,
)
from intmax_zkp_core_tpu.utils.hash_out import HashOut

DEPTH = 4


def tiny_config():
    return CircuitConfig(fri=FriConfig(num_query_rounds=4, proof_of_work_bits=2))


def leaves(n):
    return [HashOut.from_u32(100 + i) for i in range(n)]


@pytest.fixture(scope="module")
def proof_circuit():
    builder = CircuitBuilder(tiny_config())
    target = MerkleProofTarget.add_virtual_to(builder, DEPTH)
    builder.register_public_inputs(list(target.root))
    data = builder.build()
    return data, target


def test_merkle_proof_gadget_matches_tree(proof_circuit):
    """Prove in-circuit root recomputation for several indices of a
    partially filled tree (sibling-always-right rule above the filled
    prefix, ``merkle_tree/tree.rs:67-91``)."""
    data, target = proof_circuit
    ls = leaves(5)  # partially filled depth-4 tree (16 slots)
    for index in (0, 3, 4):
        proof = get_merkle_proof_with_zero(ls, index, DEPTH, HashOut.ZERO)
        pw = PartialWitness()
        root = target.set_witness(pw, proof.index, proof.value, proof.siblings)
        assert root == proof.root
        assert get_merkle_root(proof.index, proof.value, proof.siblings) == proof.root
        p = data.prove(pw)
        data.verify(p)
        assert tuple(p.public_inputs) == tuple(proof.root)


def test_merkle_proof_index_overflow_raises():
    """Out-of-range index is rejected."""
    ls = leaves(5)
    with pytest.raises(AssertionError):
        get_merkle_proof_with_zero(ls, 11, DEPTH, HashOut.ZERO)


def test_merkle_proof_depth_overflow_raises():
    """More leaves than the depth can hold is rejected (mirrors the
    reference's should_panic overflow test, ``merkle_tree/tree.rs:130-196``:
    6 leaves in a depth-2 tree trip the ``len(nodes) <= 1 << depth``
    assertion)."""
    with pytest.raises(AssertionError):
        get_merkle_proof_with_zero(leaves(6), 5, 2, HashOut.ZERO)


def test_merkle_root_from_leaves_matches_tree():
    """Root reduction over all leaves (``gadgets/mod.rs:90-111``) equals the
    out-of-circuit zero-padded tree root when the leaf count is a power of
    two (the gadget duplicates odd tails, the tree pads with zeros — they
    agree exactly on full layers)."""
    builder = CircuitBuilder(tiny_config())
    ls = leaves(8)
    leaf_ts = [builder.constant_hash(l) for l in ls]
    root_t = get_merkle_root_target_from_leaves(builder, leaf_ts)
    builder.register_public_inputs(list(root_t))
    data = builder.build()
    p = data.prove(PartialWitness())
    data.verify(p)
    want = get_merkle_proof_with_zero(ls, 0, 3, HashOut.ZERO).root
    assert tuple(p.public_inputs) == tuple(want)
