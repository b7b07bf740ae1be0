"""Native witness engine (native/witness_native.cpp): bit-exactness against
the Python WitnessFill oracle, including circuits that interleave native
records with Python-registered kinds (ECDSA bignum computes)."""

import numpy as np
import pytest

from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.engine.prover import compute_wire_matrix
from intmax_zkp_core_tpu.engine.witness import PartialWitness
from intmax_zkp_core_tpu.models.sparse_merkle_tree import SparseMerkleTree
from intmax_zkp_core_tpu.models.sparse_merkle_tree.gadgets.process import (
    SparseMerkleProcessProofTarget,
)
from intmax_zkp_core_tpu.models.sparse_merkle_tree.node_data import (
    NodeDataMemory,
    RootDataTmp,
)
from intmax_zkp_core_tpu.native.witness import native_witness_enabled
from intmax_zkp_core_tpu.utils.hash_out import HashOut

CFG = CircuitConfig(fri=FriConfig(num_query_rounds=3, proof_of_work_bits=2))

pytestmark = pytest.mark.skipif(
    not native_witness_enabled(), reason="native toolchain unavailable"
)


def _both_fills(data, pw, monkeypatch):
    w1, pi1 = compute_wire_matrix(data.prover, pw)
    monkeypatch.setenv("INTMAX_TPU_NATIVE_WITNESS", "0")
    w2, pi2 = compute_wire_matrix(data.prover, pw)
    monkeypatch.delenv("INTMAX_TPU_NATIVE_WITNESS")
    return (w1, pi1), (w2, pi2)


def test_smt_process_circuit_native_fill_bit_exact(monkeypatch):
    """Covers arith / split_le / poseidon / inv_or_zero records at depth 16."""
    builder = CircuitBuilder(CFG)
    target = SparseMerkleProcessProofTarget.add_virtual_to(builder, n_levels=16)
    data = builder.build()
    tree = SparseMerkleTree(NodeDataMemory(), RootDataTmp())
    tree.set(HashOut.from_u128(3), HashOut.from_u128(11))
    proof = tree.set(HashOut.from_u128(5), HashOut.from_u128(77))
    pw = PartialWitness()
    target.set_witness(pw, proof)
    (w1, pi1), (w2, pi2) = _both_fills(data, pw, monkeypatch)
    assert (w1 == w2).all() and pi1 == pi2


def test_ecdsa_circuit_interleaved_fill_bit_exact(monkeypatch):
    """u32_mul_add records interleaved with Python-registered ECDSA kinds:
    a nonnative modular multiply constrains x*y mod n256."""
    from intmax_zkp_core_tpu.models.ecdsa.account import N256
    from intmax_zkp_core_tpu.models.ecdsa.gadgets import (
        add_virtual_biguint,
        mul_nonnative,
        set_biguint_witness,
    )

    builder = CircuitBuilder(CFG)
    x = add_virtual_biguint(builder)
    y = add_virtual_biguint(builder)
    mul_nonnative(builder, x, y, N256)
    data = builder.build()
    pw = PartialWitness()
    set_biguint_witness(pw, x, 0xDEADBEEF12345678AABBCCDD)
    set_biguint_witness(pw, y, 0x1234567890ABCDEF55667788)
    (w1, pi1), (w2, pi2) = _both_fills(data, pw, monkeypatch)
    assert (w1 == w2).all() and pi1 == pi2
    data.check_witness(pw)


def test_native_fill_conflict_raises(monkeypatch):
    builder = CircuitBuilder(CFG)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    builder.connect(a, b)
    builder.register_public_inputs([a])
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 1)
    pw.set_target(b, 2)
    with pytest.raises(AssertionError, match="conflicting witness values"):
        compute_wire_matrix(data.prover, pw)
