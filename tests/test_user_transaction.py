"""User-transaction (merge+purge) circuit end-to-end test, mirroring the
reference's purge-gadget test flow (``purge/mod.rs:439-610``): remove an
asset from a user asset tree, insert it into the tx-diff tree, prove and
verify; merge slots padded with defaults."""

import pytest

from intmax_zkp_core_tpu.config import RollupConstants
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.models.sparse_merkle_tree import LayeredLayeredSparseMerkleTree
from intmax_zkp_core_tpu.models.transaction.circuits import (
    MergeAndPurgeTransition,
    MergeAndPurgeTransitionPublicInputs,
    make_user_proof_circuit,
)
from intmax_zkp_core_tpu.models.transaction.user_asset_tree import UserAssetTree
from intmax_zkp_core_tpu.models.zkdsa.account import Address
from intmax_zkp_core_tpu.utils.hash_out import HashOut
from intmax_zkp_core_tpu.utils.poseidon_host import two_to_one


def small_constants():
    return RollupConstants(
        log_max_n_users=3,
        log_max_n_txs=3,
        log_max_n_contracts=3,
        log_max_n_variables=3,
        log_n_txs=2,
        log_n_recipients=3,
        log_n_contracts=3,
        log_n_variables=3,
        n_registrations=1,
        n_diffs=1,
        n_merges=1,
        n_deposits=1,
        n_scroll_flags=1,
        n_polygon_flags=1,
        n_blocks=2,
    )


def test_user_transaction_purge_only():
    constants = small_constants()
    cfg = CircuitConfig(fri=FriConfig(num_query_rounds=4, proof_of_work_bits=2))
    circuit = make_user_proof_circuit(constants, cfg)

    merge_key = HashOut.from_u32(1)
    contract = HashOut.from_u32(3)
    variable = HashOut.from_u32(5)
    amount = HashOut.from_u32(10)
    recipient = HashOut.from_u32(2)

    # user asset tree: deposit the asset, then purge (remove) it
    user_tree = UserAssetTree()
    user_tree.set(merge_key, contract, variable, amount)
    old_user_asset_root = user_tree.get_root()
    purge_input = [user_tree.set(merge_key, contract, variable, HashOut.ZERO)]

    # tx diff tree: give the asset to the recipient
    diff_tree = LayeredLayeredSparseMerkleTree()
    purge_output = [diff_tree.set(recipient, contract, variable, amount)]
    diff_root = diff_tree.get_root()

    sender = Address(777)
    nonce = HashOut.from_u32(99)
    transition = MergeAndPurgeTransition(
        sender_address=sender,
        merge_witnesses=[],
        purge_input_witnesses=purge_input,
        purge_output_witnesses=purge_output,
        nonce=nonce,
        old_user_asset_root=old_user_asset_root,
    )
    proof = circuit.prove_transition(transition)
    pis = circuit.public_inputs(proof)
    assert pis.sender_address == sender
    assert pis.old_user_asset_root == old_user_asset_root
    assert pis.middle_user_asset_root == old_user_asset_root  # no merges
    assert pis.new_user_asset_root == user_tree.get_root()
    assert pis.diff_root == diff_root
    assert pis.tx_hash == two_to_one(diff_root, nonce)
    circuit.verify(proof)


def test_default_user_transaction_public_inputs():
    # circuits/mod.rs:203-247: default tx_hash = Poseidon(0 || 0)
    d = MergeAndPurgeTransitionPublicInputs.default()
    assert d.tx_hash == two_to_one(HashOut.ZERO, HashOut.ZERO)
    enc = d.encode()
    assert MergeAndPurgeTransitionPublicInputs.decode(enc) == d
