"""CI-sized RECURSIVE block production + batch proof.

The reference block circuit always verifies its inner user-tx and
signature proofs in-circuit (``rollup/circuits/mod.rs:450-489``) and the
batch circuit wraps n_blocks recursive block proofs
(``rollup/gadgets/batch/mod.rs:16-56``).  This test proves both paths
end-to-end at the smallest rollup shape (1 diff, 2 tx slots, no merges)
and a minimal FRI config — the full e2e scenario at reference constants
runs in ``bin/block_circuit.py``.
"""

import pytest

from intmax_zkp_core_tpu.config import LOG_MAX_N_BLOCKS, RollupConstants
from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.engine.witness import PartialWitness
from intmax_zkp_core_tpu.models.merkle_tree.tree import get_merkle_proof
from intmax_zkp_core_tpu.models.rollup.circuits import (
    BlockDetail,
    make_block_proof_circuit,
)
from intmax_zkp_core_tpu.models.rollup.gadgets.batch import BlockBatchTarget
from intmax_zkp_core_tpu.models.sparse_merkle_tree import (
    LayeredLayeredSparseMerkleTree,
    SparseMerkleTree,
)
from intmax_zkp_core_tpu.models.sparse_merkle_tree.node_data import (
    NodeDataMemory,
    RootDataTmp,
)
from intmax_zkp_core_tpu.models.transaction.block_header import (
    BlockHeader,
    get_block_hash,
)
from intmax_zkp_core_tpu.models.transaction.circuits import (
    MergeAndPurgeTransitionPublicInputs,
    make_user_proof_circuit,
)
from intmax_zkp_core_tpu.models.transaction.user_asset_tree import UserAssetTree
from intmax_zkp_core_tpu.models.zkdsa.account import private_key_to_account
from intmax_zkp_core_tpu.models.zkdsa.circuits import make_simple_signature_circuit
from intmax_zkp_core_tpu.utils.hash_out import HashOut


TINY = RollupConstants(
    log_max_n_users=3,
    log_max_n_txs=3,
    log_max_n_contracts=3,
    log_max_n_variables=3,
    log_n_txs=2,  # >= 2: the witness-side deposit digest folds 3 bridge roots
    log_n_recipients=3,
    log_n_contracts=3,
    log_n_variables=3,
    n_registrations=1,
    n_diffs=1,
    n_merges=1,
    n_deposits=1,
    n_scroll_flags=1,
    n_polygon_flags=1,
    n_blocks=1,
)
CFG = CircuitConfig(fri=FriConfig(num_query_rounds=1, proof_of_work_bits=0))


@pytest.fixture(scope="module")
def recursive_block_proof():
    """One sender, one diff (amounts conserved), signed approval — proven
    with the inner proofs verified IN-CIRCUIT."""
    constants, config = TINY, CFG
    user_circuit = make_user_proof_circuit(constants, config)
    sig_circuit = make_simple_signature_circuit(config)

    account = private_key_to_account(HashOut.from_u128(0xA11CE))
    nodes = NodeDataMemory()
    world_state_tree = SparseMerkleTree(NodeDataMemory(), RootDataTmp())
    asset_tree = UserAssetTree(nodes, RootDataTmp())
    diff_tree = LayeredLayeredSparseMerkleTree(nodes, RootDataTmp())

    merge_key = HashOut.from_u128(12)
    contract, variable = HashOut.from_u128(305), HashOut.from_u128(8012)
    recipient = HashOut.from_u128(407)
    amount = HashOut.from_u128(2053)

    asset_tree.set(merge_key, contract, variable, amount)
    world_state_tree.set(account.address.to_hash_out(), asset_tree.get_root())
    p_in = asset_tree.set(merge_key, contract, variable, HashOut.ZERO)
    p_out = diff_tree.set(recipient, contract, variable, amount)

    pw = PartialWitness()
    user_circuit.targets.set_witness(
        pw, account.address, [], [p_in], [p_out],
        HashOut.from_u128(777), p_in[0].old_root,
    )
    user_tx_proof = user_circuit.data.prove(pw)

    pw = PartialWitness()
    user_circuit.targets.set_witness(
        pw, type(account.address)(0), [], [], [], HashOut.ZERO, HashOut.ZERO
    )
    default_user_tx_proof = user_circuit.data.prove(pw)

    # previous block header (block 1, empty trees)
    prev_block_number = 1
    block_headers = [HashOut.ZERO]
    prev_header = BlockHeader(
        block_number=prev_block_number,
        prev_block_hash=HashOut.ZERO,
        block_headers_digest=get_merkle_proof(
            block_headers, prev_block_number - 1, LOG_MAX_N_BLOCKS
        ).root,
        transactions_digest=get_merkle_proof([], 0, constants.log_n_txs).root,
        deposit_digest=HashOut.ZERO,
        proposed_world_state_digest=world_state_tree.get_root(),
        approved_world_state_digest=world_state_tree.get_root(),
        latest_account_digest=HashOut.ZERO,
    )
    block_headers.append(get_block_hash(prev_header))

    # proposal: world-state transition to the sender's new asset root
    user_pis = MergeAndPurgeTransitionPublicInputs.decode(
        user_tx_proof.public_inputs
    )
    ws_proof = world_state_tree.set(
        account.address.to_hash_out(), user_pis.new_user_asset_root
    )
    proposal_root = world_state_tree.get_root()

    pw = PartialWitness()
    sig_circuit.targets.set_witness(pw, account.private_key, proposal_root)
    signature_proof = sig_circuit.data.prove(pw)
    pw = PartialWitness()
    sig_circuit.targets.set_witness(pw, HashOut.ZERO, HashOut.ZERO)
    default_signature_proof = sig_circuit.data.prove(pw)

    # approval: signed, so the world-state value stays the new root
    block_number = prev_block_number + 1
    latest_account_tree = SparseMerkleTree(NodeDataMemory(), RootDataTmp())
    latest_account_proof = latest_account_tree.set(
        account.address.to_hash_out(), HashOut.from_u32(block_number)
    )
    revert_proof = world_state_tree.set(
        account.address.to_hash_out(), user_pis.new_user_asset_root
    )

    block_circuit = make_block_proof_circuit(
        constants, user_circuit, sig_circuit, config, recursive=True
    )
    detail = BlockDetail(
        block_number=block_number,
        user_tx_proofs=[user_tx_proof],
        deposit_process_proofs=[],
        scroll_process_proofs=[],
        polygon_process_proofs=[],
        world_state_process_proofs=[ws_proof],
        world_state_revert_proofs=[revert_proof],
        received_signature_proofs=[signature_proof],
        latest_account_process_proofs=[latest_account_proof],
        block_headers_proof_siblings=get_merkle_proof(
            block_headers, prev_block_number, LOG_MAX_N_BLOCKS
        ).siblings,
        prev_block_header=prev_header,
    )
    block_proof = block_circuit.set_witness_and_prove(
        detail, default_user_tx_proof, default_signature_proof
    )
    block_circuit.verify(block_proof)
    return block_circuit, block_proof


def test_recursive_block_proof(recursive_block_proof):
    block_circuit, block_proof = recursive_block_proof
    # single public input: the Poseidon entry hash (rollup/circuits/mod.rs:603-604)
    assert block_proof.proof.public_inputs == list(
        block_proof.public_inputs.get_entry_hash().elements
    )
    assert block_circuit.targets.computed_block_header.block_number == 2


def test_batch_circuit_proves_one_block(recursive_block_proof):
    """1-block batch at n_blocks=1 (reference batch/mod.rs:16-56: unused
    slots are padded with the last proof, disabled — with one slot this
    exercises the enabled path)."""
    block_circuit, block_proof = recursive_block_proof
    builder = CircuitBuilder(CFG)
    batch = BlockBatchTarget.add_virtual_to(
        builder, block_circuit.data, TINY.n_blocks
    )
    batch_data = builder.build()
    pw = PartialWitness()
    batch.set_witness(pw, [block_proof.proof])
    batch_proof = batch_data.prove(pw)
    batch_data.verify(batch_proof)


def test_batch_circuit_pads_disabled_slot(recursive_block_proof):
    """n_blocks=2 batch fed ONE real block proof: the unused slot is padded
    with the last proof, disabled — the reference's padding rule
    (``rollup/gadgets/batch/mod.rs:16-56``; disabled proofs are still valid
    default proofs, ``recursion/gadgets/mod.rs:105-127``)."""
    block_circuit, block_proof = recursive_block_proof
    builder = CircuitBuilder(CFG)
    batch = BlockBatchTarget.add_virtual_to(builder, block_circuit.data, 2)
    batch_data = builder.build()
    pw = PartialWitness()
    batch.set_witness(pw, [block_proof.proof])  # slot 2: padded, disabled
    enabled = [pw.values[t.enabled.target] for t in batch.block_proofs]
    assert enabled == [1, 0]
    batch_proof = batch_data.prove(pw)
    batch_data.verify(batch_proof)
