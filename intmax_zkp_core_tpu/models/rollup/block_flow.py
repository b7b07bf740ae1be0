"""End-to-end block production flow — the counterpart of the reference's
flagship binary (``src/bin/block_circuit.rs:48-663``): two senders (one
transfer-only, one merging a deposit from the previous block), proposal +
approval, block assembly, and ``BlockInfo`` (the ``block1_info.json``
format).

``prove=False`` runs every circuit's witness through
``CircuitData.check_witness`` (all constraints evaluated on the subgroup)
instead of producing FRI proofs — the fast integration-test mode.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from ...config import LOG_MAX_N_BLOCKS, RollupConstants
from ...engine.config import CircuitConfig
from ...engine.witness import PartialWitness
from ...utils.hash_out import HashOut
from ...utils.poseidon_host import two_to_one
from ..merkle_tree.tree import get_merkle_proof
from ..recursion.gadgets import CheckedPublicInputs
from ..sparse_merkle_tree import (
    LayeredLayeredSparseMerkleTree,
    SparseMerkleInclusionProof,
    SparseMerkleTree,
)
from ..sparse_merkle_tree.node_data import NodeDataMemory, RootDataTmp
from ..transaction.block_header import BlockHeader, get_block_hash
from ..transaction.circuits import (
    MergeAndPurgeTransitionPublicInputs,
    make_user_proof_circuit,
)
from ..transaction.gadgets.merge import MergeProof
from ..transaction.user_asset_tree import UserAssetTree
from ..zkdsa.account import Address, private_key_to_account
from ..zkdsa.circuits import make_simple_signature_circuit
from .address_list import TransactionSenderWithValidity
from .block import BlockInfo
from .circuits import BlockDetail, make_block_proof_circuit
from .gadgets.deposit_block import DepositInfo, VariableIndex


@dataclass
class BlockFlowResult:
    block_info: BlockInfo
    block_detail: BlockDetail
    block_proof: object  # BlockProductionProofWithPublicInputs | public inputs
    user_tx_proofs: list
    block_circuit: object
    merge_proofs: list = None  # sender 2's deposit-merge witness bundle


def _prove_group(circuit, pws: list, prove: bool) -> list:
    """Prove several witnesses of one circuit: batched in one device pass
    on accelerators (engine/batch_prover — bit-identical to sequential),
    sharded over the device mesh when more than one device is attached
    (SURVEY §2.3 proof-level axis), sequential on single-device CPU where
    vmap-eager dispatch is slower."""
    if not prove:
        return [_prove_or_check(circuit, pw, prove) for pw in pws]
    import jax

    n_dev = len(jax.devices())
    if n_dev > 1 and len(pws) > 1:
        from ...engine.batch_prover import prove_batch
        from ...parallel.mesh import make_mesh

        return prove_batch(circuit.data, pws, mesh=make_mesh(n_dev))
    if jax.default_backend() != "cpu" and len(pws) > 1:
        from ...engine.batch_prover import prove_batch

        return prove_batch(circuit.data, pws)
    return [circuit.data.prove(pw) for pw in pws]


def _prove_or_check(circuit, pw, prove: bool):
    if prove:
        return circuit.data.prove(pw)
    return CheckedPublicInputs(public_inputs=circuit.data.check_witness(pw))


def _pis_of(proof):
    return proof.public_inputs


class _StageTimer:
    """Flow-level wall-clock stages (INTMAX_TPU_TRACE=1), complementing the
    per-prove phase timer in ``engine/prover.py`` — separates circuit-build
    and witness time from proving time, the split the reference prints with
    ad-hoc ``Instant::now`` (``src/bin/block_circuit.rs:304-308,678-688``)."""

    def __init__(self):
        self.enabled = os.environ.get("INTMAX_TPU_TRACE") == "1"
        self._t = time.perf_counter()
        self._name = None

    def stage(self, name: str | None) -> None:
        now = time.perf_counter()
        if self.enabled and self._name is not None:
            print(f"[flow] {self._name}: {now - self._t:.1f}s", flush=True)
        self._t = now
        self._name = name


def run_block_flow(
    constants: RollupConstants | None = None,
    config: CircuitConfig | None = None,
    prove: bool = True,
    recursive: bool = True,
):
    """``recursive=True`` (default, reference parity —
    ``rollup/circuits/mod.rs:450-489``) verifies the user-tx/signature
    proofs in-circuit; ``False`` uses the trusted-aggregation mode
    (host-verified inner proofs — weaker object, much smaller circuit)."""
    constants = constants or RollupConstants.test_constants()
    config = config or CircuitConfig.standard_recursion_config()

    timer = _StageTimer()
    aggregator_nodes = NodeDataMemory()
    world_state_tree = SparseMerkleTree(aggregator_nodes, RootDataTmp())

    # circuit builds go through the on-disk cache when
    # INTMAX_TPU_CIRCUIT_CACHE is set (engine/circuit_cache.py)
    from ...engine.circuit_cache import load_or_build

    consts_tag = "x".join(
        str(v) for v in (
            constants.log_max_n_users, constants.log_max_n_txs,
            constants.log_max_n_contracts, constants.log_max_n_variables,
            constants.log_n_txs, constants.log_n_recipients,
            constants.log_n_contracts, constants.log_n_variables,
            constants.n_registrations, constants.n_diffs, constants.n_merges,
            constants.n_deposits, constants.n_scroll_flags,
            constants.n_polygon_flags, constants.n_blocks,
        )
    )

    timer.stage("build_user_tx_circuit")
    merge_and_purge_circuit = load_or_build(
        f"user_tx-{consts_tag}", config,
        lambda: make_user_proof_circuit(constants, config),
    )
    timer.stage("state_setup")

    # --- sender 1: pure transfer (no merges) ---
    sender1_account = private_key_to_account(
        HashOut((17426287337377512978, 8703645504073070742, 11984317793392655464, 9979414176933652180))
    )
    s1_nodes = NodeDataMemory()
    sender1_user_asset_tree = UserAssetTree(s1_nodes, RootDataTmp())
    sender1_tx_diff_tree = LayeredLayeredSparseMerkleTree(s1_nodes, RootDataTmp())

    key1 = (HashOut.from_u128(12), HashOut.from_u128(305), HashOut.from_u128(8012))
    value1 = HashOut.from_u128(2053)
    key2 = (HashOut.from_u128(12), HashOut.from_u128(471), HashOut.from_u128(8012))
    value2 = HashOut.from_u128(1111)
    key3 = (HashOut.from_u128(407), HashOut.from_u128(305), HashOut.from_u128(8012))
    value3 = HashOut.from_u128(2053)
    key4 = (HashOut.from_u128(832), HashOut.from_u128(471), HashOut.from_u128(8012))
    value4 = HashOut.from_u128(1111)

    sender1_user_asset_tree.set(*key1, value1)
    sender1_user_asset_tree.set(*key2, value2)
    world_state_tree.set(
        sender1_account.address.to_hash_out(), sender1_user_asset_tree.get_root()
    )
    p1 = sender1_user_asset_tree.set(*key2, HashOut.ZERO)
    p2 = sender1_user_asset_tree.set(*key1, HashOut.ZERO)
    p3 = sender1_tx_diff_tree.set(*key3, value3)
    p4 = sender1_tx_diff_tree.set(*key4, value4)
    sender1_input_witness = [p1, p2]
    sender1_output_witness = [p3, p4]

    # --- sender 2: merges a deposit made in the previous block ---
    sender2_account = private_key_to_account(
        HashOut((15657143458229430356, 6012455030006979790, 4280058849535143691, 5153662694263190591))
    )
    s2_nodes = NodeDataMemory()
    sender2_user_asset_tree = UserAssetTree(s2_nodes, RootDataTmp())
    sender2_tx_diff_tree = LayeredLayeredSparseMerkleTree(s2_nodes, RootDataTmp())

    block1_deposit_tree = LayeredLayeredSparseMerkleTree(aggregator_nodes, RootDataTmp())
    s2_addr_h = sender2_account.address.to_hash_out()
    block1_deposit_tree.set(s2_addr_h, key1[1], key1[2], value1)
    block1_deposit_tree.set(s2_addr_h, key2[1], key2[2], value2)

    from ..sparse_merkle_tree.tree import calc_inclusion_proof, get as smt_get

    merge_inclusion_proof2 = calc_inclusion_proof(
        aggregator_nodes, block1_deposit_tree.get_root(), s2_addr_h
    )
    deposit_nonce = HashOut.ZERO
    deposit_diff_root = merge_inclusion_proof2.root
    deposit_tx_hash = two_to_one(deposit_diff_root, deposit_nonce)
    merge_inclusion_proof1 = get_merkle_proof([deposit_tx_hash], 0, constants.log_n_txs)

    default_inclusion_proof = SparseMerkleInclusionProof.with_root(HashOut.ZERO)
    default_merkle_root = get_merkle_proof([], 0, constants.log_n_txs).root
    prev_block_number = 1
    block_headers: list[HashOut] = [HashOut.ZERO] * prev_block_number
    prev_block_headers_digest = get_merkle_proof(
        block_headers, prev_block_number - 1, LOG_MAX_N_BLOCKS
    ).root

    prev_world_state_digest = world_state_tree.get_root()
    prev_latest_account_digest = HashOut.ZERO
    prev_block_header = BlockHeader(
        block_number=prev_block_number,
        prev_block_hash=HashOut.ZERO,
        block_headers_digest=prev_block_headers_digest,
        transactions_digest=default_merkle_root,
        deposit_digest=merge_inclusion_proof1.root,
        proposed_world_state_digest=prev_world_state_digest,
        approved_world_state_digest=prev_world_state_digest,
        latest_account_digest=prev_latest_account_digest,
    )
    prev_block_hash = get_block_hash(prev_block_header)
    block_headers.append(prev_block_hash)

    deposit_merge_key = two_to_one(deposit_tx_hash, prev_block_hash)

    sender2_user_asset_tree.set(deposit_merge_key, key1[1], key1[2], value1)
    sender2_user_asset_tree.set(deposit_merge_key, key2[1], key2[2], value2)

    # produce the merge-process insert proof via remove+reinsert on the
    # plain SMT view (bin/block_circuit.rs:243-253)
    s2_as_smt = SparseMerkleTree(s2_nodes, sender2_user_asset_tree.roots_db)
    asset_root = s2_as_smt.get(deposit_merge_key)
    s2_as_smt.set(deposit_merge_key, HashOut.ZERO)
    merge_process_proof = s2_as_smt.set(deposit_merge_key, asset_root)

    merge_proof = MergeProof(
        is_deposit=True,
        diff_tree_inclusion_proof=(
            prev_block_header, merge_inclusion_proof1, merge_inclusion_proof2
        ),
        merge_process_proof=merge_process_proof,
        latest_account_tree_inclusion_proof=default_inclusion_proof,
        nonce=deposit_nonce,
    )

    p1 = sender2_user_asset_tree.set(deposit_merge_key, key2[1], key2[2], HashOut.ZERO)
    p2 = sender2_user_asset_tree.set(deposit_merge_key, key1[1], key1[2], HashOut.ZERO)
    p3 = sender2_tx_diff_tree.set(*key3, value3)
    p4 = sender2_tx_diff_tree.set(*key4, value4)
    sender2_input_witness = [p1, p2]
    sender2_output_witness = [p3, p4]

    sender1_nonce = HashOut(
        (7823975322825286183, 9539665429968124165, 6825628074508059665, 17852854585777218254)
    )
    pw1 = PartialWitness()
    merge_and_purge_circuit.targets.set_witness(
        pw1, sender1_account.address, [],
        sender1_input_witness[: constants.n_diffs],
        sender1_output_witness[: constants.n_diffs],
        sender1_nonce, sender1_input_witness[0][0].old_root,
    )

    sender2_nonce = HashOut(
        (6657881311364026367, 11761473381903976612, 10768494808833234712, 3223267375194257474)
    )
    pw2 = PartialWitness()
    merge_and_purge_circuit.targets.set_witness(
        pw2, sender2_account.address, [merge_proof],
        sender2_input_witness[: constants.n_diffs],
        sender2_output_witness[: constants.n_diffs],
        sender2_nonce, HashOut.ZERO,
    )

    pw3 = PartialWitness()
    merge_and_purge_circuit.targets.set_witness(
        pw3, Address(0), [], [], [], HashOut.ZERO, HashOut.ZERO
    )
    timer.stage("prove_user_txs")
    sender1_tx_proof, sender2_tx_proof, default_user_tx_proof = _prove_group(
        merge_and_purge_circuit, [pw1, pw2, pw3], prove
    )
    timer.stage("proposal_state")

    # --- proposal ---
    world_state_process_proofs = []
    user_tx_proofs = []
    ws1 = world_state_tree.set(
        sender1_account.address.to_hash_out(), sender1_user_asset_tree.get_root()
    )
    ws2 = world_state_tree.set(
        sender2_account.address.to_hash_out(), sender2_user_asset_tree.get_root()
    )
    world_state_process_proofs += [ws1, ws2]
    user_tx_proofs += [sender1_tx_proof, sender2_tx_proof]
    proposal_world_state_root = world_state_tree.get_root()

    timer.stage("build_zkdsa_circuit")
    zkdsa_circuit = load_or_build(
        "zkdsa", config, lambda: make_simple_signature_circuit(config)
    )
    timer.stage("prove_signatures")
    pw1 = PartialWitness()
    zkdsa_circuit.targets.set_witness(
        pw1, sender2_account.private_key, proposal_world_state_root
    )
    pw2 = PartialWitness()
    zkdsa_circuit.targets.set_witness(pw2, HashOut.ZERO, HashOut.ZERO)
    sender2_received_signature, default_signature_proof = _prove_group(
        zkdsa_circuit, [pw1, pw2], prove
    )

    timer.stage("build_block_circuit")
    # the block circuit bakes the inner circuits' verifier data, so their
    # digests belong in the cache key
    inner_tag = "-".join(
        format(int(c.data.common.circuit_digest[0]), "016x")
        for c in (merge_and_purge_circuit, zkdsa_circuit)
    )
    rec_tag = "rec" if (recursive and prove) else "agg"
    block_circuit = load_or_build(
        f"block-{consts_tag}-{rec_tag}-{inner_tag}", config,
        lambda: make_block_proof_circuit(
            constants, merge_and_purge_circuit, zkdsa_circuit, config,
            recursive=recursive and prove,
        ),
    )
    timer.stage("block_state")

    block_number = prev_block_header.block_number + 1
    received_signature_proofs = [None, sender2_received_signature]
    received_signatures = [
        None if p is None else SimpleSignaturePublicInputsFromProof(p)
        for p in received_signature_proofs
    ]

    latest_account_tree = SparseMerkleTree(NodeDataMemory(), RootDataTmp(prev_latest_account_digest))

    world_state_revert_proofs = []
    latest_account_process_proofs = []
    user_transactions = [
        MergeAndPurgeTransitionPublicInputs.decode(_pis_of(p)) for p in user_tx_proofs
    ]
    for sig, user_tx in zip(received_signatures, user_transactions):
        user_address = user_tx.sender_address
        if sig is None:
            old_block_number = latest_account_tree.get(user_address.to_hash_out())
            last_block_number = old_block_number.to_u32()
            confirmed_user_asset_root = user_tx.middle_user_asset_root
        else:
            last_block_number = block_number
            confirmed_user_asset_root = user_tx.new_user_asset_root
        latest_account_process_proofs.append(
            latest_account_tree.set(
                user_address.to_hash_out(), HashOut.from_u32(last_block_number)
            )
        )
        world_state_revert_proofs.append(
            world_state_tree.set(user_address.to_hash_out(), confirmed_user_asset_root)
        )

    bh_proof = get_merkle_proof(block_headers, prev_block_number, LOG_MAX_N_BLOCKS)
    block_headers_proof_siblings = bh_proof.siblings

    block2_deposit_list = [
        DepositInfo(
            receiver_address=sender2_account.address,
            contract_address=Address(1),
            variable_index=VariableIndex(0),
            amount=1,
        )
    ]
    block2_deposit_tree = LayeredLayeredSparseMerkleTree(aggregator_nodes, RootDataTmp())
    deposit_process_proofs = [
        block2_deposit_tree.set(
            leaf.receiver_address.to_hash_out(),
            leaf.contract_address.to_hash_out(),
            leaf.variable_index.to_hash_out(),
            HashOut((leaf.amount, 0, 0, 0)),
        )
        for leaf in block2_deposit_list
    ][: constants.n_deposits]

    detail = BlockDetail(
        block_number=block_number,
        user_tx_proofs=user_tx_proofs,
        deposit_process_proofs=deposit_process_proofs,
        scroll_process_proofs=[],
        polygon_process_proofs=[],
        world_state_process_proofs=world_state_process_proofs,
        world_state_revert_proofs=world_state_revert_proofs,
        received_signature_proofs=received_signature_proofs,
        latest_account_process_proofs=latest_account_process_proofs,
        block_headers_proof_siblings=block_headers_proof_siblings,
        prev_block_header=prev_block_header,
    )

    if prove:
        timer.stage("prove_block")
        block_proof = block_circuit.set_witness_and_prove(
            detail, default_user_tx_proof, default_signature_proof
        )
        timer.stage("verify_block")
        block_circuit.verify(block_proof)
        timer.stage(None)
        block_pis = block_proof.public_inputs
    else:
        timer.stage("check_block")
        pw = PartialWitness()
        block_pis = block_circuit.targets.set_witness(
            pw,
            detail.block_number,
            detail.user_tx_proofs,
            default_user_tx_proof,
            detail.deposit_process_proofs,
            detail.scroll_process_proofs,
            detail.polygon_process_proofs,
            detail.world_state_process_proofs,
            detail.world_state_revert_proofs,
            detail.received_signature_proofs,
            default_signature_proof,
            detail.latest_account_process_proofs,
            detail.block_headers_proof_siblings,
            detail.prev_block_header,
        )
        got_pis = block_circuit.data.check_witness(pw)
        timer.stage(None)
        assert got_pis == list(block_pis.get_entry_hash().elements), "entry hash mismatch"
        block_proof = block_pis

    # --- BlockInfo (the block1_info.json format) ---
    address_list = [
        TransactionSenderWithValidity(
            sender_address=u.sender_address, is_valid=s is not None
        )
        for u, s in zip(user_transactions, received_signatures)
    ]
    header = block_circuit.targets.computed_block_header
    block_info = BlockInfo(
        header=header,
        transactions=[u.tx_hash for u in user_transactions],
        deposit_list=block2_deposit_list,
        scroll_flag_list=[],
        polygon_flag_list=[],
        address_list=address_list,
    )

    return BlockFlowResult(
        block_info=block_info,
        block_detail=detail,
        block_proof=block_proof,
        user_tx_proofs=user_tx_proofs,
        block_circuit=block_circuit,
        merge_proofs=[merge_proof],
    )


def SimpleSignaturePublicInputsFromProof(proof):
    from ..zkdsa.circuits import SimpleSignaturePublicInputs

    return SimpleSignaturePublicInputs.decode(_pis_of(proof))
