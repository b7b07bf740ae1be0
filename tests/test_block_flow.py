"""Full block-production flow (the reference's flagship
``bin/block_circuit.rs`` scenario): two senders — one transfer, one merging
a deposit from the previous block — proposal, approval, block assembly.

Runs in check-witness mode (every circuit constraint evaluated on the
subgroup; no FRI proof) to keep suite runtime bounded; the proving path is
exercised by the smaller circuit tests and the e2e script."""

from intmax_zkp_core_tpu.config import RollupConstants
from intmax_zkp_core_tpu.models.rollup.block_flow import run_block_flow
from intmax_zkp_core_tpu.utils.hash_out import HashOut


def test_block_flow_check_mode():
    res = run_block_flow(prove=False)
    info = res.block_info

    # block 2, two transactions, one deposit, 2-entry address list
    assert info.header.block_number == 2
    assert len(info.transactions) == 2
    assert len(info.deposit_list) == 1
    assert len(info.address_list) == 2
    # sender1 had no signature -> invalid; sender2 signed -> valid
    assert info.address_list[0].is_valid is False
    assert info.address_list[1].is_valid is True
    # approval reverted sender1's purge but kept the merge of sender2
    assert info.header.approved_world_state_digest != info.header.proposed_world_state_digest

    # JSON round trip (the block1_info.json format)
    import json

    encoded = json.dumps(info.to_json())
    from intmax_zkp_core_tpu.models.rollup.block import BlockInfo

    decoded = BlockInfo.from_json(json.loads(encoded))
    assert decoded == info

    # entry hash is the block circuit's only public input
    pis = res.block_proof
    assert pis.block_hash != HashOut.ZERO

    # MergeProof serde round trip (reference merge/mod.rs:36-50 derives
    # Serialize/Deserialize on the merge witness — its checkpoint format)
    from intmax_zkp_core_tpu.models.transaction.gadgets.merge import MergeProof

    (mp,) = res.merge_proofs
    assert MergeProof.from_json(json.loads(json.dumps(mp.to_json()))) == mp

    # BlockProductionPublicInputs serde round trip
    # (rollup/circuits/mod.rs:635-669)
    from intmax_zkp_core_tpu.models.rollup.circuits import (
        BlockProductionPublicInputs,
    )

    assert (
        BlockProductionPublicInputs.from_json(json.loads(json.dumps(pis.to_json())))
        == pis
    )
