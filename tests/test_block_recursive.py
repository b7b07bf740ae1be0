"""CI-sized RECURSIVE block production + batch proof.

The reference block circuit always verifies its inner user-tx and
signature proofs in-circuit (``rollup/circuits/mod.rs:450-489``) and the
batch circuit wraps n_blocks recursive block proofs
(``rollup/gadgets/batch/mod.rs:16-56``).  This test proves both paths
end-to-end at the smallest rollup shape (1 diff, 2 tx slots, no merges;
``models/rollup/mini_block.py``) and a minimal FRI config — the full e2e
scenario at reference constants runs in ``bin/block_circuit.py``.  The
flagship-on-the-mesh test re-proves the same block on the 8-device mesh
(inner proof groups through ``prove_batch(mesh=...)``, commitments under
``use_commit_mesh``) and asserts bit-identity.
"""

import pytest

from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
from intmax_zkp_core_tpu.engine.witness import PartialWitness
from intmax_zkp_core_tpu.models.rollup.gadgets.batch import BlockBatchTarget
from intmax_zkp_core_tpu.models.rollup.circuits import BlockDetail
from intmax_zkp_core_tpu.models.rollup.mini_block import (
    MINI as TINY,
    MINI_CFG as CFG,
    build_mini_circuits,
    run_mini_recursive_block,
)


@pytest.fixture(scope="module")
def mini_circuits():
    return build_mini_circuits()


@pytest.fixture(scope="module")
def recursive_block_proof(mini_circuits):
    """One sender, one diff (amounts conserved), signed approval — proven
    with the inner proofs verified IN-CIRCUIT."""
    r = run_mini_recursive_block(circuits=mini_circuits)
    return (
        r["block_circuit"],
        r["block_proof"],
        r["detail"],
        (r["user_tx_proofs"][1], r["signature_proofs"][1]),
        r,
    )


def test_recursive_block_proof(recursive_block_proof):
    block_circuit, block_proof = recursive_block_proof[:2]
    # single public input: the Poseidon entry hash (rollup/circuits/mod.rs:603-604)
    assert block_proof.proof.public_inputs == list(
        block_proof.public_inputs.get_entry_hash().elements
    )
    assert block_circuit.targets.computed_block_header.block_number == 2


def test_batch_circuit_proves_one_block(recursive_block_proof):
    """1-block batch at n_blocks=1 (reference batch/mod.rs:16-56: unused
    slots are padded with the last proof, disabled — with one slot this
    exercises the enabled path)."""
    block_circuit, block_proof = recursive_block_proof[:2]
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
    block_circuit, block_proof = recursive_block_proof[:2]
    builder = CircuitBuilder(CFG)
    batch = BlockBatchTarget.add_virtual_to(builder, block_circuit.data, 2)
    batch_data = builder.build()
    pw = PartialWitness()
    batch.set_witness(pw, [block_proof.proof])  # slot 2: padded, disabled
    enabled = [pw.values[t.enabled.target] for t in batch.block_proofs]
    assert enabled == [1, 0]
    batch_proof = batch_data.prove(pw)
    batch_data.verify(batch_proof)


def test_block_detail_replay_from_json(recursive_block_proof):
    """Checkpoint/resume parity (reference serde-everywhere model, SURVEY
    §5.4): the full ``BlockDetail`` witness — inner FRI proofs included —
    round-trips through JSON, and REPLAYING block production from the
    deserialized checkpoint reproduces the original block proof
    bit-for-bit (the prover is deterministic)."""
    import json

    block_circuit, block_proof, detail, defaults = recursive_block_proof[:4]
    encoded = json.dumps(detail.to_json())
    detail2 = BlockDetail.from_json(json.loads(encoded))
    assert detail2 == detail
    replayed = block_circuit.set_witness_and_prove(detail2, *defaults)
    assert replayed.proof == block_proof.proof
    assert replayed.public_inputs == block_proof.public_inputs


def test_flagship_on_mesh_bit_identical(mini_circuits, recursive_block_proof):
    """The FLAGSHIP on the 8-device mesh (VERDICT r3 #4): the same
    recursive block re-proved with the inner user-tx + signature groups
    through ``prove_batch(mesh=...)`` (proof axis, SURVEY §2.3) and the
    block prove's commitments under ``use_commit_mesh`` (four-step
    all-to-all NTT + sharded Merkle levels).  Every proof — inner and
    block — must be BIT-IDENTICAL to the single-device flow, and the
    sharded Merkle path must actually have run."""
    from intmax_zkp_core_tpu.parallel import merkle_sharded
    from intmax_zkp_core_tpu.parallel.mesh import make_mesh

    single = recursive_block_proof[4]
    tree_calls = merkle_sharded.SHARDED_TREE_CALLS
    meshed = run_mini_recursive_block(mesh=make_mesh(8), circuits=mini_circuits)
    assert merkle_sharded.SHARDED_TREE_CALLS > tree_calls, (
        "sharded Merkle path not exercised"
    )
    assert meshed["user_tx_proofs"] == single["user_tx_proofs"]
    assert meshed["signature_proofs"] == single["signature_proofs"]
    assert meshed["block_proof"].proof == single["block_proof"].proof
    assert meshed["block_proof"].public_inputs == single["block_proof"].public_inputs
