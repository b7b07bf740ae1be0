"""Small parity pieces: secp256k1 limb codecs, ECDSA accounts, storage
layouts, asset codecs, block headers."""

import pytest

from intmax_zkp_core_tpu.models.ecdsa.account import (
    pack_signature,
    private_key_to_account as ecdsa_account,
    public_key_to_address,
    sign_message,
    unpack_signature,
    verify_message,
    verify_message_circuit,
)
from intmax_zkp_core_tpu.models.merkle_tree.tree import log2_ceil
from intmax_zkp_core_tpu.models.rollup.gadgets.deposit_block import DepositInfo, VariableIndex
from intmax_zkp_core_tpu.models.sparse_merkle_tree import SparseMerkleTree
from intmax_zkp_core_tpu.models.sparse_merkle_tree.storage_layout import (
    StorageLayout,
    get_index_position,
    get_key_position,
)
from intmax_zkp_core_tpu.models.transaction.asset import ContributedAsset, TokenKind
from intmax_zkp_core_tpu.models.transaction.block_header import BlockHeader, get_block_hash
from intmax_zkp_core_tpu.models.zkdsa.account import Address
from intmax_zkp_core_tpu.utils.hash_out import (
    HashOut,
    SECP256K1_SCALAR_ORDER,
    from_noncanonical_secp256k1_scalar,
    to_canonical_secp256k1_scalar,
)


def test_secp256k1_limb_codec():
    # hash/secp256k1.rs:72-102 canonicity properties
    h = HashOut.rand()
    assert from_noncanonical_secp256k1_scalar(to_canonical_secp256k1_scalar(h)) == h
    # NEG_ONE is noncanonical after roundtrip (4 Goldilocks limbs < scalar order)
    neg_one = SECP256K1_SCALAR_ORDER - 1
    a = from_noncanonical_secp256k1_scalar(neg_one)
    assert to_canonical_secp256k1_scalar(a) != neg_one


def test_ecdsa_account_and_signature():
    acct = ecdsa_account(987654321)
    sig = sign_message(acct.private_key, 0xDEADBEEF)
    assert verify_message(acct.public_key, 0xDEADBEEF, sig)
    assert not verify_message(acct.public_key, 0xDEADBEF0, sig)
    assert unpack_signature(pack_signature(sig)) == sig
    assert public_key_to_address(acct.public_key) == acct.address
    # the in-circuit verifier is implemented (coverage in test_ecdsa_circuit)
    from intmax_zkp_core_tpu.models.ecdsa.circuits import (
        verify_message_circuit as in_circuit,
    )

    assert callable(in_circuit)


def test_storage_layout_value_vector_mapping_bytes():
    layout = StorageLayout(SparseMerkleTree())
    pos = HashOut.from_u32(5)
    layout.write_u128(pos, 123456789012345678901234567890)
    v, proofs = layout.read_u128(pos)
    assert v == 123456789012345678901234567890
    assert proofs[0].found

    layout.push_vector_value(pos2 := HashOut.from_u32(9), HashOut.from_u32(11))
    layout.push_vector_value(pos2, HashOut.from_u32(22))
    v, _ = layout.read_vector_value(pos2, 1)
    assert v == HashOut.from_u32(22)
    with pytest.raises(IndexError):
        layout.read_vector_value(pos2, 2)

    key = HashOut.from_u32(77)
    layout.write_mapping_value(pos, key, HashOut.from_u32(99))
    v, _ = layout.read_mapping_value(pos, key)
    assert v == HashOut.from_u32(99)
    # mapping slot is position-derived, does not clobber the value slot
    assert layout.read_u128(pos)[0] == 123456789012345678901234567890

    data = b"hello storage layout bytes data!!" * 2
    bpos = HashOut.from_u32(1234)
    layout.write_bytes_data(bpos, data)
    out, _ = layout.read_bytes_data(bpos)
    assert out == data

    # position derivations are hash-based and distinct
    assert get_index_position(pos, 0) != get_index_position(pos, 1)
    assert get_key_position(pos, key) != get_key_position(key, pos)


def test_token_kind_bytes_codec():
    kind = TokenKind(contract_address=Address(123456), variable_index=VariableIndex(7))
    assert TokenKind.from_bytes(kind.to_bytes()) == kind
    asset = ContributedAsset(receiver_address=Address(5), kind=kind, amount=10)
    d = asset.to_deposit_info()
    assert ContributedAsset.from_deposit_info(d) == asset
    assert ContributedAsset.from_json(asset.to_json()) == asset


def test_block_header_serde_and_hash():
    h = BlockHeader(
        block_number=0,
        prev_block_hash=HashOut.from_u32(1),
        block_headers_digest=HashOut.from_u32(2),
        transactions_digest=HashOut.from_u32(3),
        deposit_digest=HashOut.from_u32(4),
        proposed_world_state_digest=HashOut.from_u32(5),
        approved_world_state_digest=HashOut.from_u32(6),
        latest_account_digest=HashOut.from_u32(7),
    )
    j = h.to_json()
    # block_header.rs:104-124 format: 0x-prefixed BE u32 block number
    assert j["block_number"] == "0x00000000"
    assert BlockHeader.from_json(j) == h
    assert get_block_hash(h) != HashOut.ZERO
    assert log2_ceil(6) == 3 and log2_ceil(1) == 0 and log2_ceil(8) == 3


def test_make_deposit_proof():
    # rollup/deposit.rs:46-135: 3 bridge trees, roots combined with chain
    # indices, dense + SMT inclusion proof pairs for a receiver
    from intmax_zkp_core_tpu.models.merkle_tree.tree import get_merkle_root
    from intmax_zkp_core_tpu.models.rollup.deposit import make_deposit_proof
    from intmax_zkp_core_tpu.utils.hash_out import HashOut
    from intmax_zkp_core_tpu.utils.poseidon_host import two_to_one

    receiver = Address(42)
    deposits = [
        DepositInfo(
            receiver_address=receiver,
            contract_address=Address(1),
            variable_index=VariableIndex(0),
            amount=5,
        )
    ]
    proofs = make_deposit_proof(deposits, [], [], receiver, num_log_txs=2)
    assert len(proofs) == 3
    dense0, smt0 = proofs[0]
    # the deposit bridge contains the receiver; empty bridges do not
    assert smt0.found
    assert not proofs[1][1].found
    # dense proof folds to the combined root
    assert get_merkle_root(dense0.index, dense0.value, dense0.siblings) == dense0.root
    # leaf 0 = Poseidon(deposit_tree_root || chain_index 0)
    assert dense0.value == two_to_one(smt0.root, HashOut.ZERO)
