"""SMT tests: randomized process-proof generation re-verified by the
circomlib state machine (mirrors reference ``bin/smt_verifier.rs`` and the
in-module tree tests), layered connection rules, UserAssetTree."""

import random

import pytest

from intmax_zkp_core_tpu.utils.hash_out import HashOut
from intmax_zkp_core_tpu.models.sparse_merkle_tree import (
    LayeredLayeredSparseMerkleTree,
    LayeredSparseMerkleTree,
    ProcessMerkleProofRole,
    SparseMerkleProcessProof,
    SparseMerkleTree,
    verify_layered_smt_connection,
)
from intmax_zkp_core_tpu.models.transaction.user_asset_tree import UserAssetTree

rng = random.Random(42)


def rand_hash():
    return HashOut(tuple(rng.randrange(1, 1 << 60) for _ in range(4)))


def test_insert_find_get_roundtrip():
    tree = SparseMerkleTree()
    entries = {}
    for _ in range(12):
        k, v = rand_hash(), rand_hash()
        entries[k] = v
        proof = tree.set(k, v)
        assert proof.fnc == ProcessMerkleProofRole.ProcessInsert
        proof.check()
    for k, v in entries.items():
        res = tree.find(k)
        assert res.found and res.value == v
        assert tree.get(k) == v
    missing = rand_hash()
    res = tree.find(missing)
    assert not res.found


def test_update_remove_noop_roles():
    tree = SparseMerkleTree()
    k, v1, v2 = rand_hash(), rand_hash(), rand_hash()
    p = tree.set(k, v1)
    assert p.fnc == ProcessMerkleProofRole.ProcessInsert
    p.check()
    p = tree.set(k, v2)
    assert p.fnc == ProcessMerkleProofRole.ProcessUpdate
    assert p.old_value == v1 and p.new_value == v2
    p.check()
    p = tree.set(k, HashOut.ZERO)  # zero value => delete
    assert p.fnc == ProcessMerkleProofRole.ProcessDelete
    p.check()
    assert tree.get(k) == HashOut.ZERO
    p = tree.set(k, HashOut.ZERO)  # delete absent => noop
    assert p.fnc == ProcessMerkleProofRole.ProcessNoOp
    p.check()


def test_randomized_ops_recheck():
    # randomized insert/update/delete soup; every proof re-verified by the
    # circomlib SM and roots chain correctly (bin/smt_verifier.rs flow)
    tree = SparseMerkleTree()
    keys = [rand_hash() for _ in range(8)]
    live = set()
    prev_root = tree.get_root()
    for step in range(60):
        k = rng.choice(keys)
        if k in live and rng.random() < 0.4:
            v = HashOut.ZERO
            live.discard(k)
        else:
            v = rand_hash()
            live.add(k)
        proof = tree.set(k, v)
        proof.check()
        assert proof.old_root == prev_root
        prev_root = proof.new_root
        assert prev_root == tree.get_root()


def test_change_root_rollback():
    tree = SparseMerkleTree()
    k1, k2 = rand_hash(), rand_hash()
    v1, v2 = rand_hash(), rand_hash()
    tree.set(k1, v1)
    root1 = tree.get_root()
    tree.set(k2, v2)
    assert tree.get(k2) == v2
    tree.change_root(root1)  # roll back; deleted nodes retained
    assert tree.get(k1) == v1
    assert tree.get(k2) == HashOut.ZERO
    with pytest.raises(KeyError):
        tree.change_root(rand_hash())


def test_default_process_proof_verifies():
    p = SparseMerkleProcessProof.with_root(rand_hash())
    p.check()


def test_tampered_proof_rejected():
    tree = SparseMerkleTree()
    k, v = rand_hash(), rand_hash()
    tree.set(k, v)
    k2, v2 = rand_hash(), rand_hash()
    p = tree.set(k2, v2)
    bad = SparseMerkleProcessProof(**{**p.__dict__})
    bad.new_value = rand_hash()
    with pytest.raises(AssertionError):
        bad.check()


def test_layered_tree_connection():
    tree = LayeredSparseMerkleTree()
    k1, k2, v = rand_hash(), rand_hash(), rand_hash()
    p1, p2 = tree.set(k1, k2, v)
    p1.check()
    p2.check()
    verify_layered_smt_connection(p1.fnc, p1.old_value, p1.new_value, p2.old_root, p2.new_root)
    r1, r2 = tree.find(k1, k2)
    assert r1.found and r2.found and r2.value == v
    # delete propagates: removing the only inner entry empties the outer slot
    p1, p2 = tree.set(k1, k2, HashOut.ZERO)
    verify_layered_smt_connection(p1.fnc, p1.old_value, p1.new_value, p2.old_root, p2.new_root)
    assert p1.fnc == ProcessMerkleProofRole.ProcessDelete


def test_layered_layered_tree():
    tree = LayeredLayeredSparseMerkleTree()
    k1, k2, k3, v = rand_hash(), rand_hash(), rand_hash(), rand_hash()
    p1, p2, p3 = tree.set(k1, k2, k3, v)
    for p in (p1, p2, p3):
        p.check()
    verify_layered_smt_connection(p1.fnc, p1.old_value, p1.new_value, p2.old_root, p2.new_root)
    verify_layered_smt_connection(p2.fnc, p2.old_value, p2.new_value, p3.old_root, p3.new_root)
    r1, r2, r3 = tree.find(k1, k2, k3)
    assert r3.found and r3.value == v


def test_user_asset_tree():
    tree = UserAssetTree()
    mk, ca, vi, amt = rand_hash(), rand_hash(), rand_hash(), HashOut.from_u32(100)
    p0, p1, p2 = tree.set(mk, ca, vi, amt)
    for p in (p0, p1, p2):
        p.check()
    r0, r1, r2 = tree.find(mk, ca, vi)
    assert r0.found and r1.found and r2.found
    assert r2.value == amt
    # asset root unwrap: layer0 value = hash(Internal(asset_root, merge_key))
    asset_root = tree.get_asset_root(mk)
    assert asset_root == r1.root
    # second asset under same merge_key updates in place
    vi2 = rand_hash()
    tree.set(mk, ca, vi2, HashOut.from_u32(7))
    assert tree.get_asset_root(mk) != asset_root
    # removal of absent merge_key root
    assert tree.get_asset_root(rand_hash()) == HashOut.ZERO


def test_process_proof_json_roundtrip():
    tree = SparseMerkleTree()
    p = tree.set(rand_hash(), rand_hash())
    j = p.to_json()
    q = SparseMerkleProcessProof.from_json(j)
    assert q == p
