"""Golden-vector parity vs the reference's committed test case.

The reference ships ONE on-disk fixture, ``test_cases/block1_info.json``
(written by ``src/bin/block_circuit.rs:651-663``).  The committed file is
STALE relative to the reference's current code: its ``sender_address``
fields are 32-byte hex while the current ``Address`` serializer emits
8-byte hex (``src/zkdsa/account.rs:63-73``), so every digest downstream of
an address (deposit trees -> tx hashes -> world-state roots -> block hash)
legitimately differs when regenerated.  Regeneration semantics come from
the *code*, which our ``bin/block_circuit.py`` mirrors statement for
statement.

What we CAN check bit-exactly against the stale vector:

* ``header.block_headers_digest`` is a pure function of data inside the
  file itself under the *current* semantics: the depth-32 dense-Merkle
  root over ``[ZERO, prev_block_hash]`` (``src/bin/block_circuit.rs:
  203-227`` builds ``block_headers = [ZERO]`` then appends
  ``prev_block_hash``; the new header's digest is the root at index 1).
  Recomputing it with OUR Poseidon + dense Merkle from the reference's
  ``prev_block_hash`` bytes reproduces the Rust-produced digest exactly —
  an independent bit-exactness anchor produced by the original
  implementation, on top of the 33 anchors in
  ``docs/poseidon_bitexactness_notes.md``.
* structural schema: our regenerated vector carries the CURRENT
  ``BlockInfo`` fields (``src/rollup/block.rs:10-44``), including
  ``scroll_flag_list``/``polygon_flag_list`` which the stale file predates.
* address-independent scalars (block number, deposit amount and
  variable index, address-list validity flags) agree between the two.
"""

import json
import os

import pytest

from intmax_zkp_core_tpu.models.merkle_tree.tree import get_merkle_proof
from intmax_zkp_core_tpu.models.rollup.block import BlockInfo
from intmax_zkp_core_tpu.utils.hash_out import HashOut

REPO_VECTOR = os.path.join(os.path.dirname(__file__), "..", "test_cases", "block1_info.json")
REFERENCE_VECTOR = "/root/reference/test_cases/block1_info.json"

CURRENT_SCHEMA_KEYS = {
    # src/rollup/block.rs:10-44 (current reference struct)
    "header",
    "transactions",
    "deposit_list",
    "scroll_flag_list",
    "polygon_flag_list",
    "address_list",
}


def test_our_vector_schema_and_roundtrip():
    with open(REPO_VECTOR) as f:
        o = json.load(f)
    assert set(o.keys()) == CURRENT_SCHEMA_KEYS
    info = BlockInfo.from_json(o)
    assert info.to_json() == o
    assert info.header.block_number == 2


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_VECTOR), reason="reference checkout not present"
)
def test_reference_vector_block_headers_digest_anchor():
    """Reproduce a digest the original Rust code wrote to disk."""
    with open(REFERENCE_VECTOR) as f:
        ref = json.load(f)
    prev_hash = HashOut.from_hex(ref["header"]["prev_block_hash"])
    got = get_merkle_proof([HashOut.ZERO, prev_hash], 1, 32).root
    assert got.to_hex() == ref["header"]["block_headers_digest"]


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_VECTOR), reason="reference checkout not present"
)
def test_reference_vector_address_independent_fields():
    with open(REFERENCE_VECTOR) as f:
        ref = json.load(f)
    with open(REPO_VECTOR) as f:
        ours = json.load(f)
    assert ours["header"]["block_number"] == ref["header"]["block_number"]
    assert len(ours["transactions"]) == len(ref["transactions"])
    assert len(ours["deposit_list"]) == len(ref["deposit_list"])
    for a, b in zip(ours["deposit_list"], ref["deposit_list"]):
        assert a["variable_index"] == b["variable_index"]
        assert a["amount"] == b["amount"]
    assert [e["is_valid"] for e in ours["address_list"]] == [
        e["is_valid"] for e in ref["address_list"]
    ]
