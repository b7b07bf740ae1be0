"""Engine tests: build/prove/verify small circuits end-to-end, including
tamper rejection."""

import pytest

from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.engine.witness import PartialWitness
from intmax_zkp_core_tpu.ops.poseidon import permute_s, hash_no_pad_s

P = 0xFFFFFFFF00000001


def tiny_config():
    return CircuitConfig(fri=FriConfig(num_query_rounds=6, proof_of_work_bits=4))


def test_arithmetic_circuit_prove_verify():
    builder = CircuitBuilder(tiny_config())
    x = builder.add_virtual_target()
    y = builder.add_virtual_target()
    # z = x*y + x
    xy = builder.mul(x, y)
    z = builder.add(xy, x)
    builder.register_public_input(x)
    builder.register_public_input(y)
    builder.register_public_input(z)
    data = builder.build()

    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(y, 5)
    proof = data.prove(pw)
    assert proof.public_inputs == [3, 5, 18]
    data.verify(proof)


def test_kernels_cached_across_circuit_instances():
    """get_circuit_kernels must hit the digest-keyed module cache when the
    same circuit is rebuilt as a new object (the block flow reloads its
    CircuitData from the on-disk cache every run — a pd-attached cache
    alone re-ran the whole table setup inside every block prove,
    docs/perf_notes.md round 5)."""
    from intmax_zkp_core_tpu.engine.prover import get_circuit_kernels

    def build():
        builder = CircuitBuilder(tiny_config())
        x = builder.add_virtual_target()
        y = builder.mul(x, x)
        builder.register_public_input(x)
        builder.register_public_input(y)
        return x, builder.build()

    (_, d1), (x2, d2) = build(), build()
    assert d1.prover is not d2.prover
    assert d1.prover.common.circuit_digest == d2.prover.common.circuit_digest
    k1 = get_circuit_kernels(d1.prover)
    k2 = get_circuit_kernels(d2.prover)
    assert k1 is k2
    # and the second instance still proves/verifies through the shared
    # kernels
    pw = PartialWitness()
    pw.set_target(x2, 7)
    proof = d2.prove(pw)
    assert proof.public_inputs == [7, 49]
    d2.verify(proof)


def test_wrong_public_input_rejected():
    builder = CircuitBuilder(tiny_config())
    x = builder.add_virtual_target()
    y = builder.mul(x, x)
    builder.register_public_input(x)
    builder.register_public_input(y)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(x, 7)
    proof = data.prove(pw)
    assert proof.public_inputs == [7, 49]
    data.verify(proof)
    # tamper with the claimed public input
    proof.public_inputs = [7, 50]
    with pytest.raises(AssertionError):
        data.verify(proof)


def test_copy_constraint_violation_detected():
    builder = CircuitBuilder(tiny_config())
    x = builder.add_virtual_target()
    y = builder.add_virtual_target()
    builder.connect(x, y)
    builder.register_public_input(x)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(x, 4)
    pw.set_target(y, 5)  # conflicts with connect
    with pytest.raises(AssertionError):
        data.prove(pw)


def test_poseidon_circuit_prove_verify():
    builder = CircuitBuilder(tiny_config())
    inputs = builder.add_virtual_targets(12)
    outputs = builder.poseidon_permute(inputs)
    for t in inputs:
        builder.register_public_input(t)
    for t in outputs:
        builder.register_public_input(t)
    data = builder.build()

    pw = PartialWitness()
    vals = list(range(1, 13))
    for t, v in zip(inputs, vals):
        pw.set_target(t, v)
    proof = data.prove(pw)
    assert proof.public_inputs[12:] == permute_s(vals)
    data.verify(proof)


def test_hash_gadget_matches_host():
    builder = CircuitBuilder(tiny_config())
    ins = builder.add_virtual_targets(9)
    h = builder.hash_n_to_hash_no_pad(ins)
    for t in ins:
        builder.register_public_input(t)
    for t in h:
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    vals = [100 + i for i in range(9)]
    for t, v in zip(ins, vals):
        pw.set_target(t, v)
    proof = data.prove(pw)
    assert proof.public_inputs[9:] == hash_no_pad_s(vals)
    data.verify(proof)


def test_select_split_is_equal_gadgets():
    builder = CircuitBuilder(tiny_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    eq = builder.is_equal(a, b)
    sel = builder.select(eq, a, b)
    bits = builder.split_le(a, 8)
    builder.register_public_input(a)
    builder.register_public_input(b)
    builder.register_public_input(eq.target)
    builder.register_public_input(sel)
    builder.register_public_input(bits[0].target)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 13)
    pw.set_target(b, 9)
    proof = data.prove(pw)
    assert proof.public_inputs == [13, 9, 0, 9, 1]  # 13 != 9 -> select b; bit0(13)=1
    data.verify(proof)


def test_proof_json_roundtrip():
    from intmax_zkp_core_tpu.engine.serde import proof_from_json, proof_to_json

    builder = CircuitBuilder(tiny_config())
    x = builder.add_virtual_target()
    y = builder.mul(x, x)
    builder.register_public_input(y)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(x, 6)
    proof = data.prove(pw)
    import json

    encoded = json.dumps(proof_to_json(proof))
    back = proof_from_json(json.loads(encoded))
    data.verify(back)
    assert back.public_inputs == [36]


def test_split_le_canonical_edge_values():
    # canonicity gadget must accept every canonical value, including the
    # boundary patterns: p-1 = 0xFFFFFFFF00000000 (high 32 bits all one,
    # low 32 bits zero) and 2^32 - 2 (max value with a second 64-bit
    # representation v + p)
    from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
    from intmax_zkp_core_tpu.engine.prover import check_witness
    from intmax_zkp_core_tpu.engine.witness import PartialWitness

    P = 0xFFFFFFFF00000001
    b = CircuitBuilder()
    ts = [b.add_virtual_target() for _ in range(4)]
    for t in ts:
        b.split_le_canonical(t)
    data = b.build()
    pw = PartialWitness()
    for t, v in zip(ts, [0, 5, (1 << 32) - 2, P - 1]):
        pw.set_target(t, v)
    check_witness(data, pw)  # raises on any violated constraint

    # the witness pipeline must refuse a non-canonical bit injection for a
    # value v < 2^32 - 1 (bit pattern of v + p recomposes to v mod p)
    b2 = CircuitBuilder()
    t2 = b2.add_virtual_target()
    bits = b2.split_le_canonical(t2)
    data2 = b2.build()
    pw2 = PartialWitness()
    v = 5
    pw2.set_target(t2, v)
    noncanon = v + P
    for i, bt in enumerate(bits):
        pw2.set_target(bt.target, (noncanon >> i) & 1)
    with pytest.raises(AssertionError):
        check_witness(data2, pw2)


def test_open_and_combine_kernels_match_scalar_oracle():
    """The log-depth openings / FRI-combine kernels (engine/prover.py
    `_open_columns`/`_combine_columns`) are bit-identical to scalar Horner
    / sequential weighted sums, including the vmapped (batch-prover) path
    and a non-power-of-two column count for combine."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from intmax_zkp_core_tpu.engine.prover import _combine_columns, _open_columns

    W = 7  # extension non-residue
    rng = np.random.default_rng(5)

    def ext_mul(a, b):
        return ((a[0] * b[0] + W * a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)

    S, n = 6, 128
    coeffs = rng.integers(0, P, size=(S, n), dtype=np.uint64)
    zeta = rng.integers(0, P, size=(2,), dtype=np.uint64)
    got = np.asarray(_open_columns(jnp.asarray(coeffs), jnp.asarray(zeta)))
    for s in range(S):
        acc = (0, 0)
        for c in coeffs[s][::-1]:
            acc = ext_mul(acc, (int(zeta[0]), int(zeta[1])))
            acc = ((acc[0] + int(c)) % P, acc[1])
        assert (int(got[s, 0]), int(got[s, 1])) == acc
    gotv = np.asarray(
        jax.vmap(_open_columns, in_axes=(0, 0))(
            jnp.asarray(coeffs[None]), jnp.asarray(zeta[None])
        )
    )
    assert (gotv[0] == got).all()

    m, ln = 13, 64  # odd m exercises the zero-row padding
    mat = rng.integers(0, P, size=(m, ln), dtype=np.uint64)
    pows = rng.integers(0, P, size=(m, 2), dtype=np.uint64)
    got2 = np.asarray(_combine_columns(jnp.asarray(mat), jnp.asarray(pows)))
    w0 = np.zeros(ln, dtype=object)
    w1 = np.zeros(ln, dtype=object)
    for i in range(m):
        w0 = (w0 + mat[i].astype(object) * int(pows[i, 0])) % P
        w1 = (w1 + mat[i].astype(object) * int(pows[i, 1])) % P
    assert (got2[:, 0].astype(object) == w0).all()
    assert (got2[:, 1].astype(object) == w1).all()


def test_device_openings_proof_identical_to_fetch_all(monkeypatch):
    # the device-resident-openings commit path (gather only query-touched
    # rows/digests) must produce byte-identical proofs to the legacy
    # fetch-everything path
    import json

    from intmax_zkp_core_tpu.engine.serde import proof_to_json

    def prove_once():
        builder = CircuitBuilder(tiny_config())
        x = builder.add_virtual_target()
        y = builder.add_virtual_target()
        z = builder.add(builder.mul(x, y), x)
        h = builder.hash_n_to_hash_no_pad([x, y, z])
        for t in (x, y):
            builder.register_public_input(t)
        for t in h:
            builder.register_public_input(t)
        data = builder.build()
        pw = PartialWitness()
        pw.set_target(x, 3)
        pw.set_target(y, 5)
        proof = data.prove(pw)
        data.verify(proof)
        return json.dumps(proof_to_json(proof), sort_keys=True)

    monkeypatch.setenv("INTMAX_TPU_DEVICE_OPENINGS", "1")
    with_dev = prove_once()
    monkeypatch.setenv("INTMAX_TPU_DEVICE_OPENINGS", "0")
    without = prove_once()
    assert with_dev == without
