"""Batch prover: K same-circuit proofs in one device pass must be
bit-identical to K sequential ``prove`` calls (same transcripts, caps,
openings, FRI layers), and verify."""

from intmax_zkp_core_tpu.engine.batch_prover import prove_batch
from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.engine.witness import PartialWitness
from intmax_zkp_core_tpu.models.zkdsa.circuits import make_simple_signature_circuit
from intmax_zkp_core_tpu.utils.hash_out import HashOut


def tiny_config():
    return CircuitConfig(fri=FriConfig(num_query_rounds=6, proof_of_work_bits=4))


def _arith_circuit():
    builder = CircuitBuilder(tiny_config())
    x = builder.add_virtual_target()
    y = builder.add_virtual_target()
    z = builder.add(builder.mul(x, y), x)
    for t in (x, y, z):
        builder.register_public_input(t)
    return builder.build(), x, y


def test_batch_matches_sequential_bitwise():
    data, x, y = _arith_circuit()
    witnesses = [(3, 5), (7, 11), (0, 123)]
    pws = []
    for xv, yv in witnesses:
        pw = PartialWitness()
        pw.set_target(x, xv)
        pw.set_target(y, yv)
        pws.append(pw)

    batch_proofs = prove_batch(data, pws)
    for pw, bp in zip(pws, batch_proofs):
        sp = data.prove(pw)
        assert bp == sp
        data.verify(bp)


def test_batch_single_proof():
    data, x, y = _arith_circuit()
    pw = PartialWitness()
    pw.set_target(x, 2)
    pw.set_target(y, 9)
    (proof,) = prove_batch(data, [pw])
    assert proof == data.prove(pw)


def test_batch_zkdsa_circuit():
    circ = make_simple_signature_circuit(tiny_config())
    msgs = [HashOut.from_u64(5), HashOut.from_u64(6)]
    sks = [HashOut.from_u64(41), HashOut.from_u64(43)]
    pws = []
    for sk, msg in zip(sks, msgs):
        pw = PartialWitness()
        circ.targets.set_witness(pw, sk, msg)
        pws.append(pw)
    proofs = prove_batch(circ.data, pws)
    for proof in proofs:
        circ.data.verify(proof)
    # equality with the sequential path on the first witness
    assert proofs[0] == circ.data.prove(pws[0])
