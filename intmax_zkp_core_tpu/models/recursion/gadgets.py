"""Recursive proof wrapping (reference ``src/recursion/gadgets/mod.rs``).

Reference semantics: the inner circuit's verifier data
(constants_sigmas_cap + circuit_digest) is baked as *constants* of the outer
circuit, the inner proof is verified in-circuit with
``builder.verify_proof``, and an ``enabled`` flag is witness-only (disabled
slots still carry *valid* default proofs — ``recursion/gadgets/mod.rs:
85-127``).

CURRENT STATUS — trusted-aggregation interim: the inner proof's public
inputs are exposed as targets and the inner proof is verified by the HOST
verifier inside ``set_witness`` (so an invalid inner proof still aborts
proving), and the inner circuit digest is committed as circuit constants.
The in-circuit FRI verifier that closes this soundness gap (making the
aggregation trustless like the reference) is the engine's next milestone;
its arrival changes only this file.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...engine.circuit import BoolTarget, CircuitBuilder, CircuitData
from ...engine.verifier import verify


@dataclass
class CheckedPublicInputs:
    """Public inputs of an inner circuit validated via
    ``CircuitData.check_witness`` (constraints evaluated, no FRI proof).
    Accepted by ``RecursiveProofTarget.set_witness`` for fast integration
    tests only — production aggregation uses real proofs."""

    public_inputs: list


@dataclass
class RecursiveProofTarget:
    public_inputs: list[int]  # targets mirroring the inner proof's PIs
    enabled: BoolTarget
    inner_common: object  # inner CommonCircuitData (host verification key)

    @classmethod
    def add_virtual_to(cls, builder: CircuitBuilder, circuit_data: CircuitData):
        common = circuit_data.common
        # commit to WHICH circuit is being aggregated: bake the inner
        # circuit digest + constants_sigmas_cap into the outer circuit as
        # constants (parity with recursion/gadgets/mod.rs:85-100)
        builder.constant_hash(common.circuit_digest)
        for digest in common.constants_sigmas_cap:
            builder.constant_hash(digest)
        pis = builder.add_virtual_targets(common.num_public_inputs)
        enabled = builder.add_virtual_bool_target_safe()
        return cls(public_inputs=pis, enabled=enabled, inner_common=common)

    def set_witness(self, pw, proof, enabled: bool) -> None:
        # interim trusted-aggregation: the host verifies the inner proof
        # (valid default proofs are still required for disabled slots, as in
        # the reference)
        if not isinstance(proof, CheckedPublicInputs):
            verify(self.inner_common, proof)
        assert len(proof.public_inputs) == len(self.public_inputs)
        for t, v in zip(self.public_inputs, proof.public_inputs):
            pw.set_target(t, v)
        pw.set_bool_target(self.enabled, enabled)
