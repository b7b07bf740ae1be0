"""Full block production end-to-end — the flagship entry point (reference
``src/bin/block_circuit.rs``): proves two user transactions (one with a
deposit merge), a signature, the block-production circuit, writes the
golden vector ``test_cases/block1_info.json`` and proves a batch.

Like the reference, the block circuit verifies the inner user-tx and
signature proofs IN-CIRCUIT (``rollup/circuits/mod.rs:450-489``).
``--fast`` switches to the trusted-aggregation mode (inner proofs checked
by the host verifier at witness time — a weaker object, but a much
smaller block circuit).

Usage: python -m intmax_zkp_core_tpu.bin.block_circuit [--check-only] [--fast]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main(prove: bool = True, recursive: bool = True) -> None:
    from ..models.rollup.block_flow import run_block_flow
    from ..models.rollup.block import BlockInfo

    t0 = time.time()
    res = run_block_flow(prove=prove, recursive=recursive)
    print(f"block flow completed in {time.time() - t0:.1f}s", flush=True)

    encoded = json.dumps(res.block_info.to_json(), indent=1)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "..", "test_cases")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.abspath(os.path.join(out_dir, "block1_info.json"))
    with open(out_path, "w") as f:
        f.write(encoded)
    decoded = BlockInfo.from_json(json.loads(encoded))
    assert decoded == res.block_info, "decode != encode"
    print(f"wrote {out_path}", flush=True)

    if prove:
        from ..engine.witness import PartialWitness
        from ..engine.circuit import CircuitBuilder
        from ..models.rollup.gadgets.batch import BlockBatchTarget

        # batch circuit: n_blocks recursive block proofs
        builder = CircuitBuilder(res.block_circuit.data.common.config)
        batch = BlockBatchTarget.add_virtual_to(
            builder, res.block_circuit.data, res.block_circuit.constants.n_blocks
        )
        batch_data = builder.build()
        pw = PartialWitness()
        batch.set_witness(pw, [res.block_proof.proof])
        t0 = time.time()
        batch_proof = batch_data.prove(pw)
        batch_data.verify(batch_proof)
        print(f"batch proof ok in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main(
        prove="--check-only" not in sys.argv,
        recursive="--fast" not in sys.argv,
    )
