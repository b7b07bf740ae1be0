"""Worker for the 2-process ``jax.distributed`` test (run as a script).

Usage: python distributed_worker.py <process_id> <coordinator_port> <outdir>

Each process gets 4 virtual CPU devices; the global mesh spans 8 devices
across both processes.  Both processes run the SAME program (SPMD):
build the zkDSA circuit, prove K=4 witnesses with ``prove_batch`` over
the global mesh, and process 0 serializes the gathered proofs for the
pytest parent to check bit-identity against single-process proving.
This is the multi-host execution path of SURVEY §2.3/§5.8 (the reference
has no distributed story at all — its only parallelism is in-process
rayon, reference ``Cargo.toml:16,20``).
"""

import os
import pickle
import sys


def main() -> None:
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    outdir = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only: skip the TPU plugin
    import jax

    jax.config.update("jax_platforms", "cpu")

    # initialize the distributed runtime BEFORE importing the package:
    # package import warms a backend, after which initialize() refuses
    import jax.distributed

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=process_id,
    )

    from intmax_zkp_core_tpu.parallel.mesh import init_distributed

    mesh = init_distributed()  # already initialized: local+remote mesh
    assert jax.process_count() == 2, jax.process_count()
    assert mesh.shape["d"] == 8, mesh.shape

    from intmax_zkp_core_tpu.engine.batch_prover import prove_batch
    from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
    from intmax_zkp_core_tpu.engine.witness import PartialWitness
    from intmax_zkp_core_tpu.models.zkdsa.circuits import (
        make_simple_signature_circuit,
    )
    from intmax_zkp_core_tpu.utils.hash_out import HashOut

    circ = make_simple_signature_circuit(
        CircuitConfig(fri=FriConfig(num_query_rounds=3, proof_of_work_bits=2))
    )
    pws = []
    for i in range(4):
        pw = PartialWitness()
        circ.targets.set_witness(
            pw, HashOut.from_u64(101 + i), HashOut.from_u64(7 + i)
        )
        pws.append(pw)
    proofs = prove_batch(circ.data, pws, mesh=mesh)
    for p in proofs:
        circ.data.verify(p)

    if process_id == 0:
        tmp = os.path.join(outdir, "proofs.pkl.tmp")
        with open(tmp, "wb") as f:
            pickle.dump(proofs, f)
        os.replace(tmp, os.path.join(outdir, "proofs.pkl"))
    # keep both processes alive until collectives finish everywhere
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")
    print(f"[worker {process_id}] OK", flush=True)


if __name__ == "__main__":
    main()
