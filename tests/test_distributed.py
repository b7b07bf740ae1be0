"""REAL multi-process execution of the distributed prover: two OS
processes, a localhost ``jax.distributed`` coordinator, a global 8-device
mesh (4 virtual CPU devices per process), ``prove_batch`` sharding the
proof axis across both processes — and the gathered proofs must be
bit-identical to single-process ``prove`` (SURVEY §2.3/§5.8 comm-backend
analogue; the reference's only parallelism is in-process rayon,
``Cargo.toml:16,20``)."""

import os
import pickle
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_prove_bitwise_identical(tmp_path):
    try:
        port = _free_port()
    except OSError:
        pytest.skip("no localhost port available")

    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{out}"

    with open(tmp_path / "proofs.pkl", "rb") as f:
        proofs = pickle.load(f)
    assert len(proofs) == 4

    # single-process reference proofs, same witnesses (this test process
    # runs on the usual 8-device single-process CPU mesh via conftest)
    from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
    from intmax_zkp_core_tpu.engine.witness import PartialWitness
    from intmax_zkp_core_tpu.models.zkdsa.circuits import (
        make_simple_signature_circuit,
    )
    from intmax_zkp_core_tpu.utils.hash_out import HashOut

    circ = make_simple_signature_circuit(
        CircuitConfig(fri=FriConfig(num_query_rounds=3, proof_of_work_bits=2))
    )
    for i, mp in enumerate(proofs):
        pw = PartialWitness()
        circ.targets.set_witness(
            pw, HashOut.from_u64(101 + i), HashOut.from_u64(7 + i)
        )
        assert mp == circ.data.prove(pw), f"proof {i} differs across processes"
        circ.data.verify(mp)
