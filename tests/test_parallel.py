"""Multi-device tests on the virtual 8-device CPU mesh: sharded NTT
bit-exactness vs the single-device kernel, the distributed prove step
(data-parallel hashing + all-to-all NTT + collective Merkle reduction),
and the DISTRIBUTED PROVER — ``prove_batch(mesh=...)`` sharding the proof
axis over all 8 devices must emit proofs bit-identical to single-device
``prove`` (SURVEY §2.3 proof-level axis; reference
``rollup/circuits/mod.rs:450-489`` generates these proofs serially)."""

import numpy as np

import jax
import jax.numpy as jnp

from intmax_zkp_core_tpu.ops import goldilocks as gl
from intmax_zkp_core_tpu.ops import ntt as nt
from intmax_zkp_core_tpu.ops.poseidon import permute_s, two_to_one_s
from intmax_zkp_core_tpu.parallel.mesh import make_mesh
from intmax_zkp_core_tpu.parallel.ntt_sharded import ntt_sharded
from intmax_zkp_core_tpu.parallel.prove_step import make_distributed_prove_step

P = gl.P_INT
RNG = np.random.default_rng(9)


def test_ntt_sharded_matches_single_device():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    for log_n in [10, 12]:
        x = RNG.integers(0, P, size=(1 << log_n,), dtype=np.uint64)
        want = np.asarray(nt.ntt(jnp.asarray(x)[None, :]))[0]
        got = np.asarray(ntt_sharded(jnp.asarray(x), mesh))
        assert (got == want).all(), log_n


def test_distributed_prove_step():
    mesh = make_mesh(8)
    step = make_distributed_prove_step(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    B, n = 128, 1 << 10
    states = jax.device_put(
        jnp.asarray(RNG.integers(0, P, size=(B, 12), dtype=np.uint64)),
        NamedSharding(mesh, PSpec("d", None)),
    )
    poly = jnp.asarray(RNG.integers(0, P, size=(n,), dtype=np.uint64))
    hashed, evals, root = step(states, poly)

    # sharded hash == scalar oracle
    h0 = [int(v) for v in np.asarray(hashed)[0]]
    assert h0 == permute_s([int(v) for v in np.asarray(states)[0]])
    # sharded NTT == single-device
    want = np.asarray(nt.ntt(poly[None, :]))[0]
    assert (np.asarray(evals) == want).all()
    # collective Merkle root == host-folded root over per-device local roots
    hs = np.asarray(hashed)[:, :4]

    def local_root(digests):
        ds = [tuple(int(x) for x in d) for d in digests]
        while len(ds) > 1:
            ds = [tuple(two_to_one_s(ds[2 * i], ds[2 * i + 1])) for i in range(len(ds) // 2)]
        return ds[0]

    per_dev = [local_root(hs[i * (B // 8) : (i + 1) * (B // 8)]) for i in range(8)]
    assert tuple(int(x) for x in np.asarray(root)) == local_root(per_dev)


def test_coset_lde_sharded_matches_single_device():
    """Batched four-step coset LDE over the mesh == the single-device
    kernel, bit for bit."""
    from intmax_zkp_core_tpu.parallel.ntt_sharded import (
        can_shard,
        coset_lde_sharded,
        ntt_sharded_batch,
    )

    mesh = make_mesh(8)
    for B, log_n, rate_bits in [(3, 9, 3), (5, 10, 2)]:
        n = 1 << log_n
        assert can_shard(n << rate_bits, 8)
        a = jnp.asarray(RNG.integers(0, P, size=(B, n), dtype=np.uint64))
        want = np.asarray(nt.coset_lde(a, rate_bits))
        got = np.asarray(coset_lde_sharded(a, rate_bits, mesh))
        assert (got == want).all(), (B, log_n, rate_bits)
        evals = np.asarray(ntt_sharded_batch(a, mesh))
        assert (evals == np.asarray(nt.ntt(a))).all()


def test_merkle_levels_sharded_bitwise_identical():
    """The mesh-sharded Merkle builder (local subtree hashing + one [d, 4]
    block-root all_gather) reproduces every level of the single-device
    builder bit for bit, and its big levels actually COME BACK SHARDED over
    the mesh axis — the collective path is exercised, not gathered away."""
    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    from intmax_zkp_core_tpu.ops import merkle as mk
    from intmax_zkp_core_tpu.parallel.merkle_sharded import (
        build_merkle_levels_sharded,
        can_shard_tree,
    )

    mesh = make_mesh(8)
    for n, w, cap_height in [(256, 7, 1), (128, 4, 3), (64, 9, 4)]:
        # cap_height 1 < log2(d): exercises the replicated top levels;
        # cap_height >= log2(d): all levels sharded, no collective at all
        assert can_shard_tree(n, 8, cap_height)
        leaves = jnp.asarray(RNG.integers(0, P, size=(n, w), dtype=np.uint64))
        want = [np.asarray(l) for l in mk.build_merkle_levels(leaves, cap_height)]
        got = build_merkle_levels_sharded(leaves, cap_height, mesh)
        assert len(got) == len(want)
        for lw, lg in zip(want, got):
            assert (np.asarray(lg) == lw).all(), (n, cap_height, lw.shape)
        # sharding check: the leaf-digest level is row-sharded, not gathered
        assert got[0].sharding == NamedSharding(mesh, PSpec("d", None)), (
            got[0].sharding
        )


def test_sharded_commit_prove_bitwise_identical(monkeypatch):
    """A full single-proof ``prove`` whose commitments run the mesh-sharded
    LDE (``use_commit_mesh`` + forced-low size threshold) emits a proof
    bit-identical to the plain single-device prover, and the sharded
    Merkle-tree path is actually exercised inside ``_commit``."""
    from intmax_zkp_core_tpu.engine import prover as prover_mod
    from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
    from intmax_zkp_core_tpu.engine.witness import PartialWitness
    from intmax_zkp_core_tpu.models.zkdsa.circuits import (
        make_simple_signature_circuit,
    )
    from intmax_zkp_core_tpu.parallel import merkle_sharded
    from intmax_zkp_core_tpu.parallel.mesh import use_commit_mesh
    from intmax_zkp_core_tpu.utils.hash_out import HashOut

    circ = make_simple_signature_circuit(
        CircuitConfig(fri=FriConfig(num_query_rounds=3, proof_of_work_bits=2))
    )
    pw = PartialWitness()
    circ.targets.set_witness(pw, HashOut.from_u64(77), HashOut.from_u64(3))
    plain = circ.data.prove(pw)

    monkeypatch.setattr(prover_mod, "SHARD_COMMIT_MIN_LDE", 1)
    mesh = make_mesh(8)
    calls_before = merkle_sharded.SHARDED_TREE_CALLS
    with use_commit_mesh(mesh):
        sharded = circ.data.prove(pw)
    assert merkle_sharded.SHARDED_TREE_CALLS > calls_before, (
        "sharded Merkle path was not taken"
    )
    assert sharded == plain
    circ.data.verify(sharded)


def test_distributed_prove_batch_bitwise_identical():
    """K=5 real zkDSA proofs sharded over the 8-device mesh (pads to 8,
    one proof per device) are bit-identical to single-device ``prove`` and
    verify — the multi-chip prover path the driver's dryrun exercises."""
    from intmax_zkp_core_tpu.engine.batch_prover import prove_batch
    from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
    from intmax_zkp_core_tpu.engine.witness import PartialWitness
    from intmax_zkp_core_tpu.models.zkdsa.circuits import (
        make_simple_signature_circuit,
    )
    from intmax_zkp_core_tpu.utils.hash_out import HashOut

    mesh = make_mesh(8)
    circ = make_simple_signature_circuit(
        CircuitConfig(fri=FriConfig(num_query_rounds=3, proof_of_work_bits=2))
    )
    pws = []
    for i in range(5):
        pw = PartialWitness()
        circ.targets.set_witness(pw, HashOut.from_u64(41 + i), HashOut.from_u64(5 + i))
        pws.append(pw)
    mesh_proofs = prove_batch(circ.data, pws, mesh=mesh)
    assert len(mesh_proofs) == 5
    for pw, mp in zip(pws, mesh_proofs):
        assert mp == circ.data.prove(pw)
        circ.data.verify(mp)


def test_init_distributed_single_process_falls_back_to_local_mesh():
    """Multi-host entry point (SURVEY §2.3 comm-backend analogue): without
    a coordinator it degrades to the local-device mesh and is idempotent."""
    from intmax_zkp_core_tpu.parallel.mesh import init_distributed

    m1 = init_distributed()
    m2 = init_distributed()
    assert m1.shape == m2.shape
    assert m1.shape["d"] == len(jax.devices())
