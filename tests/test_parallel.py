"""Multi-device tests on the virtual 8-device CPU mesh: sharded NTT
bit-exactness vs the single-device kernel, and the distributed prove step
(data-parallel hashing + all-to-all NTT + collective Merkle reduction)."""

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
