"""Pallas Poseidon kernel: interpreter-mode correctness vs the scalar
oracle (the compiled TPU path is cross-checked in the device drives)."""

import numpy as np

import jax.numpy as jnp

from intmax_zkp_core_tpu.ops.poseidon import permute_s
from intmax_zkp_core_tpu.ops.poseidon_pallas import permute_pallas

P = 0xFFFFFFFF00000001


def test_pallas_kernel_interpret_matches_scalar():
    rng = np.random.default_rng(11)
    x = rng.integers(0, P, size=(256, 12), dtype=np.uint64)
    # include edge values that stress the limb arithmetic
    x[0] = 0
    x[1] = P - 1
    x[2, :6] = 0xFFFFFFFF
    out = np.asarray(permute_pallas(jnp.asarray(x), True))
    for i in [0, 1, 2, 3, 255]:
        assert [int(v) for v in out[i]] == permute_s([int(v) for v in x[i]]), i


def test_permute_via_pallas_padding_and_reshape():
    # _permute_via_pallas must agree with the jnp path for non-tile-multiple
    # row counts and multi-dim leading batches (interpret mode on CPU)
    from intmax_zkp_core_tpu.ops.poseidon import _permute_via_pallas, permute

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.integers(0, P, size=(3, 100, 12), dtype=np.uint64))
    out = np.asarray(_permute_via_pallas(x, True))
    ref = np.asarray(permute(x))
    assert (out == ref).all()


def test_permute_auto_cpu_dispatch():
    # on the CPU backend permute_auto must be the plain jnp path
    from intmax_zkp_core_tpu.ops.poseidon import permute, permute_auto

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.integers(0, P, size=(300, 12), dtype=np.uint64))
    assert (np.asarray(permute_auto(x)) == np.asarray(permute(x))).all()


def test_pallas_mxu_mds_interpret_matches_scalar():
    # the MXU MDS path (8-bit limb planes, bf16 matmul, f32 accumulate)
    # must be bit-identical to the VPU accumulate path
    rng = np.random.default_rng(17)
    x = rng.integers(0, P, size=(256, 12), dtype=np.uint64)
    x[0] = 0
    x[1] = P - 1
    out = np.asarray(permute_pallas(jnp.asarray(x), True, mxu=True))
    for i in [0, 1, 2, 255]:
        assert [int(v) for v in out[i]] == permute_s([int(v) for v in x[i]]), i


def test_fused_sponge_kernel_interpret_matches_scalar():
    from intmax_zkp_core_tpu.ops.poseidon import hash_n_to_m_no_pad_s
    from intmax_zkp_core_tpu.ops.poseidon_pallas import hash_no_pad_pallas

    rng = np.random.default_rng(21)
    # width 15 = two absorb chunks with a 7-lane partial tail — the
    # essential fused-chunk logic.  Other widths run the same static loop
    # and are cross-checked on-device by the TPU drives; interpret mode is
    # too slow to enumerate them here.
    for width in (15,):
        x = rng.integers(0, P, size=(256, width), dtype=np.uint64)
        x[0] = 0
        out = np.asarray(hash_no_pad_pallas(jnp.asarray(x), True))
        for i in (0, 1, 255):
            want = hash_n_to_m_no_pad_s([int(v) for v in x[i]], 4)
            assert [int(v) for v in out[i]] == list(want), (width, i)
