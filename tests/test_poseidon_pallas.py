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


def test_limb64_partial_primitives_vs_bigint():
    # loose-reduction primitives: result must be < 2^64 and congruent
    # mod p for ARBITRARY u64 inputs (the kernel feeds them loose,
    # non-canonical values); exercise extremes the random draw misses.
    from intmax_zkp_core_tpu.ops import limb64 as limb

    rng = np.random.default_rng(31)
    vals = list(rng.integers(0, 1 << 64, size=200, dtype=np.uint64))
    vals += [0, 1, P - 1, P, P + 1, (1 << 64) - 1, (1 << 32) - 1,
             1 << 32, (1 << 64) - (1 << 32), 0xFFFFFFFF00000000]
    a = np.array(vals, dtype=np.uint64)
    b = np.array(list(reversed(vals)), dtype=np.uint64)
    alo = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32))
    ahi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32))
    blo = jnp.asarray((b & 0xFFFFFFFF).astype(np.uint32))
    bhi = jnp.asarray((b >> np.uint64(32)).astype(np.uint32))

    def recomb(lo, hi):
        return np.asarray(lo).astype(np.uint64) | (
            np.asarray(hi).astype(np.uint64) << np.uint64(32))

    got_sq = recomb(*limb.sqr_mod_partial(alo, ahi))
    got_mul = recomb(*limb.mul_mod_partial(alo, ahi, blo, bhi))
    got_sbox = recomb(*limb.sbox7(alo, ahi))
    for i, (x, y) in enumerate(zip(a.tolist(), b.tolist())):
        assert int(got_sq[i]) % P == (x * x) % P, ("sqr", i, x)
        assert int(got_mul[i]) % P == (x * y) % P, ("mul", i, x, y)
        assert int(got_sbox[i]) == pow(x, 7, P), ("sbox", i, x)

    # reduce128_partial over random + extreme 128-bit column values
    n = rng.integers(0, 1 << 32, size=(4, 64), dtype=np.uint64).astype(np.uint32)
    n[:, :2] = 0xFFFFFFFF  # all-ones columns: the double-wrap stress case
    n[:, 2] = 0
    cols = [jnp.asarray(n[i]) for i in range(4)]
    got = recomb(*limb.reduce128_partial(*cols))
    for i in range(n.shape[1]):
        want = (int(n[0, i]) + (int(n[1, i]) << 32) + (int(n[2, i]) << 64)
                + (int(n[3, i]) << 96)) % P
        assert int(got[i]) % P == want, ("reduce", i)
        assert int(got[i]) < (1 << 64)
