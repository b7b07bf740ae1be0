"""Poseidon permutation/sponge tests: batched JAX kernel vs scalar oracle,
plus the reference bit-exactness golden digest (gated on provenance flag)."""

import numpy as np
import pytest

import jax.numpy as jnp

from intmax_zkp_core_tpu.ops import goldilocks as gl
from intmax_zkp_core_tpu.ops import poseidon as ps
from intmax_zkp_core_tpu.ops.poseidon_constants import (
    BITEXACT_VERIFIED,
    REFERENCE_GOLDEN_ZERO_DIGEST,
)

P = gl.P_INT
RNG = np.random.default_rng(1)


def test_permute_batched_matches_scalar():
    batch = 16
    states = RNG.integers(0, P, size=(batch, 12), dtype=np.uint64)
    got = np.asarray(ps.permute(jnp.asarray(states)))
    for i in range(batch):
        want = ps.permute_s([int(x) for x in states[i]])
        assert [int(x) for x in got[i]] == want, i


def test_hash_no_pad_matches_scalar():
    for n in [1, 4, 8, 9, 12, 16, 17]:
        x = RNG.integers(0, P, size=(3, n), dtype=np.uint64)
        got = np.asarray(ps.hash_no_pad(jnp.asarray(x)))
        for i in range(3):
            want = ps.hash_no_pad_s([int(v) for v in x[i]])
            assert [int(v) for v in got[i]] == want, (n, i)


def test_hash_pad_matches_scalar():
    for n in [4, 8, 9, 11]:
        x = RNG.integers(0, P, size=(2, n), dtype=np.uint64)
        got = np.asarray(ps.hash_pad(jnp.asarray(x)))
        for i in range(2):
            want = ps.hash_pad_s([int(v) for v in x[i]])
            assert [int(v) for v in got[i]] == want, (n, i)


def test_two_to_one_matches_scalar():
    l = RNG.integers(0, P, size=(5, 4), dtype=np.uint64)
    r = RNG.integers(0, P, size=(5, 4), dtype=np.uint64)
    got = np.asarray(ps.two_to_one(jnp.asarray(l), jnp.asarray(r)))
    for i in range(5):
        want = ps.two_to_one_s([int(v) for v in l[i]], [int(v) for v in r[i]])
        assert [int(v) for v in got[i]] == want


def test_hash_pad_8_gives_12_lane_block():
    # 8 inputs + pad -> exactly one 12-lane block: flags at lanes 8 and 11
    # (reference common.rs:87-101 leaf-hash layout).
    x = [int(v) for v in RNG.integers(0, P, size=8, dtype=np.uint64)]
    direct = ps.hash_no_pad_s(x + [1, 0, 0, 1])
    assert ps.hash_pad_s(x) == direct


def test_sponge_absorb_overwrites():
    # 9 inputs: second block overwrites lane 0 only; remaining lanes carry
    # the permuted state (distinguishes overwrite- from add-absorption).
    x = [int(v) for v in RNG.integers(0, P, size=9, dtype=np.uint64)]
    st = [0] * 12
    st[:8] = x[:8]
    st = ps.permute_s(st)
    st[0] = x[8]
    st = ps.permute_s(st)
    assert ps.hash_no_pad_s(x) == st[:4]


@pytest.mark.xfail(
    not BITEXACT_VERIFIED,
    reason="plonky2 round-constant reconstruction not yet bit-exact "
    "(poseidon_constants.BITEXACT_VERIFIED=False); tracked for a later pass",
    strict=True,
)
def test_reference_golden_zero_digest():
    # reference src/zkdsa/circuits/mod.rs:85-101: two_to_one(0-hash, 0-hash)
    got = ps.two_to_one_s([0, 0, 0, 0], [0, 0, 0, 0])
    assert tuple(got) == REFERENCE_GOLDEN_ZERO_DIGEST
