"""Poseidon-gate quotient Pallas kernel: interpreter-mode bit-exactness
against the jnp `_gate_quotient_chunk` path (the compiled TPU kernel is
cross-checked by the device drives)."""

import numpy as np

import jax.numpy as jnp

P = 0xFFFFFFFF00000001


def test_poseidon_gate_quotient_limb_matches_jnp():
    # the limb-plane tile computation (the exact math the Pallas kernel
    # runs — ops/gate_quotient_pallas._tile_compute) must be bit-identical
    # to the u64 _gate_quotient_chunk path.  Run as a plain jitted graph:
    # Pallas interpret mode is far too slow for the 123-constraint body
    # (>50 min at L=64); the pallas_call plumbing itself is validated by
    # the on-device drives.
    from intmax_zkp_core_tpu.engine.prover import _gate_quotient_chunk
    from intmax_zkp_core_tpu.ops.gate_quotient_pallas import (
        poseidon_gate_quotient_jnp_limb,
    )

    W, n_const, C, L = 135, 16, 2, 256
    rng = np.random.default_rng(23)

    def arr(*shape):
        return jnp.asarray(rng.integers(0, P, size=shape, dtype=np.uint64))

    wires = arr(W, L)
    sel = arr(L)
    const_cols = arr(n_const, L)
    pi_hash = arr(4)
    alphas = arr(C)
    acc = arr(C, L)
    apows = arr(C)

    ref_fn = _gate_quotient_chunk("poseidon", 0, 123, W, n_const, C, use_jit=False)
    ref_acc, ref_apows = ref_fn(wires, sel, const_cols, pi_hash, alphas, acc, apows)

    out_acc, out_apows = poseidon_gate_quotient_jnp_limb(
        wires, sel, alphas, acc, apows, C
    )
    assert (np.asarray(out_apows) == np.asarray(ref_apows)).all()
    assert (np.asarray(out_acc) == np.asarray(ref_acc)).all()
