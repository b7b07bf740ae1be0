"""Runtime mode flags + program warmup for long-lived provers.

On accelerator backends the hand-written Pallas/Mosaic kernels are the
default since round 5 (see ``serving_enabled``): with the persisted
executable cache (ops/pallas_aot.py) their small artifacts load faster
per process than the multi-hundred-MB XLA-emulated u64 programs, and
they compute 1.5-3x faster — so they win BOTH the fresh-process and the
steady-state operating point (docs/perf_notes.md rounds 4-5).
``INTMAX_TPU_SERVING=0`` restores the jnp dispatch everywhere;
``warmup()`` preloads the serving-mode programs so a resident prover's
first proof is already steady-state.  Explicit per-kernel env switches
(``INTMAX_TPU_POSEIDON_PALLAS``, ``INTMAX_TPU_GATE_PALLAS``,
``INTMAX_TPU_POSEIDON_MXU``) still win over the mode default in both
directions.

Reference scope: the reference has no server mode (it is a library and
three binaries, SURVEY §5.6); this is the TPU-deployment analogue of
"keep the rayon pool warm".
"""

from __future__ import annotations

import os
import time


def _flag(name: str, mode_default: bool) -> bool:
    """An explicit 0/1 env setting wins; otherwise the mode default."""
    v = os.environ.get(name)
    if v == "1":
        return True
    if v == "0":
        return False
    return mode_default


def serving_enabled() -> bool:
    """Serving kernels (the hand-written Pallas/Mosaic set) are the
    DEFAULT on accelerator backends since round 5.

    The original reason to default to the jnp kernels — a Mosaic
    program's 20-140 s per-process first call through the remote
    backend — was diagnosed in round 4 as per-process REMOTE
    RECOMPILATION (pallas lowerings are not byte-stable, so the
    HLO-keyed cache always missed) and fixed by persisting compiled
    executables (ops/pallas_aot.py).  With warm executable caches a
    fresh process now runs the full recursive block flow FASTER with
    the Pallas kernels (~210-250 s) than with the jnp kernels (~565 s,
    multi-hundred-MB artifact loads) — measured 2026-08-21, v5e
    (docs/perf_notes.md round 5).  INTMAX_TPU_SERVING=0 restores the
    jnp dispatch; CPU backends keep the portable jnp path."""
    v = os.environ.get("INTMAX_TPU_SERVING")
    if v == "1":
        return True
    if v == "0":
        return False
    import jax

    return jax.default_backend() != "cpu"


def poseidon_pallas_enabled() -> bool:
    """Pallas permutation/sponge kernels on the eager hashing paths."""
    return _flag("INTMAX_TPU_POSEIDON_PALLAS", serving_enabled())


def gate_pallas_enabled() -> bool:
    """Pallas Poseidon-gate quotient kernel in the prover."""
    return _flag("INTMAX_TPU_GATE_PALLAS", serving_enabled())


def perm_pallas_enabled() -> bool:
    """Pallas permutation-argument columns kernel in the prover
    (ops/perm_columns_pallas): ~100x smaller compiled artifact than the
    XLA-emulated u64 graph (fresh-process load economics,
    docs/perf_notes.md round 4)."""
    return _flag("INTMAX_TPU_PERM_PALLAS", serving_enabled())


def enable_serving() -> None:
    """Programmatic equivalent of exporting INTMAX_TPU_SERVING=1."""
    os.environ["INTMAX_TPU_SERVING"] = "1"


def warmup(max_log_rows: int = 18, verbose: bool = False) -> float:
    """Load the serving-mode device programs once, up front.

    Dispatches one tiny call through every Mosaic program a proving
    service touches: the permutation kernel at each 256*4^k batch bucket
    up to ``4^ceil(log4(2^max_log_rows/256))`` rows and the fused sponge
    at the common widths.  First calls are issued WITHOUT intermediate
    blocking — through the async dispatch queue the remote backend can
    overlap program transfers — and drained once at the end.  Returns
    the wall-clock spent.

    Gate-quotient programs are per-circuit-shape; they warm up on the
    first proof (or via ``engine.batch_prover.prove_batch`` of a dummy
    witness).  No-op on CPU backends.
    """
    import jax

    if jax.default_backend() == "cpu":
        return 0.0
    t0 = time.perf_counter()
    import numpy as np
    import jax.numpy as jnp

    from .ops import poseidon as ps

    outs = []
    if poseidon_pallas_enabled():
        from .ops.poseidon_pallas import hash_no_pad_pallas, permute_pallas

        b = 256
        while b <= (1 << max_log_rows):
            states = jnp.zeros((b, 12), dtype=jnp.uint64)
            outs.append(permute_pallas(states))
            b *= 4
        for width in (8, 12):
            outs.append(hash_no_pad_pallas(jnp.zeros((256, width), jnp.uint64)))
    # the jnp permutation buckets are cheap to load but still per-program;
    # touch them too so tree builds never stall mid-proof.  NB this must
    # trace the pallas-free jnp body (_permute_jnp_jit): tracing the auto
    # dispatch here under serving mode would embed the pallas_call in a
    # plain-jit graph with a process-unstable HLO cache key (silent
    # 20-80 s remote recompile per bucket per process — ADVICE round 4).
    b = 256
    while b <= (1 << max_log_rows):
        outs.append(ps._permute_jnp_jit(jnp.zeros((b, 12), dtype=jnp.uint64)))
        b *= 4
    for o in outs:
        np.asarray(o.ravel()[:1])
    dt = time.perf_counter() - t0
    if verbose:
        print(f"[serving] warmup: {len(outs)} programs in {dt:.1f}s", flush=True)
    return dt
