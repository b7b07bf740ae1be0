"""Runtime mode flags + program warmup for long-lived provers.

The framework has two legitimate operating points on a TPU backend
(docs/perf_notes.md round 3 measured why):

* **fresh-process** — one-shot proving.  Mosaic/Pallas custom-call
  programs cost 20-140 s for their first call in a process through the
  remote backend (regardless of size), so the default dispatch paths
  use the plain-jnp kernels whose programs load in 2-8 s.
* **serving** — a resident block producer.  Steady-state throughput is
  what matters, so the hand-written Pallas kernels (2x permutation,
  1.5x gate quotient) should be the defaults and their programs should
  be loaded once at startup.

``INTMAX_TPU_SERVING=1`` flips every such trade at once, and
``warmup()`` preloads the serving-mode programs so the first proof is
already steady-state.  Explicit per-kernel env switches
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
    return os.environ.get("INTMAX_TPU_SERVING") == "1"


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
