"""Benchmarks on the current JAX backend, one JSON line per metric:

* ``ntt_2pow16_per_s`` / ``ntt_2pow20_per_s`` — batched radix-2 NTT
  throughput at the BASELINE.json sizes (the prover's commitment engine).
* ``zkdsa_proofs_per_s`` — end-to-end zkDSA proofs/s at
  ``standard_recursion_config`` (28 query rounds, 16 pow bits), batched
  K=8 through ``engine.batch_prover.prove_batch``.
* ``block_flow_warm_s`` — the FLAGSHIP: warm wall-clock of the full
  recursive block flow (reference ``src/bin/block_circuit.rs:678-688``),
  measured against the same flow on the 4-core CPU host.  Emitted only
  when caches are warm (a cold machine times the stage out).
* ``poseidon_permutations_per_s`` — batched Poseidon permutation
  throughput (the framework's dominant primitive).  Printed LAST: it is
  the headline metric the driver parses, comparable across rounds.

Baseline caveats (recorded in each line's ``baseline_note``): the
reference publishes no numbers (BASELINE.md) and no Rust toolchain exists
here, so Poseidon/NTT baselines are MODELED from commonly reported
plonky2 CPU figures; the zkDSA baseline IS measured — this repo's own
prover on this 4-core CPU host (docs/perf_notes.md: 4.2 s/proof steady
state at the same full FRI config).
"""

import json
import sys
import time

import numpy as np

# ~1.2 us/perm single-thread plonky2 on server x86 (modeled, not measured)
REFERENCE_CPU_HASHES_PER_S = 0.8e6
# modeled single-thread CPU radix-2 NTT over Goldilocks: ~3 ns per
# butterfly-point => t(n) ~ 3e-9 * n * log2(n)
_NTT_BASELINE = {16: 1.0 / (3e-9 * (1 << 16) * 16), 20: 1.0 / (3e-9 * (1 << 20) * 20)}
# measured: this repo's prover on the 4-core CPU host, steady state
REFERENCE_CPU_ZKDSA_PROOFS_PER_S = 1.0 / 4.2


def _chain_throughput(fn, x, unit_count: int, iters: int, reps: int = 3) -> float:
    """Steady-state throughput of ``x -> fn(x)`` chains: time n chained
    dispatches ended by a tiny host readback (block_until_ready over the
    tunnel can return early), difference two chain lengths to cancel
    fixed per-call overhead."""

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        out = x
        for _ in range(n):
            out = fn(out)
        np.asarray(out.ravel()[:1])
        return time.perf_counter() - t0

    np.asarray(fn(x).ravel()[:1])  # warm-up / compile
    t_short = min(chain(4) for _ in range(reps))
    t_long = min(chain(4 + iters) for _ in range(reps))
    return unit_count * iters / max(t_long - t_short, 1e-9)


def _emit(metric: str, value: float, unit: str, vs_baseline: float, note: str) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": unit,
                "vs_baseline": round(vs_baseline, 3),
                "baseline_note": note,
            }
        ),
        flush=True,
    )


def _measure_poseidon(batch: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from intmax_zkp_core_tpu.ops import poseidon as ps

    rng = np.random.default_rng(7)
    states = jnp.asarray(
        rng.integers(0, 0xFFFFFFFF00000001, size=(batch, 12), dtype=np.uint64)
    )
    fn = jax.jit(ps.permute)
    if jax.default_backend() not in ("cpu",):
        # The hand-written Pallas kernel is ~2.2x the XLA-emulated u64 path
        # on TPU (measured on v5e); verify it against the jnp path on this
        # batch before trusting it, fall back if unavailable.
        try:
            from intmax_zkp_core_tpu.ops.poseidon_pallas import permute_pallas

            # called EAGERLY: the entry routes through the persisted
            # executable cache — wrapping it in plain jax.jit would give
            # the graph a process-unstable HLO cache key (remote
            # recompile per bench process; ops/pallas_aot.py)
            if bool((permute_pallas(states) == fn(states)).all()):
                fn = permute_pallas
        except Exception:
            pass
    return _chain_throughput(fn, states, batch, iters)


def _measure_ntt(log_n: int, batch: int, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from intmax_zkp_core_tpu.ops import ntt as nt

    rng = np.random.default_rng(11)
    a = jnp.asarray(
        rng.integers(0, 0xFFFFFFFF00000001, size=(batch, 1 << log_n), dtype=np.uint64)
    )
    fn = nt.ntt
    if jax.default_backend() not in ("cpu",):
        # the Mosaic four-step kernel is the accelerator default; verify
        # bit-identity against the pure-XLA formulation on this batch
        # before trusting it.  ntt_jnp, NOT _ntt_jit: under the serving
        # default the latter would trace the Pallas branch inside plain
        # jit (process-unstable HLO key) and compare pallas to pallas.
        try:
            from intmax_zkp_core_tpu.ops.ntt_pallas import (
                can_pallas_ntt,
                ntt_pallas,
            )

            if can_pallas_ntt(1 << log_n) and bool(
                (ntt_pallas(a) == jax.jit(nt.ntt_jnp)(a)).all()
            ):
                fn = ntt_pallas
        except Exception:
            pass
    return _chain_throughput(fn, a, batch, iters)


def _measure_block_flow(serving: bool) -> tuple:
    """Wall-clock of the FLAGSHIP workload: the full recursive block flow
    (2 senders, recursive user-tx + signature verification in-circuit,
    32768-row block circuit, FriConfig(3, 2)) — the reference's headline
    binary (src/bin/block_circuit.rs:678-688).

    ``serving=True``: INTMAX_TPU_SERVING=1 (the hand-written Pallas
    kernels are the defaults) and the flow runs TWICE — the second run is
    the serving steady state, everything loaded, every proof fully
    recomputed (history of measured values: docs/perf_notes.md).
    ``serving=False``: one run with the DEFAULT dispatch — since round 5
    that is the serving kernel set on accelerators (small persisted
    executables; runtime.serving_enabled) — measuring the fresh-process
    configuration: every per-process program load/deserialize is paid
    inside the timed window.  (A first-ever run on a machine pays cold
    compiles instead and will blow the stage timeout; the stage is
    optional for exactly that reason.)"""
    import os

    os.environ.setdefault(
        "INTMAX_TPU_CIRCUIT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache_circ"),
    )
    if serving:
        os.environ["INTMAX_TPU_SERVING"] = "1"
    from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
    from intmax_zkp_core_tpu.models.rollup.block_flow import run_block_flow

    cfg = CircuitConfig(fri=FriConfig(num_query_rounds=3, proof_of_work_bits=2))
    t0 = time.perf_counter()
    run_block_flow(config=cfg, prove=True, recursive=True)
    fresh = time.perf_counter() - t0
    if not serving:
        return fresh, None
    t0 = time.perf_counter()
    run_block_flow(config=cfg, prove=True, recursive=True)
    steady = time.perf_counter() - t0
    return fresh, steady


# measured: the same warm recursive block flow on this 4-core CPU host
# (docs/perf_notes.md 2026-08-20: 4.7 min warm after the round-2 rework)
REFERENCE_CPU_BLOCK_FLOW_S = 282.0


def _measure_zkdsa(k: int = 8) -> float:
    """Proofs/s at standard_recursion_config, K proofs per device pass.

    Serving mode: the steady-state throughput number should use the
    serving kernels (the first, untimed prove_batch pays their loads)."""
    import os

    os.environ.setdefault("INTMAX_TPU_SERVING", "1")
    from intmax_zkp_core_tpu.engine.batch_prover import prove_batch
    from intmax_zkp_core_tpu.engine.config import CircuitConfig
    from intmax_zkp_core_tpu.engine.witness import PartialWitness
    from intmax_zkp_core_tpu.models.zkdsa.circuits import (
        make_simple_signature_circuit,
    )
    from intmax_zkp_core_tpu.utils.hash_out import HashOut

    circ = make_simple_signature_circuit(CircuitConfig.standard_recursion_config())
    pws = []
    for i in range(k):
        pw = PartialWitness()
        circ.targets.set_witness(pw, HashOut.from_u64(1 + i), HashOut.from_u64(99 + i))
        pws.append(pw)
    proofs = prove_batch(circ.data, pws)  # warm: compile-cache load
    circ.data.verify(proofs[0])
    t0 = time.perf_counter()
    prove_batch(circ.data, pws)
    return k / (time.perf_counter() - t0)


def _worker_blockflow(serving: bool) -> None:
    """Stage body for the flagship metrics (own subprocess per config:
    the flow holds the device for minutes and must not starve the other
    stages)."""
    fresh, steady = _measure_block_flow(serving)
    if serving:
        _emit(
            "block_flow_warm_s", steady, "s",
            REFERENCE_CPU_BLOCK_FLOW_S / steady,
            "SERVING steady state (INTMAX_TPU_SERVING=1 Pallas kernels, "
            "2nd in-process run, all programs loaded, proofs fully "
            "recomputed); baseline MEASURED: same warm recursive block "
            "flow on the 4-core CPU host (282 s); vs_baseline > 1 means "
            "faster than CPU",
        )
    else:
        _emit(
            "block_flow_freshproc_s", fresh, "s",
            REFERENCE_CPU_BLOCK_FLOW_S / fresh,
            "fresh-process run, default dispatch (serving Pallas kernels "
            "+ persisted executables since round 5; pays every "
            "per-process program load through the remote backend — an "
            "attached-TPU deployment pays ms-scale loads instead); same "
            "measured CPU baseline; vs_baseline > 1 means faster than "
            "CPU",
        )


def _worker(cpu: bool, only_poseidon: bool = False,
            skip_poseidon: bool = False) -> None:
    """Subprocess body: measure on the default (TPU) backend, or on CPU.

    Metrics print incrementally (cheapest-to-fail last), headline Poseidon
    LAST so the driver's tail-parse always lands on it.  The parent runs
    the TPU side in two stages (``--only-poseidon`` then
    ``--skip-poseidon``) so a cold-cache zkdsa compile marathon can never
    starve the cheap headline metric."""
    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        sizes = {"poseidon": (1 << 13, 10), 16: (2, 4), 20: (1, 2)}
        zk_k = 2
    else:
        sizes = {"poseidon": (1 << 15, 32), 16: (8, 8), 20: (2, 4)}
        zk_k = 8
    if only_poseidon:
        b, it = sizes["poseidon"]
        v = _measure_poseidon(b, it)
        _emit(
            "poseidon_permutations_per_s", v, "perm/s",
            v / REFERENCE_CPU_HASHES_PER_S,
            "baseline modeled: ~1.2us/perm single-thread plonky2 on server x86",
        )
        return
    for log_n in (16, 20):
        b, it = sizes[log_n]
        try:
            v = _measure_ntt(log_n, b, it)
            _emit(
                f"ntt_2pow{log_n}_per_s", v, "ntt/s", v / _NTT_BASELINE[log_n],
                "baseline modeled: 3ns/butterfly-point single-thread CPU "
                "(reference publishes no numbers)",
            )
        except Exception as e:  # keep later metrics alive
            print(f"# ntt 2^{log_n} failed: {e}", file=sys.stderr, flush=True)
    try:
        v = _measure_zkdsa(zk_k)
        _emit(
            "zkdsa_proofs_per_s", v, "proofs/s",
            v / REFERENCE_CPU_ZKDSA_PROOFS_PER_S,
            "baseline MEASURED: this prover on the 4-core CPU host, "
            "4.2 s/proof steady-state, same standard FRI config",
        )
    except Exception as e:
        print(f"# zkdsa failed: {e}", file=sys.stderr, flush=True)
    if skip_poseidon:
        return
    b, it = sizes["poseidon"]
    v = _measure_poseidon(b, it)
    _emit(
        "poseidon_permutations_per_s", v, "perm/s",
        v / REFERENCE_CPU_HASHES_PER_S,
        "baseline modeled: ~1.2us/perm single-thread plonky2 on server x86",
    )


def main():
    """Run the measurements in a watchdogged subprocess.

    The axon TPU tunnel can wedge (a previously killed device job leaves
    the relay holding its grant), in which case the first device call
    HANGS rather than raising — an in-process try/except never fires.
    So the parent never touches jax: it delegates to a subprocess with a
    hard timeout, then falls back to a CPU-forced subprocess (axon plugin
    skipped entirely via env) so the benchmark always prints its lines.
    Partial output from a timed-out TPU worker is kept as long as the
    headline (last) metric made it out."""
    import os
    import subprocess

    here = os.path.abspath(__file__)

    def run(args, env=None, timeout=2400):
        try:
            out = subprocess.run(
                [sys.executable, here] + args,
                capture_output=True, text=True, timeout=timeout, env=env,
            )
            return [l for l in out.stdout.splitlines() if l.startswith("{")]
        except subprocess.TimeoutExpired as e:
            stdout = e.stdout or ""
            if isinstance(stdout, bytes):
                stdout = stdout.decode(errors="replace")
            return [l for l in stdout.splitlines() if l.startswith("{")]

    # Stage 1: the cheap headline metric alone (one small kernel compile),
    # so NTT/zkdsa cold-cache compile marathons can never starve it.
    headline = run(["--tpu-worker", "--only-poseidon"], timeout=1500)
    # Stage 2: the wide metrics (NTT throughput, zkdsa proofs/s).
    lines = run(["--tpu-worker", "--skip-poseidon"])
    # Stage 3: the flagship, two configurations in their own processes —
    # serving steady state (Pallas kernels, 2 in-process runs) and the
    # default fresh-process run.  Optional: a cold-cache machine pays
    # compile marathons instead and times out, losing only these lines.
    flow = run(["--blockflow-worker", "--serving"], timeout=2400)
    flow += run(["--blockflow-worker"], timeout=1800)
    missing = [l for l in flow if "block_flow_warm_s" in l] == []
    if missing:
        print("# bench stage 3 (block flow) produced no metric "
              "(cold caches or dead TPU)", file=sys.stderr, flush=True)
    lines = flow + lines
    if headline and not lines:
        # stage 2 died/timed out after a healthy stage 1: the TPU is alive,
        # so a full CPU fallback would mislabel the backend — flag it instead
        print("# bench stage 2 (ntt/zkdsa) produced no metrics; "
              "headline is TPU-measured but wide metrics are missing",
              file=sys.stderr, flush=True)
    lines += headline  # headline LAST: the driver tail-parses it
    if not any("poseidon_permutations_per_s" in l for l in lines):
        env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
        env["JAX_PLATFORMS"] = "cpu"
        lines += run(["--cpu-worker"], env=env)
    if not lines:
        raise RuntimeError("bench workers produced no result")
    for line in lines:
        print(line)


if __name__ == "__main__":
    if "--tpu-worker" in sys.argv:
        _worker(
            cpu=False,
            only_poseidon="--only-poseidon" in sys.argv,
            skip_poseidon="--skip-poseidon" in sys.argv,
        )
    elif "--blockflow-worker" in sys.argv:
        _worker_blockflow(serving="--serving" in sys.argv)
    elif "--cpu-worker" in sys.argv:
        _worker(cpu=True)
    else:
        main()
