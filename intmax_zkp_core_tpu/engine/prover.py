"""The Plonk-style prover: witness fill -> wire commitment -> permutation
argument -> quotient -> FRI opening proof.

This is the counterpart of ``CircuitData::prove`` (the reference's hot loop,
``SURVEY.md`` §3.1: witness generation -> wire polys -> NTT/LDE -> quotient
-> FRI commit/fold -> Merkle caps).  All polynomial work is batched on
device; host code only orchestrates and runs the Fiat-Shamir transcript.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import goldilocks as gl
from ..ops import merkle as mk
from ..ops import ntt as nt
from ..ops import poseidon as ps
from .algebra import BatchAlgebra, ext_add, ext_inv, ext_mul, ext_pow, ext_sub
from .challenger import Challenger
from .circuit import CircuitData
from .fri import FriProof, fold_layers, grind_pow, query_rounds
from .gates import GATE_TYPES
from .witness import PartialWitness, WitnessFill

P = gl.P_INT

# permutation-argument chunking: 7 wires per partial product keeps the
# constraint degree at 8 (= CircuitConfig.max_degree)
CHUNK = 7

# constraints per jitted quotient chunk: bounds the size of any single
# device compile (one monolithic quotient graph for a many-constraint gate
# overwhelms remote compile services; see docs/perf_notes.md).  128 gives
# one kernel per gate type (poseidon: 123, u32_mul_add: 108) — each chunk's
# trace evaluates the FULL gate and slices, so fewer chunks means ~6x less
# per-process tracing/lowering; sized 24 only while kernels still baked
# megabytes of literals (tables now ride in as arguments).  Overridable
# via INTMAX_TPU_GATE_CHUNK for experiments — NOTE changing it invalidates
# every cached chunk compile for the affected gates.
GATE_QUOTIENT_CHUNK = int(os.environ.get("INTMAX_TPU_GATE_CHUNK", "128"))

# (gate_id, lo, hi, num_wires, n_const, C) -> (fn, jitted fn); module-level
# so identical chunks are traced/compiled once across circuits in-process
# (the persistent compilation cache dedups across processes)
_GATE_CHUNK_CACHE: dict = {}


def n_chunks(num_routed: int) -> int:
    return (num_routed + CHUNK - 1) // CHUNK


def _gate_quotient_chunk(gate_id: str, lo: int, hi: int, num_wires: int,
                         n_const: int, C: int, use_jit: bool):
    """Kernel accumulating alpha-combined, selector-filtered constraints
    ``lo:hi`` of one gate type onto the running quotient numerator:

        acc'[c] = acc[c] + sum_k alphas[c]^k * sel * constraint_{lo+k}
        apows'[c] = apows[c] * alphas[c]^(hi-lo)

    Constraints are wire-local (intermediates live in wires), so slicing
    before jit lets DCE prune the untouched constraints' subgraphs."""
    key = (gate_id, lo, hi, num_wires, n_const, C)
    # Pallas path (INTMAX_TPU_GATE_PALLAS=1 or serving mode, non-CPU
    # backends): the whole poseidon-gate evaluation runs as one
    # VMEM-resident limb-plane kernel (ops/gate_quotient_pallas) — 1.5x
    # the jnp chunk's warm compute (0.047 s vs 0.073 s at [135, 2^18])
    # and a 16 MB artifact vs the 534 MB aotx.  Opt-in rather than
    # default: through the remote axon backend a Mosaic program's
    # per-process first call costs ~100 s regardless of size
    # (docs/perf_notes.md round 3), which a fresh process never
    # amortizes; a long-lived prover service sets INTMAX_TPU_SERVING=1.
    from ..runtime import gate_pallas_enabled

    if (
        use_jit
        and gate_id == "poseidon"
        and lo == 0
        and hi == GATE_TYPES[gate_id].num_constraints
        and jax.default_backend() != "cpu"
        and gate_pallas_enabled()
    ):
        pkey = key + ("pallas",)
        entry = _GATE_CHUNK_CACHE.get(pkey)
        if entry is None:
            from ..ops.gate_quotient_pallas import poseidon_gate_quotient_pallas

            def run_pallas(wires_lde, sel_col, const_cols, pi_hash, alphas,
                           acc, apows):
                return poseidon_gate_quotient_pallas(
                    wires_lde, sel_col, alphas, acc, apows, C
                )

            entry = (run_pallas, run_pallas)
            _GATE_CHUNK_CACHE[pkey] = entry
        return entry[1]
    entry = _GATE_CHUNK_CACHE.get(key)
    if entry is None:
        gate = GATE_TYPES[gate_id]

        def run(wires_lde, sel_col, const_cols, pi_hash, alphas, acc, apows):
            alg = BatchAlgebra()
            wires_cols = [wires_lde[i] for i in range(num_wires)]
            ccols = [const_cols[i] for i in range(n_const)]
            pi_cols = [pi_hash[i] for i in range(4)]
            batched = getattr(gate, "eval_constraints_batched", None)
            if batched is not None:
                cs = batched(wires_cols, ccols, pi_cols)
            else:
                cs = gate.eval_constraints(alg, wires_cols, ccols, pi_cols)
            cs = cs[lo:hi]
            out_acc = []
            out_apows = []
            for c in range(C):
                a = acc[c]
                apow = apows[c]
                for t in cs:
                    filt = gl.mul(sel_col, jnp.broadcast_to(t, sel_col.shape))
                    a = gl.add(a, gl.mul(apow, filt))
                    apow = gl.mul(apow, alphas[c])
                out_acc.append(a)
                out_apows.append(apow)
            return jnp.stack(out_acc), jnp.stack(out_apows)

        from .aot_cache import AotJit

        entry = (run, AotJit(run, f"gate_chunk_{gate_id}", extra=str(key)))
        _GATE_CHUNK_CACHE[key] = entry
    return entry[1] if use_jit else entry[0]


@dataclass
class Proof:
    wires_cap: list
    zs_pp_cap: list
    quotient_cap: list
    openings: dict
    fri: FriProof
    initial_openings: list  # per query: {name: (leaf, path)}
    public_inputs: list


def _open_columns(coeffs: jnp.ndarray, zeta: jnp.ndarray) -> jnp.ndarray:
    """Evaluate S column polynomials [S, n] at an extension point [2];
    returns [S, 2].

    Log-depth even/odd folding instead of an n-step Horner scan:
    ``p(z) = E(z^2) + z * O(z^2)`` halves the coefficient count per fold,
    so a 32768-coefficient circuit takes 15 wide vector steps rather than
    32768 sequential ones.  All arithmetic is exact mod p, so the result
    is bit-identical to Horner."""
    S, n = coeffs.shape
    if n & (n - 1) != 0:
        # a bare assert is stripped under -O, and a non-power-of-two n
        # would silently drop coefficients in the reshape fold below
        raise ValueError(f"column length must be a power of two, got {n}")
    cur = jnp.stack([coeffs, jnp.zeros_like(coeffs)], axis=-1)  # [S, n, 2]
    z = zeta  # [2], then z^2, z^4, ... per fold
    while cur.shape[1] > 1:
        # even/odd split via reshape (adjacent pairs), not strided slices —
        # friendlier to the TPU u64 rewriter
        pairs = cur.reshape(S, cur.shape[1] // 2, 2, 2)
        even = pairs[:, :, 0]
        odd = pairs[:, :, 1]
        cur = gl.ext_add(even, gl.ext_mul(odd, jnp.broadcast_to(z, odd.shape)))
        z = gl.ext_mul(z, z)
    return cur[:, 0]


def _combine_columns(lde_matrix: jnp.ndarray, pows_arr: jnp.ndarray) -> jnp.ndarray:
    """sum_i alpha^i * p_i(X): base-field columns [m, lde_n] times extension
    alpha powers [m, 2] -> [lde_n, 2].

    The weighted terms reduce in a log-depth halving tree (m padded to a
    power of two with zero rows) instead of an m-step sequential scan;
    modular addition is associative, so the sum is bit-identical."""
    t0 = gl.mul(lde_matrix, pows_arr[:, 0:1])  # [m, lde_n]
    t1 = gl.mul(lde_matrix, pows_arr[:, 1:2])
    m = t0.shape[0]
    mp = 1 << max(m - 1, 0).bit_length()
    if mp != m:
        pad = jnp.zeros((mp - m, t0.shape[1]), dtype=jnp.uint64)
        t0 = jnp.concatenate([t0, pad], axis=0)
        t1 = jnp.concatenate([t1, pad], axis=0)
    while t0.shape[0] > 1:
        half = t0.shape[0] // 2
        t0 = gl.add(t0[:half], t0[half:])
        t1 = gl.add(t1[:half], t1[half:])
    return jnp.stack([t0[0], t1[0]], axis=-1)  # [lde_n, 2]


from .aot_cache import AotJit as _AotJit

# extra="v2": the log-depth rewrites changed these kernels' graphs, so
# executables cached by the old scan versions must not be loaded
_open_columns_aot = _AotJit(_open_columns, "open_columns", extra="v2")
_combine_columns_aot = _AotJit(_combine_columns, "combine_columns", extra="v2")

# LDEs at least this long go through the sharded four-step NTT when a
# commit mesh is active (parallel.mesh.use_commit_mesh); below it the
# all-to-all overhead outweighs the split.
SHARD_COMMIT_MIN_LDE = int(
    os.environ.get("INTMAX_TPU_SHARD_COMMIT_MIN_LDE", str(1 << 17))
)


def _commit(matrix, rate_bits: int, cap_height: int, from_coeffs: bool = False,
            extras=()):
    """columns [S, n] (evaluations on the subgroup, or coefficients if
    ``from_coeffs``; numpy or device) ->
    (coeffs_dev, lde_dev, lde_np, tree, extras_np).

    One host transfer total: the LDE, the Merkle levels and any ``extras``
    (device arrays the caller needs on host, e.g. the permutation wrap
    check) come back in a single ``fetch_arrays`` readback.  Coefficients
    stay device-resident — the openings/FRI stages consume them there.

    Inside a ``parallel.mesh.use_commit_mesh`` context, LDEs of at least
    ``SHARD_COMMIT_MIN_LDE`` points are computed with the four-step
    all-to-all NTT sharded over the mesh (SURVEY §2.3 intra-op axis), and
    the Merkle levels stay sharded through leaf hashing and folding with
    only the d block roots crossing the interconnect
    (parallel/merkle_sharded.py) — bit-identical to the single-device
    kernel either way.

    Default (INTMAX_TPU_DEVICE_OPENINGS=1, no commit mesh): the LDE and
    tree levels stay DEVICE-resident (``lde_np`` is None, ``tree`` is a
    ``DeviceMerkleTree``); only the cap and ``extras`` are fetched.  A
    proof touches ~num_query_rounds rows of these tables — the full
    fetch (300 MB for the block circuit's wire commit) cost 18 s at the
    tunnel's healthy bandwidth and 450+ s congested."""
    from .fri import _device_openings_enabled
    from ..parallel.mesh import commit_mesh

    if from_coeffs:
        coeffs = jnp.asarray(matrix)
    else:
        coeffs = nt.intt(jnp.asarray(matrix))
    lde = _coset_lde_maybe_sharded(coeffs, rate_bits)
    levels_dev = _build_levels_maybe_sharded(jnp.transpose(lde), cap_height)
    mesh, _axis = commit_mesh()
    if _device_openings_enabled() and mesh is None:
        fetched = mk.fetch_arrays(levels_dev[-1], *extras)
        tree = mk.DeviceMerkleTree(
            levels_dev=list(levels_dev), cap_height=cap_height, cap_np=fetched[0]
        )
        return coeffs, lde, None, tree, tuple(fetched[1:])
    fetched = mk.fetch_arrays(lde, *extras, *levels_dev)
    lde_np = fetched[0]
    extras_np = tuple(fetched[1 : 1 + len(extras)])
    tree = mk.MerkleTree(levels=list(fetched[1 + len(extras) :]), cap_height=cap_height)
    return coeffs, lde, lde_np, tree, extras_np


def _coset_lde_maybe_sharded(coeffs, rate_bits: int):
    """Route the LDE through the mesh-sharded four-step NTT when a commit
    mesh is active and the size warrants it; single-device otherwise."""
    from ..parallel.mesh import commit_mesh

    mesh, axis_name = commit_mesh()
    lde_n = coeffs.shape[-1] << rate_bits
    if mesh is not None and lde_n >= SHARD_COMMIT_MIN_LDE:
        from ..parallel.ntt_sharded import can_shard, coset_lde_sharded

        if can_shard(lde_n, mesh.shape[axis_name]):
            flat = coeffs.reshape(-1, coeffs.shape[-1])
            out = coset_lde_sharded(flat, rate_bits, mesh, axis_name=axis_name)
            return out.reshape(coeffs.shape[:-1] + (lde_n,))
    return nt.coset_lde(coeffs, rate_bits)


def _build_levels_maybe_sharded(leaves, cap_height: int):
    """Merkle levels for [n, w] leaf rows: sharded over the active commit
    mesh when the leaf count warrants it (same threshold as the LDE — the
    leaves ARE the sharded LDE's rows), single-device otherwise."""
    from ..parallel.mesh import commit_mesh

    mesh, axis_name = commit_mesh()
    n = leaves.shape[0]
    if mesh is not None and n >= SHARD_COMMIT_MIN_LDE:
        from ..parallel.merkle_sharded import (
            build_merkle_levels_sharded,
            can_shard_tree,
        )

        if can_shard_tree(n, mesh.shape[axis_name], cap_height):
            return build_merkle_levels_sharded(
                leaves, cap_height, mesh, axis_name=axis_name
            )
    return mk.build_merkle_levels(leaves, cap_height)


def _cap_tuples(tree) -> list:
    return [tuple(int(x) for x in d) for d in tree.cap]


def _extract_initial_openings(named_trees: dict, indices: list) -> list:
    """Per query index, per commitment: (leaf row, auth path).

    ``named_trees[name] = (lde_dev, lde_np, tree)``.  Device trees
    (``DeviceMerkleTree``) contribute device gathers of just the touched
    rows/digests, combined into ONE tiny fetch; host trees (numpy levels,
    e.g. the pickled constants_sigmas tree) extract directly."""
    idx_np = np.asarray(indices, dtype=np.int64)
    idx_dev = jnp.asarray(idx_np)
    gathers = []
    plan = {}  # name -> ("dev", n_arrays) | ("host",)
    for name, (lde_dev, lde_np, tree) in named_trees.items():
        if isinstance(tree, mk.DeviceMerkleTree):
            leaf_rows = jnp.take(lde_dev, idx_dev, axis=1)  # [S, nq]
            paths = tree.path_gathers(idx_np)
            gathers.append(leaf_rows)
            gathers.extend(paths)
            plan[name] = ("dev", 1 + len(paths))
        else:
            plan[name] = ("host",)
    fetched = mk.fetch_arrays(*gathers) if gathers else []
    out = []
    for k, idx in enumerate(indices):
        per = {}
        off = 0
        for name, (lde_dev, lde_np, tree) in named_trees.items():
            mode = plan[name]
            if mode[0] == "dev":
                chunk = fetched[off : off + mode[1]]
                off += mode[1]
                leaf = [int(x) for x in chunk[0][:, k]]
                path = [tuple(int(x) for x in lv[k]) for lv in chunk[1:]]
            else:
                leaf = [int(x) for x in lde_np[:, idx]]
                path = [tuple(int(x) for x in d) for d in tree.prove(idx)]
            per[name] = (leaf, path)
        out.append(per)
    return out


def _coset_points(lde_n: int) -> np.ndarray:
    w_lde = gl.primitive_root_of_unity(lde_n.bit_length() - 1)
    xs = np.empty(lde_n, dtype=np.uint64)
    acc = gl.MULTIPLICATIVE_GROUP_GENERATOR % P
    for i in range(lde_n):
        xs[i] = acc
        acc = acc * w_lde % P
    return xs


# kernels keyed by circuit identity, NOT pd object identity: the block flow
# rebuilds its CircuitData objects from the on-disk circuit cache on every
# run, so a pd-attached cache alone re-ran the whole kernel setup (2^18
# host modexps/bigint loops + ~40 MB id/sigma table uploads) inside every
# block prove — measured as the 6.5 s "perm_columns kernel" window of the
# steady-state flow (docs/perf_notes.md round 5: the kernel itself is 7 ms).
# The digest commits to the constants+sigmas cap, n, num_wires and
# num_challenges (circuit.py:478-479); the remaining graph-shaping inputs
# ride in the key explicitly.
_KERNELS_CACHE: dict = {}
_KERNELS_CACHE_MAX = 32


def get_circuit_kernels(pd):
    """Per-circuit jitted device kernels, cached on the prover data AND in a
    digest-keyed module cache (the flow rebuilds pd objects per run), plus
    the persistent compilation cache across processes.  Shapes and circuit
    constants are baked; challenges are traced arguments, so every proof of
    the same circuit reuses one compilation."""
    if getattr(pd, "_kernels", None) is not None:
        return pd._kernels

    common = pd.common
    cache_key = (
        common.circuit_digest,
        common.n,
        tuple(common.gate_ids),
        common.n_sel,
        common.n_const_cols,
        tuple(int(k) for k in common.k_is),
        repr(common.config),
        # use_jit is baked into the cached closures
        jax.default_backend() != "cpu"
        or os.environ.get("INTMAX_TPU_FORCE_JIT") == "1",
    )
    cached = _KERNELS_CACHE.get(cache_key)
    if cached is not None:
        pd._kernels = cached
        return cached
    cfg = common.config
    n = common.n
    lde_n = n * cfg.fri.blowup
    R = cfg.num_routed_wires
    nch = n_chunks(R)
    C = cfg.num_challenges

    n_sel = common.n_sel
    cs_lde_c = jnp.asarray(pd.cs_lde)
    sel_lde = cs_lde_c[:n_sel]
    const_lde = cs_lde_c[n_sel : n_sel + common.n_const_cols]
    sigma_lde_c = cs_lde_c[n_sel + common.n_const_cols :]
    k_is_c = jnp.asarray(np.array(common.k_is, dtype=np.uint64))  # [R]

    xs_np = _coset_points(lde_n)
    xs_c = jnp.asarray(xs_np)
    gshift = pow(gl.MULTIPLICATIVE_GROUP_GENERATOR, n, P)
    w_b = gl.primitive_root_of_unity(cfg.fri.rate_bits)
    xn = np.array(
        [gshift * pow(w_b, i % cfg.fri.blowup, P) % P for i in range(lde_n)],
        dtype=np.uint64,
    )
    z_h_np = (xn.astype(object) - 1) % P
    z_h_c = jnp.asarray(z_h_np.astype(np.uint64))
    # L_0 on the coset, host-side (eager device u64 inv is prohibitively
    # slow through remote backends).  Montgomery batch inversion: one
    # modexp + 3*lde_n bigint muls instead of lde_n modexps (~10x less
    # host time at 2^18 on first build of a circuit)
    dens = [n * (int(xs_np[i]) - 1) % P for i in range(lde_n)]
    pref = [1] * (lde_n + 1)
    for i in range(lde_n):
        pref[i + 1] = pref[i] * dens[i] % P
    inv_all = pow(pref[lde_n], P - 2, P)
    l0_np = np.empty(lde_n, dtype=np.uint64)
    for i in range(lde_n - 1, -1, -1):
        l0_np[i] = int(z_h_np[i]) * (pref[i] * inv_all % P) % P
        inv_all = inv_all * dens[i] % P
    l0_c = jnp.asarray(l0_np)
    inv_shift = pow(gl.MULTIPLICATIVE_GROUP_GENERATOR, P - 2, P)
    shift_pows = np.empty(lde_n, dtype=np.uint64)
    acc = 1
    for i in range(lde_n):
        shift_pows[i] = acc
        acc = acc * inv_shift % P
    shift_pows_c = jnp.asarray(shift_pows)

    id_vals = np.empty((R, n), dtype=np.uint64)
    for i in range(R):
        id_vals[i] = (common.k_is[i] * pd.w_pows.astype(object)) % P
    id_vals_c = jnp.asarray(id_vals)
    sigma_c = jnp.asarray(pd.sigma)

    from .aot_cache import AotJit

    def perm_columns_impl(wires, betas, gammas, id_vals_a, sigma_a):
        """wires [R, n]; betas/gammas [C] -> (z_cols [C, n], pp [C, nch-1, n],
        wrap [C] which must be all-ones).  id/sigma tables are arguments so
        the compiled graph carries no large literals."""

        def per_challenge(beta, gamma):
            f_fac = gl.add(gl.add(wires[:R], gl.mul(beta, id_vals_a)), gamma)  # [R, n]
            g_fac = gl.add(gl.add(wires[:R], gl.mul(beta, sigma_a)), gamma)
            pad = nch * CHUNK - R
            if pad:
                f_fac = jnp.concatenate([f_fac, jnp.ones((pad, n), jnp.uint64)], axis=0)
                g_fac = jnp.concatenate([g_fac, jnp.ones((pad, n), jnp.uint64)], axis=0)
            f_fac = f_fac.reshape(nch, CHUNK, n)
            g_fac = g_fac.reshape(nch, CHUNK, n)

            def chunk_prod(m):
                out = m[:, 0]
                for k in range(1, CHUNK):
                    out = gl.mul(out, m[:, k])
                return out  # [nch, n]

            f_ch = chunk_prod(f_fac)
            g_ch = chunk_prod(g_fac)
            # prefix products of f chunks; SUFFIX products of g chunks:
            # inv(G_pref[j]) = G_suff[j+1] * inv(G_total), so only the
            # single [n] total column needs the ~94-mul Fermat inversion
            # instead of the whole [nch, n] prefix matrix (bit-identical
            # field values; ~12x less inversion work)
            f_pref = [f_ch[0]]
            for j in range(1, nch):
                f_pref.append(gl.mul(f_pref[-1], f_ch[j]))
            f_pref = jnp.stack(f_pref)  # [nch, n]
            g_suff = [g_ch[nch - 1]]
            for j in range(nch - 2, -1, -1):
                g_suff.append(gl.mul(g_suff[-1], g_ch[j]))
            g_suff.reverse()
            g_total_inv = gl.inv(g_suff[0])  # [n]
            row_quot = gl.mul(f_pref[-1], g_total_inv)  # [n]
            cum = jax.lax.associative_scan(gl.mul, row_quot)  # [n]
            z = jnp.concatenate([jnp.ones((1,), jnp.uint64), cum[:-1]])
            if nch > 1:
                g_pref_inv = gl.mul(jnp.stack(g_suff[1:]), g_total_inv)  # [nch-1, n]
                pp = gl.mul(z, gl.mul(f_pref[:-1], g_pref_inv))  # [nch-1, n]
            else:
                # R <= CHUNK: no partial products; stacking the empty
                # g_suff[1:] list would raise at trace time
                pp = jnp.zeros((0, n), jnp.uint64)
            return z, pp, cum[-1]

        zs, pps, wraps = jax.vmap(per_challenge)(betas, gammas)
        return zs, pps, wraps

    # "suffinv": the suffix-product inversion rework changed the graph and
    # the AOT key does not hash the jaxpr
    perm_columns_jit = AotJit(perm_columns_impl, "perm_columns", extra="suffinv")

    def perm_columns(wires, betas, gammas):
        from ..runtime import perm_pallas_enabled

        if use_jit and jax.default_backend() != "cpu" and perm_pallas_enabled():
            from ..ops.perm_columns_pallas import perm_columns_pallas

            return perm_columns_pallas(wires, betas, gammas, id_vals_c, sigma_c)
        return perm_columns_jit(wires, betas, gammas, id_vals_c, sigma_c)

    # The quotient is compiled in bounded pieces rather than one monolithic
    # graph: one kernel for the permutation-argument terms, one per
    # GATE_QUOTIENT_CHUNK constraints of each gate type (shared across
    # circuits via _GATE_CHUNK_CACHE), and one for the divide/INTT tail.
    # Big per-circuit tables (sigma/selector/constant LDEs, coset vectors)
    # ride in as arguments, not baked literals — literal-stuffed graphs
    # overwhelmed the remote compile helper (docs/perf_notes.md).  The
    # alpha-power ordering [L_0 term, permutation chunks, every gate's
    # constraints in gate order] is identical to the verifier's.

    def perm_quotient_part(wires_lde, zs_lde, pps_lde, betas, gammas, alphas,
                           sigma_lde, xs, l0):
        """-> (acc [C, lde_n], apows [C]): the L_0 + permutation-chunk terms
        alpha-combined, and the alpha power reached per challenge."""
        accs = []
        apows = []
        for c in range(C):
            beta, gamma, alpha = betas[c], gammas[c], alphas[c]
            Z = zs_lde[c]
            Z_shift = jnp.roll(Z, -cfg.fri.blowup)
            terms = [gl.mul(l0, gl.sub(Z, jnp.uint64(1)))]
            prev = Z
            for j in range(nch):
                lo, hi = j * CHUNK, min((j + 1) * CHUNK, R)
                f = None
                g = None
                for i in range(lo, hi):
                    v = wires_lde[i]
                    fid = gl.add(gl.add(v, gl.mul(gl.mul(beta, k_is_c[i]), xs)), gamma)
                    gs = gl.add(gl.add(v, gl.mul(beta, sigma_lde[i])), gamma)
                    f = fid if f is None else gl.mul(f, fid)
                    g = gs if g is None else gl.mul(g, gs)
                nxt = Z_shift if j == nch - 1 else pps_lde[c][j]
                terms.append(gl.sub(gl.mul(nxt, g), gl.mul(prev, f)))
                if j < nch - 1:
                    prev = pps_lde[c][j]
            acc = jnp.zeros((lde_n,), dtype=jnp.uint64)
            apow = jnp.uint64(1)
            for t in terms:
                acc = gl.add(acc, gl.mul(apow, jnp.broadcast_to(t, (lde_n,))))
                apow = gl.mul(apow, alpha)
            accs.append(acc)
            apows.append(apow)
        return jnp.stack(accs), jnp.stack(apows)

    def quotient_finish(acc, z_h, shift_pows_a):
        """acc [C, lde_n] -> quotient coefficient chunks [C*blowup, n]."""
        z_h_inv = gl.inv(z_h)
        out_chunks = []
        for c in range(C):
            q_evals = gl.mul(acc[c], z_h_inv)
            coeffs = nt.intt(q_evals[None, :])[0]
            coeffs = gl.mul(coeffs, shift_pows_a)
            out_chunks.append(coeffs.reshape(cfg.fri.blowup, n))
        return jnp.concatenate(out_chunks, axis=0)

    # jit the pieces on accelerators; on CPU the XLA compile cost outweighs
    # eager dispatch for one-off proofs, but repeated same-circuit proving
    # amortizes it (steady-state CPU quotient is ~90% of prove time,
    # docs/perf_notes.md) — INTMAX_TPU_FORCE_JIT=1 opts in
    use_jit = (
        jax.default_backend() != "cpu"
        or os.environ.get("INTMAX_TPU_FORCE_JIT") == "1"
    )

    def _wrap(f, name):
        # the FRI blowup shapes the kernel but is not recoverable from arg
        # shapes alone — it must ride in the AOT cache key.  "ntt2": the
        # mixed-radix NTT rework changed the graphs embedding intt, and the
        # AOT key does not hash the jaxpr — stale executables would silently
        # keep the old kernel.  The Pallas-NTT mode also changes embedded
        # intt graphs (value-identical, but the executable must match the
        # mode it claims to measure).
        from ..ops.ntt import _pallas_ntt_enabled

        if jax.default_backend() != "cpu" and _pallas_ntt_enabled():
            from ..ops.ntt_pallas import NTT_GRAPH_VERSION

            tag = f"-pntt{NTT_GRAPH_VERSION}"
        else:
            tag = ""
        return (
            AotJit(f, name, extra=f"b{cfg.fri.blowup}-ntt2{tag}")
            if use_jit
            else f
        )

    perm_quotient_fn = _wrap(perm_quotient_part, "perm_quotient")
    finish_fn = _wrap(quotient_finish, "quotient_finish")

    def finish_tail(q, shift_pows_a):
        """intt + coset unshift of the divided accumulator [..., lde_n]
        (the Pallas path's XLA tail; the Fermat divide runs in Mosaic)."""
        return gl.mul(nt.intt(q), shift_pows_a)

    finish_tail_fn = _wrap(finish_tail, "quotient_finish_tail")
    sel_cols = [sel_lde[i] for i in range(n_sel)]
    gate_chunks = []
    gate_chunk_keys = []
    for gi, gate_id in enumerate(common.gate_ids):
        nc = GATE_TYPES[gate_id].num_constraints
        for lo in range(0, nc, GATE_QUOTIENT_CHUNK):
            hi = min(lo + GATE_QUOTIENT_CHUNK, nc)
            fn = _gate_quotient_chunk(
                gate_id, lo, hi, cfg.num_wires, common.n_const_cols, C, use_jit
            )
            gate_chunks.append((gi, fn))
            gate_chunk_keys.append(
                (gi, (gate_id, lo, hi, cfg.num_wires, common.n_const_cols, C))
            )

    def quotient(wires_lde, zs_lde, pps_lde, betas, gammas, alphas, pi_hash):
        """wires_lde [W, lde_n]; zs_lde [C, lde_n]; pps_lde [C, nch-1, lde_n];
        challenges [C]; pi_hash [4] -> quotient coefficient chunks
        [C*blowup, n]."""
        from ..runtime import perm_pallas_enabled

        if use_jit and jax.default_backend() != "cpu" and perm_pallas_enabled():
            from ..ops.perm_quotient_pallas import perm_quotient_pallas

            acc, apows = perm_quotient_pallas(
                wires_lde, zs_lde, pps_lde, betas, gammas, alphas,
                sigma_lde_c, xs_c, l0_c, k_is_c, cfg.fri.blowup,
            )
        else:
            acc, apows = perm_quotient_fn(
                wires_lde, zs_lde, pps_lde, betas, gammas, alphas,
                sigma_lde_c, xs_c, l0_c,
            )
        for gi, fn in gate_chunks:
            acc, apows = fn(
                wires_lde, sel_cols[gi], const_lde, pi_hash, alphas, acc, apows
            )
        if use_jit and jax.default_backend() != "cpu" and perm_pallas_enabled():
            from ..ops.zinv_mul_pallas import zinv_mul_pallas

            q = zinv_mul_pallas(acc, z_h_c)
            return finish_tail_fn(q, shift_pows_c).reshape(
                C * cfg.fri.blowup, n
            )
        return finish_fn(acc, z_h_c, shift_pows_c)

    kernels = {
        "perm_columns": perm_columns,
        "quotient": quotient,
        # raw pieces + baked tables for the batch prover (engine/batch_prover
        # vmaps these over a leading proof axis)
        "_internals": {
            "perm_columns_impl": perm_columns_impl,
            "perm_quotient_part": perm_quotient_part,
            "quotient_finish": quotient_finish,
            "finish_tail": finish_tail_fn,
            "gate_chunk_keys": gate_chunk_keys,
            "sel_cols": sel_cols,
            "const_lde": const_lde,
            "sigma_lde": sigma_lde_c,
            "xs": xs_c,
            "l0": l0_c,
            "z_h": z_h_c,
            "shift_pows": shift_pows_c,
            "id_vals": id_vals_c,
            "sigma": sigma_c,
            "k_is": k_is_c,
            "use_jit": use_jit,
            # device-resident per-circuit tables so each prove avoids
            # re-uploading them (they are constant across proofs)
            "cs_lde_dev": cs_lde_c,
            "cs_coeffs_dev": jnp.asarray(pd.cs_coeffs),
        },
    }
    pd._kernels = kernels
    if len(_KERNELS_CACHE) >= _KERNELS_CACHE_MAX:
        # FIFO eviction bounds device-table residency when many distinct
        # circuits are built in one process (the test suite); the flow's
        # 3-4 circuits always stay resident
        _KERNELS_CACHE.pop(next(iter(_KERNELS_CACHE)))
    _KERNELS_CACHE[cache_key] = kernels
    return kernels


def compute_wire_matrix(pd, pw: PartialWitness):
    """Run witness generation and assemble the [num_wires, n] matrix plus
    public inputs (shared by prove() and check_witness()).

    When the native witness engine is available, the generator fixpoint
    runs in C++ (native/witness_native.cpp) and the wire matrix assembles
    with numpy scatters over the circuit's cached (place -> root) tables;
    the Python ``WitnessFill`` path is the bit-exact fallback/oracle."""
    from ..native.witness import native_fill, native_witness_enabled

    cfg = pd.common.config
    n = pd.common.n
    if native_witness_enabled():
        values, has, wrows, wcols, wvals, plan = native_fill(pd, pw)
        missing = ~has[plan.place_roots].astype(bool)
        if missing.any():
            i = int(np.nonzero(missing)[0][0])
            raise AssertionError(
                "unset wire target at place "
                f"{(int(plan.place_rows[i]), int(plan.place_cols[i]))}"
            )
        wires = np.zeros((cfg.num_wires, n), dtype=np.uint64)
        wires[plan.place_cols, plan.place_rows] = values[plan.place_roots]
        wires[wcols, wrows] = wvals
        assert has[plan.pi_roots].all(), "unset public input"
        public_inputs = [int(v) for v in values[plan.pi_roots]]
        return wires, public_inputs

    fill = WitnessFill(pd)
    fill.run(pw)
    wires = np.zeros((cfg.num_wires, n), dtype=np.uint64)
    for (row, col), t in pd.targets_at_place.items():
        v = fill.get(t)
        if v is None:
            raise AssertionError(f"unset wire target at place {(row, col)}")
        wires[col, row] = v
    for (row, col), v in fill.wire_overrides.items():
        wires[col, row] = v
    public_inputs = [fill.get(t) for t in pd.public_input_targets]
    assert all(v is not None for v in public_inputs), "unset public input"
    return wires, public_inputs


def check_witness(circuit_data: CircuitData, pw: PartialWitness) -> list:
    """Fast witness validation: run generators, then evaluate every gate
    constraint on the subgroup rows (no LDE / commitment / FRI).  Raises if
    any constraint is violated; returns the public inputs.  This is the
    cheap integration-test path for large circuits."""
    pd = circuit_data.prover
    common = pd.common
    cfg = common.config
    wires, public_inputs = compute_wire_matrix(pd, pw)
    pi_hash = ps.hash_no_pad_s(public_inputs)

    alg = BatchAlgebra()
    n_sel = common.n_sel
    sel = pd.constants_sigmas[:n_sel]
    consts = pd.constants_sigmas[n_sel : n_sel + common.n_const_cols]
    wires_cols = [jnp.asarray(wires[i]) for i in range(cfg.num_wires)]
    const_cols = [jnp.asarray(consts[i]) for i in range(common.n_const_cols)]
    pi_hash_cols = [jnp.uint64(v) for v in pi_hash]
    from .gates import GATE_TYPES as _GT

    for gi, gate_id in enumerate(common.gate_ids):
        gate = _GT[gate_id]
        if gate.num_constraints == 0:
            continue
        batched = getattr(gate, "eval_constraints_batched", None)
        if batched is not None:
            cs = batched(wires_cols, const_cols, pi_hash_cols)
        else:
            cs = gate.eval_constraints(alg, wires_cols, const_cols, pi_hash_cols)
        sel_col = jnp.asarray(sel[gi])
        for k, c in enumerate(cs):
            vals = np.asarray(gl.mul(sel_col, jnp.broadcast_to(c, sel_col.shape)))
            bad = np.nonzero(vals)[0]
            if len(bad):
                raise AssertionError(
                    f"constraint {k} of gate '{gate_id}' violated at rows {bad[:5].tolist()}"
                )
    return public_inputs


class _PhaseTimer:
    """Per-phase wall-clock tracing, enabled with INTMAX_TPU_TRACE=1
    (the reference only has ad-hoc Instant::now prints, SURVEY §5.1).

    Phase boundaries are only as accurate as the blocking host readbacks
    inside each phase (Fiat-Shamir cap observations); through the async
    axon tunnel a phase's dispatch can drain into the next phase's
    timing.  INTMAX_TPU_TRACE_SYNC=1 additionally drains the device at
    every boundary (one tiny blocking readback), attributing queued work
    to the phase that dispatched it — slightly perturbs the total, use
    for profiling only."""

    def __init__(self):
        import os

        self.enabled = os.environ.get("INTMAX_TPU_TRACE") == "1"
        self.sync = os.environ.get("INTMAX_TPU_TRACE_SYNC") == "1"
        self._t = None
        self._name = None

    def phase(self, name: str) -> None:
        import time

        if self.sync and self._name is not None:
            import numpy as _np
            import jax.numpy as _jnp

            # a dependent readback drains the dispatch queue even where
            # block_until_ready returns early through the tunnel
            _np.asarray(_jnp.zeros((), dtype=_jnp.uint32) + _jnp.uint32(1))
        now = time.perf_counter()
        if self.enabled and self._name is not None:
            print(f"[prove] {self._name}: {now - self._t:.3f}s", flush=True)
        self._t = now
        self._name = name

    def sub(self, name: str, drain=None) -> None:
        """Sub-phase stamp: only under INTMAX_TPU_TRACE_SYNC=1 (it costs
        a drain), printed indented; does not advance the phase clock's
        name, so phase totals are unchanged in non-sync runs.

        ``drain``: a device array to read one element of — a DEPENDENT
        readback, the only true barrier through the axon queue (an
        independent tiny op can execute before queued work; measured
        round 5: the independent-op drain attributed a 7 ms kernel as
        6.5 s)."""
        import time

        if not (self.enabled and self.sync):
            return
        import numpy as _np

        if drain is not None:
            _np.asarray(drain.ravel()[:1])
        else:
            import jax.numpy as _jnp

            _np.asarray(_jnp.zeros((), dtype=_jnp.uint32) + _jnp.uint32(1))
        now = time.perf_counter()
        print(f"[prove]   {name}: {now - self._t:.3f}s", flush=True)
        self._t = now

    def done(self) -> None:
        self.phase("_end")


def prove(circuit_data: CircuitData, pw: PartialWitness) -> Proof:
    pd = circuit_data.prover
    common = pd.common
    cfg = common.config
    n = common.n
    fri_cfg = cfg.fri
    lde_n = n * fri_cfg.blowup
    R = cfg.num_routed_wires
    timer = _PhaseTimer()
    timer.phase("kernels")  # per-circuit tables + AOT kernel setup
    # first proof of a circuit in a process pays the table build/uploads
    # here (digest-cached across pd instances); keeping it out of the
    # perm_columns phase keeps the trace attribution honest (round 5: the
    # "6.5 s perm kernel" was this setup re-running per flow run)
    kernels = get_circuit_kernels(pd)
    timer.phase("witness")

    # ---- 1. witness fill ----
    wires, public_inputs = compute_wire_matrix(pd, pw)
    pi_hash = ps.hash_no_pad_s(public_inputs)
    timer.phase("commit_wires")
    pd._pi_hash = pi_hash  # stashed for constraint evaluation

    # ---- 2. commit wires ----
    # upload the witness matrix ONCE: the permutation phase reuses the
    # device copy ([135, 2^15] is ~33 MB — a second host->device transfer
    # of wires[:R] measured ~7 s of the block prove through a busy relay)
    wires_dev = jnp.asarray(wires)
    wire_coeffs_dev, wire_lde_dev, wire_lde, wires_tree, _ = _commit(
        wires_dev, fri_cfg.rate_bits, fri_cfg.cap_height
    )

    challenger = Challenger()
    challenger.observe_hash(common.circuit_digest)
    challenger.observe_hash(pi_hash)
    challenger.observe_cap(_cap_tuples(wires_tree))
    betas = challenger.get_n_challenges(cfg.num_challenges)
    gammas = challenger.get_n_challenges(cfg.num_challenges)

    timer.phase("perm_columns")
    # ---- 3. permutation argument columns (device kernel) ----
    nch = n_chunks(R)
    betas_arr = jnp.asarray(np.array(betas, dtype=np.uint64))
    gammas_arr = jnp.asarray(np.array(gammas, dtype=np.uint64))
    z_cols_d, pp_cols_d, wraps = kernels["perm_columns"](
        wires_dev[:R], betas_arr, gammas_arr
    )
    timer.sub("perm:kernel", drain=wraps)
    zs_pp_matrix_dev = jnp.concatenate(
        [z_cols_d, pp_cols_d.reshape(cfg.num_challenges * (nch - 1), n)], axis=0
    )
    zspp_coeffs_dev, zspp_lde_dev, zspp_lde, zs_pp_tree, (wraps_np,) = _commit(
        zs_pp_matrix_dev, fri_cfg.rate_bits, fri_cfg.cap_height, extras=(wraps,)
    )
    timer.sub("perm:zs_pp_commit")
    assert (wraps_np == 1).all(), (
        "permutation argument product != 1 (sigma inconsistent)"
    )
    challenger.observe_cap(_cap_tuples(zs_pp_tree))
    alphas = challenger.get_n_challenges(cfg.num_challenges)

    timer.phase("quotient")
    # ---- 4. quotient (one jitted kernel per circuit) ----
    zs_lde_arr = zspp_lde_dev[: cfg.num_challenges]
    pps_lde_arr = zspp_lde_dev[cfg.num_challenges :].reshape(
        cfg.num_challenges, nch - 1, lde_n
    )
    quotient_matrix_dev = kernels["quotient"](
        wire_lde_dev,
        zs_lde_arr,
        pps_lde_arr,
        betas_arr,
        gammas_arr,
        jnp.asarray(np.array(alphas, dtype=np.uint64)),
        jnp.asarray(np.array(pi_hash, dtype=np.uint64)),
    )
    quot_coeffs_dev, quot_lde_dev, quot_lde, quotient_tree, _ = _commit(
        quotient_matrix_dev, fri_cfg.rate_bits, fri_cfg.cap_height, from_coeffs=True
    )
    challenger.observe_cap(_cap_tuples(quotient_tree))
    zeta = challenger.get_extension_challenge()

    timer.phase("openings")
    # ---- 5. openings at zeta (and g*zeta for Z columns) ----
    g_n = gl.primitive_root_of_unity(n.bit_length() - 1)
    zeta_arr = jnp.asarray(np.array(zeta, dtype=np.uint64))
    gzeta = (zeta[0] * g_n % P, zeta[1] * g_n % P)
    gzeta_arr = jnp.asarray(np.array(gzeta, dtype=np.uint64))

    intern = kernels["_internals"]
    all_coeffs_dev = jnp.concatenate(
        [intern["cs_coeffs_dev"], wire_coeffs_dev, zspp_coeffs_dev, quot_coeffs_dev],
        axis=0,
    )
    opens_zeta, opens_gzeta_z = mk.fetch_arrays(
        _open_columns_aot(all_coeffs_dev, zeta_arr),
        _open_columns_aot(zspp_coeffs_dev[: cfg.num_challenges], gzeta_arr),
    )

    n_cs = pd.cs_coeffs.shape[0]
    n_w = cfg.num_wires
    n_zpp = zspp_coeffs_dev.shape[0]
    openings = {
        "constants_sigmas": [tuple(int(x) for x in o) for o in opens_zeta[:n_cs]],
        "wires": [tuple(int(x) for x in o) for o in opens_zeta[n_cs : n_cs + n_w]],
        "zs_pp": [tuple(int(x) for x in o) for o in opens_zeta[n_cs + n_w : n_cs + n_w + n_zpp]],
        "quotient": [tuple(int(x) for x in o) for o in opens_zeta[n_cs + n_w + n_zpp :]],
        "zs_next": [tuple(int(x) for x in o) for o in opens_gzeta_z],
    }
    for name in ["constants_sigmas", "wires", "zs_pp", "quotient", "zs_next"]:
        for o in openings[name]:
            challenger.observe_ext(o)

    timer.phase("fri")
    # ---- 6. FRI ----
    alpha_fri = challenger.get_extension_challenge()
    alpha_arr = jnp.asarray(np.array(alpha_fri, dtype=np.uint64))

    # combine batch-1 columns (everything opened at zeta); LDEs are already
    # device-resident from _commit, constants ride on the per-circuit cache
    batch1_lde_dev = jnp.concatenate(
        [intern["cs_lde_dev"], wire_lde_dev, zspp_lde_dev, quot_lde_dev], axis=0
    )
    m1 = batch1_lde_dev.shape[0]
    alpha_pows = []
    apow = (1, 0)
    for _ in range(m1 + cfg.num_challenges):
        alpha_pows.append(apow)
        apow = ext_mul(apow, alpha_fri)

    comb1 = _combine_columns_aot(batch1_lde_dev, jnp.asarray(np.array(alpha_pows[:m1], dtype=np.uint64)))
    comb1_at_zeta = (0, 0)
    flat_opens = (
        openings["constants_sigmas"] + openings["wires"] + openings["zs_pp"] + openings["quotient"]
    )
    for i, y in enumerate(flat_opens):
        comb1_at_zeta = ext_add(comb1_at_zeta, ext_mul(alpha_pows[i], y))

    comb2 = _combine_columns_aot(
        zspp_lde_dev[: cfg.num_challenges],
        jnp.asarray(np.array(alpha_pows[m1 : m1 + cfg.num_challenges], dtype=np.uint64)),
    )
    comb2_at_gzeta = (0, 0)
    for j, y in enumerate(openings["zs_next"]):
        comb2_at_gzeta = ext_add(comb2_at_gzeta, ext_mul(alpha_pows[m1 + j], y))

    from ..runtime import perm_pallas_enabled as _pp_enabled

    if jax.default_backend() != "cpu" and _pp_enabled():
        from ..ops.fri_init_pallas import fri_initial_pallas_batched

        G = fri_initial_pallas_batched(
            comb1[None], comb2[None], intern["xs"],
            zeta_arr[None], gzeta_arr[None],
            jnp.asarray(np.array(comb1_at_zeta, dtype=np.uint64))[None],
            jnp.asarray(np.array(comb2_at_gzeta, dtype=np.uint64))[None],
        )[0]
    else:
        # domain points (cached device coset table from get_circuit_kernels)
        xs_ext = jnp.stack(
            [intern["xs"], jnp.zeros(lde_n, dtype=jnp.uint64)], axis=-1
        )

        def sub_const_ext(arr, cst):
            out0 = gl.sub(arr[..., 0], jnp.uint64(cst[0]))
            out1 = gl.sub(arr[..., 1], jnp.uint64(cst[1]))
            return jnp.stack([out0, out1], axis=-1)

        denom1 = gl.ext_inv(sub_const_ext(xs_ext, zeta))
        denom2 = gl.ext_inv(sub_const_ext(xs_ext, gzeta))
        num1 = sub_const_ext(comb1, comb1_at_zeta)
        num2 = sub_const_ext(comb2, comb2_at_gzeta)
        G = gl.ext_add(gl.ext_mul(num1, denom1), gl.ext_mul(num2, denom2))

    trees, final_poly, fri_betas = fold_layers(
        G, gl.MULTIPLICATIVE_GROUP_GENERATOR, fri_cfg, challenger
    )
    pow_witness = grind_pow(challenger, fri_cfg.proof_of_work_bits)
    indices, rounds = query_rounds(trees, fri_cfg, challenger, lde_n)

    # initial-tree openings per query: device trees gather only the
    # touched leaf rows + path digests (one combined tiny fetch); host
    # trees (constants_sigmas rides in the pickled circuit) extract as
    # numpy
    named_trees = {
        "constants_sigmas": (None, pd.cs_lde, pd.cs_tree),
        "wires": (wire_lde_dev, wire_lde, wires_tree),
        "zs_pp": (zspp_lde_dev, zspp_lde, zs_pp_tree),
        "quotient": (quot_lde_dev, quot_lde, quotient_tree),
    }
    initial_openings = _extract_initial_openings(named_trees, indices)

    fri_proof = FriProof(
        caps=[_cap_tuples(t) for t in trees],
        final_poly=final_poly,
        pow_witness=pow_witness,
        query_rounds=rounds,
    )

    timer.done()
    return Proof(
        wires_cap=_cap_tuples(wires_tree),
        zs_pp_cap=_cap_tuples(zs_pp_tree),
        quotient_cap=_cap_tuples(quotient_tree),
        openings=openings,
        fri=fri_proof,
        initial_openings=initial_openings,
        public_inputs=[int(v) for v in public_inputs],
    )
