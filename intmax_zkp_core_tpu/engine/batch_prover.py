"""Batched proving: K same-circuit proofs in one device pass.

Proof-level parallelism on a single chip (SURVEY §2.3): the N user-tx +
N signature proofs a block needs are independent, so every device kernel
of the prover vmaps over a leading proof axis — one dispatch per phase
for ALL K proofs — while each proof keeps its own host-side Fiat-Shamir
transcript.  The resulting proofs are bit-identical to running
``prove`` K times (asserted by tests), so verification and recursion are
unchanged.  The reference's only parallelism is rayon threads inside one
proof (``Cargo.toml:16,20``); batching across proofs is the TPU-native
axis that replaces it.

Multi-chip: pass ``mesh`` (a 1-axis ``jax.sharding.Mesh``) and the proof
axis is sharded over its devices — every ``[K, ...]`` device array gets a
``NamedSharding`` on the leading axis and the vmapped kernels run jitted,
so XLA's SPMD partitioner executes K/D proofs per device with no
collectives on the hot path (the axis is embarrassingly parallel; only
the host readbacks gather).  Because all kernels are exact modular
integer arithmetic, the distributed proofs are bit-identical to
single-device ones (asserted by ``tests/test_parallel.py``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import goldilocks as gl
from ..ops import merkle as mk
from ..ops import ntt as nt
from ..ops import poseidon as ps
from .algebra import ext_add, ext_mul
from .challenger import Challenger
from .circuit import CircuitData
from .fri import (
    FriProof,
    _device_openings_enabled,
    _fold_step,
    _inv_2x_table,
    grind_pow,
    query_rounds,
)
from .prover import (
    Proof,
    _PhaseTimer,
    _cap_tuples,
    _combine_columns,
    _extract_initial_openings,
    _gate_quotient_chunk,
    _open_columns,
    compute_wire_matrix,
    get_circuit_kernels,
    n_chunks,
)
from .witness import PartialWitness

P = gl.P_INT

# module-level caches of vmapped kernels (jit re-specializes per K/shape)
_VMAP_JITS: dict = {}


def _vmapped(name: str, fn, in_axes, use_jit: bool, aot: bool = False,
             extra: str = ""):
    """Vmapped (and optionally jitted) kernel, cached per call-site name.
    ``aot=True`` routes through the disk-backed executable cache
    (engine/aot_cache.py) so warm processes skip re-tracing; mesh-sharded
    runs must pass ``aot=False`` (serialized executables bake their device
    assignment)."""
    key = (name, id(fn), in_axes, use_jit, aot, extra)
    entry = _VMAP_JITS.get(key)
    if entry is None:
        v = jax.vmap(fn, in_axes=in_axes)
        if use_jit and aot:
            from .aot_cache import AotJit

            entry = AotJit(v, f"vmap_{name}", extra=extra)
        elif use_jit:
            entry = jax.jit(v)
        else:
            entry = v
        _VMAP_JITS[key] = entry
    return entry


@jax.jit
def _fri_initial_one(comb1, comb2, xs_ext, zeta, gzeta, c1z, c2gz):
    """Initial FRI evaluation vector G for one proof (vmapped below)."""

    def sub_const_ext(arr, cst):
        out0 = gl.sub(arr[..., 0], cst[0])
        out1 = gl.sub(arr[..., 1], cst[1])
        return jnp.stack([out0, out1], axis=-1)

    denom1 = gl.ext_inv(sub_const_ext(xs_ext, zeta))
    denom2 = gl.ext_inv(sub_const_ext(xs_ext, gzeta))
    num1 = sub_const_ext(comb1, c1z)
    num2 = sub_const_ext(comb2, c2gz)
    return gl.ext_add(gl.ext_mul(num1, denom1), gl.ext_mul(num2, denom2))


def _commit_batch(matrices, rate_bits: int, cap_height: int,
                  from_coeffs: bool = False, extras=()):
    """[K, S, n] (numpy or device) ->
    (coeffs_dev [K, S, n], lde_dev [K, S, lde_n], lde_np, K trees,
    extras_np).  The NTT/LDE fold the proof axis into the row axis (one
    dispatch); Merkle levels are built for all K trees at once, and the
    LDE + all tree levels + ``extras`` come back in ONE host transfer
    (coefficients stay on device for the openings/FRI stages)."""
    K, S, n = matrices.shape
    if from_coeffs:
        coeffs = jnp.asarray(matrices).reshape(K * S, n)
    else:
        coeffs = nt.intt(jnp.asarray(matrices).reshape(K * S, n))
    lde = nt.coset_lde(coeffs, rate_bits)
    lde_k = lde.reshape(K, S, -1)
    levels_dev = mk.build_merkle_levels_batch(jnp.transpose(lde_k, (0, 2, 1)), cap_height)
    if _device_openings_enabled() and getattr(lde_k, "is_fully_addressable", True):
        # device-resident trees: fetch caps + extras only (see
        # prover._commit); per-proof trees view the batched level arrays
        fetched = mk.fetch_arrays(levels_dev[-1], *extras)
        caps_np = fetched[0]  # [K, 2^h, 4]
        trees = [
            mk.DeviceMerkleTree(
                levels_dev=[lv[k] for lv in levels_dev],
                cap_height=cap_height,
                cap_np=caps_np[k],
            )
            for k in range(K)
        ]
        return coeffs.reshape(K, S, n), lde_k, None, trees, tuple(fetched[1:])
    fetched = mk.fetch_arrays(lde_k, *extras, *levels_dev)
    lde_np = fetched[0]
    extras_np = tuple(fetched[1 : 1 + len(extras)])
    trees = mk.trees_from_batch_levels(list(fetched[1 + len(extras) :]), cap_height)
    return coeffs.reshape(K, S, n), lde_k, lde_np, trees, extras_np


def prove_batch(
    circuit_data: CircuitData,
    pws: list,
    mesh=None,
    axis_name: str = "d",
) -> list:
    """Prove K witnesses of one circuit; returns K proofs bit-identical to
    sequential ``prove`` calls.

    ``mesh``: optional 1-axis device mesh.  The proof axis is sharded over
    ``mesh`` (padded to a multiple of the device count by repeating the
    last witness's wires; padding lanes are dropped from the result), and
    the vmapped kernels run jitted so the SPMD partitioner splits the K
    proofs across devices."""
    pd = circuit_data.prover
    common = pd.common
    cfg = common.config
    n = common.n
    fri_cfg = cfg.fri
    lde_n = n * fri_cfg.blowup
    R = cfg.num_routed_wires
    C = cfg.num_challenges
    nch = n_chunks(R)
    K_real = len(pws)
    assert K_real >= 1
    timer = _PhaseTimer()
    timer.phase("kernels")  # per-circuit tables + AOT kernel setup
    kernels = get_circuit_kernels(pd)
    intern = kernels["_internals"]
    use_jit = intern["use_jit"] or mesh is not None
    # mesh runs use the AOT executable cache too: each argument's sharding
    # (axis spec + device assignment) rides in the cache key, so a warm
    # process with the same topology skips re-tracing (aot_cache.py)
    aot = True

    if mesh is not None:
        d = mesh.shape[axis_name]
        K = ((K_real + d - 1) // d) * d
        from jax.sharding import NamedSharding, PartitionSpec

        def put(arr):
            a = jnp.asarray(arr)
            spec = PartitionSpec(axis_name, *([None] * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))

    else:
        K = K_real

        def put(arr):
            return jnp.asarray(arr)

    timer.phase("witness")
    # ---- 1. witness fill (host, per proof) ----
    wires_all = np.empty((K, cfg.num_wires, n), dtype=np.uint64)
    public_inputs_all = []
    pi_hashes = []
    for k, pw in enumerate(pws):
        wires, public_inputs = compute_wire_matrix(pd, pw)
        wires_all[k] = wires
        public_inputs_all.append(public_inputs)
        pi_hashes.append(ps.hash_no_pad_s(public_inputs))
    for k in range(K_real, K):  # mesh padding: repeat the last proof
        wires_all[k] = wires_all[K_real - 1]
        public_inputs_all.append(public_inputs_all[K_real - 1])
        pi_hashes.append(pi_hashes[K_real - 1])

    timer.phase("commit_wires")
    # ---- 2. commit wires ----
    wires_dev = put(wires_all)
    wire_coeffs_dev, wire_lde_dev, wire_lde, wires_trees, _ = _commit_batch(
        wires_dev, fri_cfg.rate_bits, fri_cfg.cap_height
    )

    challengers = [Challenger() for _ in range(K)]
    betas = np.empty((K, C), dtype=np.uint64)
    gammas = np.empty((K, C), dtype=np.uint64)
    for k, ch in enumerate(challengers):
        ch.observe_hash(common.circuit_digest)
        ch.observe_hash(pi_hashes[k])
        ch.observe_cap(_cap_tuples(wires_trees[k]))
        betas[k] = ch.get_n_challenges(C)
        gammas[k] = ch.get_n_challenges(C)

    timer.phase("perm_columns")
    # ---- 3. permutation argument columns ----
    from ..runtime import perm_pallas_enabled

    betas_dev = put(betas)
    gammas_dev = put(gammas)
    if (mesh is None and jax.default_backend() != "cpu"
            and perm_pallas_enabled()):
        # the Mosaic kernel folds the proof axis into its grid; mesh runs
        # keep the vmap path (a Mosaic custom call cannot be auto-
        # partitioned by SPMD)
        from ..ops.perm_columns_pallas import perm_columns_pallas_batched

        z_cols_d, pp_cols_d, wraps = perm_columns_pallas_batched(
            wires_dev[:, :R], betas_dev, gammas_dev,
            intern["id_vals"], intern["sigma"],
        )
    else:
        perm_batch = _vmapped(
            "perm_columns", intern["perm_columns_impl"], (0, 0, 0, None, None),
            use_jit, aot, extra="suffinv",
        )
        z_cols_d, pp_cols_d, wraps = perm_batch(
            wires_dev[:, :R],
            betas_dev,
            gammas_dev,
            intern["id_vals"],
            intern["sigma"],
        )
    zs_pp_matrices_dev = jnp.concatenate(
        [z_cols_d, pp_cols_d.reshape(K, C * (nch - 1), n)], axis=1
    )
    zspp_coeffs_dev, zspp_lde_dev, zspp_lde, zs_pp_trees, (wraps_np,) = _commit_batch(
        zs_pp_matrices_dev, fri_cfg.rate_bits, fri_cfg.cap_height, extras=(wraps,)
    )
    assert (wraps_np == 1).all(), (
        "permutation argument product != 1 (sigma inconsistent)"
    )
    alphas = np.empty((K, C), dtype=np.uint64)
    for k, ch in enumerate(challengers):
        ch.observe_cap(_cap_tuples(zs_pp_trees[k]))
        alphas[k] = ch.get_n_challenges(C)

    timer.phase("quotient")
    # ---- 4. quotient (vmapped chunked kernels) ----
    wires_lde_arr = wire_lde_dev
    zs_lde_arr = zspp_lde_dev[:, :C]
    pps_lde_arr = zspp_lde_dev[:, C:].reshape(K, C, nch - 1, lde_n)
    alphas_arr = put(alphas)
    pi_arr = put(np.array(pi_hashes, dtype=np.uint64))

    if (mesh is None and jax.default_backend() != "cpu"
            and perm_pallas_enabled()):
        from ..ops.perm_quotient_pallas import perm_quotient_pallas_batched

        acc, apows = perm_quotient_pallas_batched(
            wires_lde_arr,
            zs_lde_arr,
            pps_lde_arr,
            betas_dev,
            gammas_dev,
            alphas_arr,
            intern["sigma_lde"],
            intern["xs"],
            intern["l0"],
            intern["k_is"],
            fri_cfg.blowup,
        )
    else:
        pqp_batch = _vmapped(
            "perm_quotient",
            intern["perm_quotient_part"],
            (0, 0, 0, 0, 0, 0, None, None, None),
            use_jit, aot, extra=f"b{fri_cfg.blowup}",
        )
        acc, apows = pqp_batch(
            wires_lde_arr,
            zs_lde_arr,
            pps_lde_arr,
            betas_dev,
            gammas_dev,
            alphas_arr,
            intern["sigma_lde"],
            intern["xs"],
            intern["l0"],
        )
    from ..runtime import gate_pallas_enabled
    from .gates import GATE_TYPES

    for gi, chunk_key in intern["gate_chunk_keys"]:
        gate_id, lo, hi = chunk_key[0], chunk_key[1], chunk_key[2]
        if (
            gate_id == "poseidon"
            and lo == 0
            and hi == GATE_TYPES[gate_id].num_constraints
            and mesh is None
            and jax.default_backend() != "cpu"
            and gate_pallas_enabled()
        ):
            # the proof axis folds into the Mosaic grid: one ~MB program
            # instead of a 330-476 MB per-K vmap executable
            from ..ops.gate_quotient_pallas import (
                poseidon_gate_quotient_pallas_batched,
            )

            acc, apows = poseidon_gate_quotient_pallas_batched(
                wires_lde_arr, intern["sel_cols"][gi], alphas_arr, acc,
                apows, C,
            )
            continue
        raw = _gate_quotient_chunk(*chunk_key, use_jit=False)
        fn = _vmapped(
            f"chunk:{chunk_key}", raw, (0, None, None, 0, 0, 0, 0),
            use_jit, aot, extra=str(chunk_key),
        )
        acc, apows = fn(
            wires_lde_arr,
            intern["sel_cols"][gi],
            intern["const_lde"],
            pi_arr,
            alphas_arr,
            acc,
            apows,
        )
    if (mesh is None and jax.default_backend() != "cpu"
            and perm_pallas_enabled()):
        from ..ops.zinv_mul_pallas import zinv_mul_pallas

        q = zinv_mul_pallas(acc, intern["z_h"])  # [K, C, lde_n]
        quotient_matrices_dev = intern["finish_tail"](
            q.reshape(K * C, lde_n), intern["shift_pows"]
        ).reshape(K, C * fri_cfg.blowup, n)
    else:
        # embeds intt: the extra must carry the same Pallas-NTT graph tag
        # as prover._wrap (reachable with INTMAX_TPU_PERM_PALLAS=0 while
        # the Pallas NTT stays enabled)
        from ..ops.ntt import _pallas_ntt_enabled

        if jax.default_backend() != "cpu" and _pallas_ntt_enabled():
            from ..ops.ntt_pallas import NTT_GRAPH_VERSION

            ntt_tag = f"-pntt{NTT_GRAPH_VERSION}"
        else:
            ntt_tag = ""
        finish_batch = _vmapped(
            "finish", intern["quotient_finish"], (0, None, None),
            use_jit, aot, extra=f"b{fri_cfg.blowup}-ntt2{ntt_tag}",
        )
        quotient_matrices_dev = finish_batch(acc, intern["z_h"], intern["shift_pows"])
    quot_coeffs_dev, quot_lde_dev, quot_lde, quotient_trees, _ = _commit_batch(
        quotient_matrices_dev, fri_cfg.rate_bits, fri_cfg.cap_height, from_coeffs=True
    )
    zetas = []
    for k, ch in enumerate(challengers):
        ch.observe_cap(_cap_tuples(quotient_trees[k]))
        zetas.append(ch.get_extension_challenge())

    timer.phase("openings")
    # ---- 5. openings ----
    g_n = gl.primitive_root_of_unity(n.bit_length() - 1)
    gzetas = [(z[0] * g_n % P, z[1] * g_n % P) for z in zetas]
    cs_coeffs_dev = intern["cs_coeffs_dev"]
    cs_coeffs_b = put(
        jnp.broadcast_to(cs_coeffs_dev[None], (K,) + cs_coeffs_dev.shape)
    )
    all_coeffs_dev = jnp.concatenate(
        [cs_coeffs_b, wire_coeffs_dev, zspp_coeffs_dev, quot_coeffs_dev], axis=1
    )
    open_batch = _vmapped("open", _open_columns, (0, 0), use_jit, aot,
                          extra="v2")
    zetas_arr = put(np.array(zetas, dtype=np.uint64))
    gzetas_arr = put(np.array(gzetas, dtype=np.uint64))
    opens_zeta, opens_gzeta_z = mk.fetch_arrays(
        open_batch(all_coeffs_dev, zetas_arr),
        open_batch(zspp_coeffs_dev[:, :C], gzetas_arr),
    )

    n_cs = pd.cs_coeffs.shape[0]
    n_w = cfg.num_wires
    n_zpp = zspp_coeffs_dev.shape[1]
    openings_all = []
    for k, ch in enumerate(challengers):
        oz = opens_zeta[k]
        openings = {
            "constants_sigmas": [tuple(int(x) for x in o) for o in oz[:n_cs]],
            "wires": [tuple(int(x) for x in o) for o in oz[n_cs : n_cs + n_w]],
            "zs_pp": [
                tuple(int(x) for x in o) for o in oz[n_cs + n_w : n_cs + n_w + n_zpp]
            ],
            "quotient": [tuple(int(x) for x in o) for o in oz[n_cs + n_w + n_zpp :]],
            "zs_next": [tuple(int(x) for x in o) for o in opens_gzeta_z[k]],
        }
        for name in ["constants_sigmas", "wires", "zs_pp", "quotient", "zs_next"]:
            for o in openings[name]:
                ch.observe_ext(o)
        openings_all.append(openings)

    timer.phase("fri")
    # ---- 6. FRI ----
    alpha_fris = [ch.get_extension_challenge() for ch in challengers]
    cs_lde_dev = intern["cs_lde_dev"]
    cs_lde_b = put(jnp.broadcast_to(cs_lde_dev[None], (K,) + cs_lde_dev.shape))
    batch1_lde_dev = jnp.concatenate(
        [cs_lde_b, wire_lde_dev, zspp_lde_dev, quot_lde_dev], axis=1
    )
    m1 = batch1_lde_dev.shape[1]

    alpha_pows_all = np.empty((K, m1 + C, 2), dtype=np.uint64)
    for k in range(K):
        apow = (1, 0)
        for i in range(m1 + C):
            alpha_pows_all[k, i] = apow
            apow = ext_mul(apow, alpha_fris[k])

    combine_batch = _vmapped("combine", _combine_columns, (0, 0), use_jit,
                             aot, extra="v2")
    comb1 = combine_batch(batch1_lde_dev, put(alpha_pows_all[:, :m1]))
    comb2 = combine_batch(
        zspp_lde_dev[:, :C], put(alpha_pows_all[:, m1 : m1 + C])
    )

    comb1_at = np.empty((K, 2), dtype=np.uint64)
    comb2_at = np.empty((K, 2), dtype=np.uint64)
    for k in range(K):
        o = openings_all[k]
        flat = o["constants_sigmas"] + o["wires"] + o["zs_pp"] + o["quotient"]
        acc1 = (0, 0)
        for i, y in enumerate(flat):
            pw_i = (int(alpha_pows_all[k, i, 0]), int(alpha_pows_all[k, i, 1]))
            acc1 = ext_add(acc1, ext_mul(pw_i, y))
        acc2 = (0, 0)
        for j, y in enumerate(o["zs_next"]):
            pw_j = (
                int(alpha_pows_all[k, m1 + j, 0]),
                int(alpha_pows_all[k, m1 + j, 1]),
            )
            acc2 = ext_add(acc2, ext_mul(pw_j, y))
        comb1_at[k] = acc1
        comb2_at[k] = acc2

    xs_ext = jnp.stack([intern["xs"], jnp.zeros(lde_n, dtype=jnp.uint64)], axis=-1)

    if (mesh is None and jax.default_backend() != "cpu"
            and perm_pallas_enabled()):
        from ..ops.fri_init_pallas import fri_initial_pallas_batched

        G = fri_initial_pallas_batched(
            comb1, comb2, intern["xs"], zetas_arr, gzetas_arr,
            put(comb1_at), put(comb2_at),
        )
    else:
        fri_init_batch = _vmapped(
            "fri_init", _fri_initial_one, (0, 0, None, 0, 0, 0, 0), use_jit, aot
        )
        G = fri_init_batch(
            comb1,
            comb2,
            xs_ext,
            zetas_arr,
            gzetas_arr,
            put(comb1_at),
            put(comb2_at),
        )

    # fold all K proofs in lockstep (per-proof transcripts drive the betas).
    # Layer eval pairs stay device-side: each layer tree's leaf level IS the
    # pair table (4-wide hash_or_noop passthrough, see fri.query_rounds).
    fold_batch = _vmapped("fold", _fold_step, (0, None, 0), use_jit, aot)
    trees_per = [[] for _ in range(K)]
    cur = G  # [K, N, 2]
    cur_shift = gl.MULTIPLICATIVE_GROUP_GENERATOR % P
    while cur.shape[1] > fri_cfg.final_poly_len * fri_cfg.blowup:
        m = cur.shape[1]
        half = m // 2
        leaf = jnp.concatenate([cur[:, :half], cur[:, half:]], axis=2)  # [K, half, 4]
        cap_h = min(fri_cfg.cap_height, (half - 1).bit_length())
        if _device_openings_enabled() and getattr(leaf, "is_fully_addressable", True):
            lv_dev = mk.build_merkle_levels_batch(leaf, cap_h)
            caps_np = mk.fetch_arrays(lv_dev[-1])[0]
            layer_trees = [
                mk.DeviceMerkleTree(
                    levels_dev=[lv[k] for lv in lv_dev],
                    cap_height=cap_h,
                    cap_np=caps_np[k],
                )
                for k in range(K)
            ]
        else:
            layer_trees = mk.build_merkle_trees_batch(leaf, cap_h)
        layer_betas = np.empty((K, 2), dtype=np.uint64)
        for k, ch in enumerate(challengers):
            trees_per[k].append(layer_trees[k])
            ch.observe_cap(_cap_tuples(layer_trees[k]))
            layer_betas[k] = ch.get_extension_challenge()
        inv2x = jnp.asarray(_inv_2x_table(m.bit_length() - 1, cur_shift))
        cur = fold_batch(cur, inv2x, put(layer_betas))
        cur_shift = cur_shift * cur_shift % P

    # final polynomial per proof: both extension components for all K
    # proofs in one coset_ilde call
    flat = jnp.concatenate([cur[:, :, 0], cur[:, :, 1]], axis=0)  # [2K, final_n]
    # fetch_arrays, not np.asarray: on a multi-process mesh the folded
    # layers are globally sharded and need a process_allgather
    final_coeffs = mk.fetch_arrays(nt.coset_ilde(flat, fri_cfg.rate_bits, cur_shift))[0]
    final_polys = []
    for k in range(K):
        fp = [
            (int(a), int(b))
            for a, b in zip(final_coeffs[k], final_coeffs[K + k])
        ]
        for c in fp:
            challengers[k].observe_ext(c)
        final_polys.append(fp)

    timer.phase("queries")
    proofs = []
    for k, ch in enumerate(challengers):
        pow_witness = grind_pow(ch, fri_cfg.proof_of_work_bits)
        indices, rounds = query_rounds(trees_per[k], fri_cfg, ch, lde_n)
        named_trees = {
            "constants_sigmas": (None, pd.cs_lde, pd.cs_tree),
            "wires": (wire_lde_dev[k], None if wire_lde is None else wire_lde[k],
                      wires_trees[k]),
            "zs_pp": (zspp_lde_dev[k], None if zspp_lde is None else zspp_lde[k],
                      zs_pp_trees[k]),
            "quotient": (quot_lde_dev[k], None if quot_lde is None else quot_lde[k],
                         quotient_trees[k]),
        }
        initial_openings = _extract_initial_openings(named_trees, indices)
        proofs.append(
            Proof(
                wires_cap=_cap_tuples(wires_trees[k]),
                zs_pp_cap=_cap_tuples(zs_pp_trees[k]),
                quotient_cap=_cap_tuples(quotient_trees[k]),
                openings=openings_all[k],
                fri=FriProof(
                    caps=[_cap_tuples(t) for t in trees_per[k]],
                    final_poly=final_polys[k],
                    pow_witness=pow_witness,
                    query_rounds=rounds,
                ),
                initial_openings=initial_openings,
                public_inputs=[int(v) for v in public_inputs_all[k]],
            )
        )
    timer.done()
    return proofs[:K_real]
