"""The Plonk-style prover: witness fill -> wire commitment -> permutation
argument -> quotient -> FRI opening proof.

This is the counterpart of ``CircuitData::prove`` (the reference's hot loop,
``SURVEY.md`` §3.1: witness generation -> wire polys -> NTT/LDE -> quotient
-> FRI commit/fold -> Merkle caps).  All polynomial work is batched on
device; host code only orchestrates and runs the Fiat-Shamir transcript.
"""

from __future__ import annotations

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


def n_chunks(num_routed: int) -> int:
    return (num_routed + CHUNK - 1) // CHUNK


@dataclass
class Proof:
    wires_cap: list
    zs_pp_cap: list
    quotient_cap: list
    openings: dict
    fri: FriProof
    initial_openings: list  # per query: {name: (leaf, path)}
    public_inputs: list


@partial(jax.jit, static_argnums=())
def _open_columns(coeffs: jnp.ndarray, zeta: jnp.ndarray) -> jnp.ndarray:
    """Evaluate S column polynomials [S, n] at an extension point [2] via a
    scanned Horner loop; returns [S, 2]."""
    S, n = coeffs.shape

    def step(acc, coeff_col):
        # acc: [S, 2]; coeff_col: [S]
        prod = gl.ext_mul(acc, jnp.broadcast_to(zeta, acc.shape))
        prod = prod.at[..., 0].set(gl.add(prod[..., 0], coeff_col))
        return prod, None

    init = jnp.zeros((S, 2), dtype=jnp.uint64)
    acc, _ = jax.lax.scan(step, init, jnp.flip(coeffs.T, axis=0))
    return acc


def _commit(matrix_np: np.ndarray, rate_bits: int, cap_height: int, from_coeffs: bool = False):
    """columns [S, n] (evaluations on the subgroup, or coefficients if
    ``from_coeffs``) -> (coeffs, lde, tree)."""
    if from_coeffs:
        coeffs = jnp.asarray(matrix_np)
    else:
        coeffs = nt.intt(jnp.asarray(matrix_np))
    lde = nt.coset_lde(coeffs, rate_bits)
    leaves = jnp.transpose(lde)
    tree = mk.build_merkle_tree(leaves, cap_height)
    return np.asarray(coeffs), np.asarray(lde), tree


def _cap_tuples(tree: mk.MerkleTree) -> list:
    return [tuple(int(x) for x in d) for d in tree.cap]


def compute_vanishing_on_coset(
    pd, wires_lde, zs, pps, betas, gammas, alphas, lde_n: int
):
    """Batched evaluation of all constraints on the LDE coset, combined with
    alpha powers per challenge.  Returns [num_challenges] arrays of [lde_n]."""
    common = pd.common
    cfg = common.config
    n = common.n
    R = cfg.num_routed_wires
    alg = BatchAlgebra()

    n_sel = common.n_sel
    cs_lde = pd.cs_lde  # [n_sel + n_const + R, lde_n]
    sel_lde = cs_lde[:n_sel]
    const_lde = cs_lde[n_sel : n_sel + common.n_const_cols]
    sigma_lde = cs_lde[n_sel + common.n_const_cols :]

    # gate constraints (filtered by selectors)
    wires_cols = [wires_lde[i] for i in range(cfg.num_wires)]
    const_cols = [const_lde[i] for i in range(common.n_const_cols)]
    pi_hash_cols = [jnp.uint64(v) for v in pd._pi_hash]
    gate_constraints = []
    for gi, gate_id in enumerate(common.gate_ids):
        gate = GATE_TYPES[gate_id]
        if gate.num_constraints == 0:
            continue
        cs = gate.eval_constraints(alg, wires_cols, const_cols, pi_hash_cols)
        sel = sel_lde[gi]
        gate_constraints.extend(gl.mul(sel, jnp.broadcast_to(c, sel.shape)) for c in cs)

    # domain point values x on the coset
    log_lde = lde_n.bit_length() - 1
    w_lde = gl.primitive_root_of_unity(log_lde)
    xs = np.empty(lde_n, dtype=np.uint64)
    acc = gl.MULTIPLICATIVE_GROUP_GENERATOR % P
    for i in range(lde_n):
        xs[i] = acc
        acc = acc * w_lde % P
    xs = jnp.asarray(xs)

    # x^n on the coset cycles with period blowup: x_i^n = g^n * w_b^i
    gshift = pow(gl.MULTIPLICATIVE_GROUP_GENERATOR, n, P)
    w_b = gl.primitive_root_of_unity(cfg.fri.rate_bits)  # order = blowup
    xn = np.array(
        [gshift * pow(w_b, i % cfg.fri.blowup, P) % P for i in range(lde_n)], dtype=np.uint64
    )
    z_h = gl.sub(jnp.asarray(xn), jnp.uint64(1))
    # L_0(x) = (x^n - 1) / (n * (x - 1)) on the coset
    l0 = gl.mul(z_h, gl.inv(gl.mul(jnp.uint64(n), gl.sub(xs, jnp.uint64(1)))))

    nch = n_chunks(R)
    vanishing = []
    for c in range(cfg.num_challenges):
        beta, gamma = betas[c], gammas[c]
        Z = zs[c]  # [lde_n]
        Z_shift = jnp.roll(Z, -cfg.fri.blowup)  # Z(g*x) on natural-order lde
        terms = []
        # L_0 * (Z - 1)
        terms.append(gl.mul(l0, gl.sub(Z, jnp.uint64(1))))
        # chunk constraints
        prev = Z
        for j in range(nch):
            lo, hi = j * CHUNK, min((j + 1) * CHUNK, R)
            f = None
            g = None
            for i in range(lo, hi):
                v = wires_lde[i]
                # id_i = k_i * x ;  f factor = v + beta*k_i*x + gamma
                fid = gl.add(gl.add(v, gl.mul(jnp.uint64(beta * common.k_is[i] % P), xs)), jnp.uint64(gamma))
                gs = gl.add(gl.add(v, gl.mul(jnp.uint64(beta), sigma_lde[i])), jnp.uint64(gamma))
                f = fid if f is None else gl.mul(f, fid)
                g = gs if g is None else gl.mul(g, gs)
            nxt = Z_shift if j == nch - 1 else pps[c][j]
            terms.append(gl.sub(gl.mul(nxt, g), gl.mul(prev, f)))
            prev = pps[c][j] if j < nch - 1 else None
        terms.extend(gate_constraints)
        # alpha-combine
        alpha = alphas[c]
        acc = jnp.zeros((lde_n,), dtype=jnp.uint64)
        apow = 1
        for t in terms:
            acc = gl.add(acc, gl.mul(jnp.uint64(apow), jnp.broadcast_to(t, (lde_n,))))
            apow = apow * alpha % P
        vanishing.append(acc)
    return vanishing, z_h


def compute_wire_matrix(pd, pw: PartialWitness):
    """Run witness generation and assemble the [num_wires, n] matrix plus
    public inputs (shared by prove() and check_witness())."""
    cfg = pd.common.config
    n = pd.common.n
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


def prove(circuit_data: CircuitData, pw: PartialWitness) -> Proof:
    pd = circuit_data.prover
    common = pd.common
    cfg = common.config
    n = common.n
    fri_cfg = cfg.fri
    lde_n = n * fri_cfg.blowup
    R = cfg.num_routed_wires

    # ---- 1. witness fill ----
    wires, public_inputs = compute_wire_matrix(pd, pw)
    pi_hash = ps.hash_no_pad_s(public_inputs)
    pd._pi_hash = pi_hash  # stashed for constraint evaluation

    # ---- 2. commit wires ----
    wire_coeffs, wire_lde, wires_tree = _commit(wires, fri_cfg.rate_bits, fri_cfg.cap_height)

    challenger = Challenger()
    challenger.observe_hash(common.circuit_digest)
    challenger.observe_hash(pi_hash)
    challenger.observe_cap(_cap_tuples(wires_tree))
    betas = challenger.get_n_challenges(cfg.num_challenges)
    gammas = challenger.get_n_challenges(cfg.num_challenges)

    # ---- 3. permutation argument columns (host, exact) ----
    nch = n_chunks(R)
    sigma = pd.sigma
    w_pows = pd.w_pows
    z_cols = np.zeros((cfg.num_challenges, n), dtype=np.uint64)
    pp_cols = np.zeros((cfg.num_challenges, nch - 1, n), dtype=np.uint64)
    for c in range(cfg.num_challenges):
        beta, gamma = betas[c], gammas[c]
        z = 1
        for row in range(n):
            z_cols[c, row] = z
            running = z
            for j in range(nch):
                lo, hi = j * CHUNK, min((j + 1) * CHUNK, R)
                f = g = 1
                for i in range(lo, hi):
                    v = int(wires[i, row])
                    idv = common.k_is[i] * int(w_pows[row]) % P
                    f = f * ((v + beta * idv + gamma) % P) % P
                    g = g * ((v + beta * int(sigma[i, row]) + gamma) % P) % P
                running = running * f % P * pow(g, P - 2, P) % P
                if j < nch - 1:
                    pp_cols[c, j, row] = running
            z = running
        # wraparound sanity: product over the domain is 1
        assert z == 1, "permutation argument product != 1 (sigma inconsistent)"

    zs_pp_matrix = np.concatenate(
        [z_cols, pp_cols.reshape(cfg.num_challenges * (nch - 1), n)], axis=0
    )
    zspp_coeffs, zspp_lde, zs_pp_tree = _commit(zs_pp_matrix, fri_cfg.rate_bits, fri_cfg.cap_height)
    challenger.observe_cap(_cap_tuples(zs_pp_tree))
    alphas = challenger.get_n_challenges(cfg.num_challenges)

    # ---- 4. quotient ----
    zs_lde = [zspp_lde[c] for c in range(cfg.num_challenges)]
    pps_lde = [
        [zspp_lde[cfg.num_challenges + c * (nch - 1) + j] for j in range(nch - 1)]
        for c in range(cfg.num_challenges)
    ]
    vanishing, z_h = compute_vanishing_on_coset(
        pd, jnp.asarray(wire_lde), zs_lde, pps_lde, betas, gammas, alphas, lde_n
    )
    z_h_inv = gl.inv(jnp.asarray(z_h))
    quotient_cols = []
    for c in range(cfg.num_challenges):
        q_evals = gl.mul(vanishing[c], z_h_inv)
        # full-length inverse coset transform -> coefficients of degree < 8n
        coeffs = nt.intt(q_evals[None, :])[0]
        inv_shift = pow(gl.MULTIPLICATIVE_GROUP_GENERATOR, P - 2, P)
        shift_pows = np.empty(lde_n, dtype=np.uint64)
        acc = 1
        for i in range(lde_n):
            shift_pows[i] = acc
            acc = acc * inv_shift % P
        coeffs = np.asarray(gl.mul(coeffs, jnp.asarray(shift_pows)))
        chunks = coeffs.reshape(fri_cfg.blowup, n)  # chunk i = coeffs[i*n:(i+1)*n]
        quotient_cols.extend(chunks)
    quotient_matrix = np.stack(quotient_cols, axis=0)  # coefficient chunks
    quot_coeffs, quot_lde, quotient_tree = _commit(
        quotient_matrix, fri_cfg.rate_bits, fri_cfg.cap_height, from_coeffs=True
    )
    challenger.observe_cap(_cap_tuples(quotient_tree))
    zeta = challenger.get_extension_challenge()

    # ---- 5. openings at zeta (and g*zeta for Z columns) ----
    g_n = gl.primitive_root_of_unity(n.bit_length() - 1)
    zeta_arr = jnp.asarray(np.array(zeta, dtype=np.uint64))
    gzeta = (zeta[0] * g_n % P, zeta[1] * g_n % P)
    gzeta_arr = jnp.asarray(np.array(gzeta, dtype=np.uint64))

    all_coeffs = np.concatenate([pd.cs_coeffs, wire_coeffs, zspp_coeffs, quot_coeffs], axis=0)
    opens_zeta = np.asarray(_open_columns(jnp.asarray(all_coeffs), zeta_arr))
    opens_gzeta_z = np.asarray(
        _open_columns(jnp.asarray(zspp_coeffs[: cfg.num_challenges]), gzeta_arr)
    )

    n_cs = pd.cs_coeffs.shape[0]
    n_w = cfg.num_wires
    n_zpp = zspp_coeffs.shape[0]
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

    # ---- 6. FRI ----
    alpha_fri = challenger.get_extension_challenge()
    alpha_arr = jnp.asarray(np.array(alpha_fri, dtype=np.uint64))

    # combine batch-1 columns (everything opened at zeta)
    batch1_lde = np.concatenate([pd.cs_lde, wire_lde, zspp_lde, quot_lde], axis=0)
    m1 = batch1_lde.shape[0]
    alpha_pows = []
    apow = (1, 0)
    for _ in range(m1 + cfg.num_challenges):
        alpha_pows.append(apow)
        apow = ext_mul(apow, alpha_fri)

    @jax.jit
    def combine(lde_matrix, pows_arr):
        # sum_i alpha^i * p_i(X): base-field columns times ext alpha powers
        base = jnp.asarray(lde_matrix)  # [m, lde_n]
        acc0 = jnp.zeros((base.shape[1],), dtype=jnp.uint64)
        acc1 = jnp.zeros_like(acc0)

        def step(carry, inp):
            a0, a1 = carry
            col, pw = inp
            a0 = gl.add(a0, gl.mul(col, pw[0]))
            a1 = gl.add(a1, gl.mul(col, pw[1]))
            return (a0, a1), None

        (acc0, acc1), _ = jax.lax.scan(step, (acc0, acc1), (base, pows_arr))
        return jnp.stack([acc0, acc1], axis=-1)  # [lde_n, 2]

    comb1 = combine(jnp.asarray(batch1_lde), jnp.asarray(np.array(alpha_pows[:m1], dtype=np.uint64)))
    comb1_at_zeta = (0, 0)
    flat_opens = (
        openings["constants_sigmas"] + openings["wires"] + openings["zs_pp"] + openings["quotient"]
    )
    for i, y in enumerate(flat_opens):
        comb1_at_zeta = ext_add(comb1_at_zeta, ext_mul(alpha_pows[i], y))

    comb2 = combine(
        jnp.asarray(zspp_lde[: cfg.num_challenges]),
        jnp.asarray(np.array(alpha_pows[m1 : m1 + cfg.num_challenges], dtype=np.uint64)),
    )
    comb2_at_gzeta = (0, 0)
    for j, y in enumerate(openings["zs_next"]):
        comb2_at_gzeta = ext_add(comb2_at_gzeta, ext_mul(alpha_pows[m1 + j], y))

    # domain points
    log_lde = lde_n.bit_length() - 1
    w_lde = gl.primitive_root_of_unity(log_lde)
    xs = np.empty(lde_n, dtype=np.uint64)
    acc = gl.MULTIPLICATIVE_GROUP_GENERATOR % P
    for i in range(lde_n):
        xs[i] = acc
        acc = acc * w_lde % P
    xs_ext = jnp.stack(
        [jnp.asarray(xs), jnp.zeros(lde_n, dtype=jnp.uint64)], axis=-1
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

    trees, layer_evals, final_poly, fri_betas = fold_layers(
        G, gl.MULTIPLICATIVE_GROUP_GENERATOR, fri_cfg, challenger
    )
    pow_witness = grind_pow(challenger, fri_cfg.proof_of_work_bits)
    indices, rounds = query_rounds(trees, layer_evals, fri_cfg, challenger, lde_n)

    # initial-tree openings per query
    initial_openings = []
    named_trees = {
        "constants_sigmas": (pd.cs_lde, pd.cs_tree),
        "wires": (wire_lde, wires_tree),
        "zs_pp": (zspp_lde, zs_pp_tree),
        "quotient": (quot_lde, quotient_tree),
    }
    for idx in indices:
        per = {}
        for name, (lde, tree) in named_trees.items():
            leaf = [int(x) for x in lde[:, idx]]
            path = [tuple(int(x) for x in d) for d in tree.prove(idx)]
            per[name] = (leaf, path)
        initial_openings.append(per)

    fri_proof = FriProof(
        caps=[_cap_tuples(t) for t in trees],
        final_poly=final_poly,
        pow_witness=pow_witness,
        query_rounds=rounds,
    )

    return Proof(
        wires_cap=_cap_tuples(wires_tree),
        zs_pp_cap=_cap_tuples(zs_pp_tree),
        quotient_cap=_cap_tuples(quotient_tree),
        openings=openings,
        fri=fri_proof,
        initial_openings=initial_openings,
        public_inputs=[int(v) for v in public_inputs],
    )
