"""In-circuit ECDSA (reference ``src/ecdsa/bin/ecdsa_verification.rs``,
cargo feature ``ecdsa``): the U32 gate, the non-native secp256k1
arithmetic gadgets, curve ops, and the full verification circuit."""

import pytest

from intmax_zkp_core_tpu.engine.circuit import CircuitBuilder
from intmax_zkp_core_tpu.engine.config import CircuitConfig, FriConfig
from intmax_zkp_core_tpu.engine.witness import PartialWitness
from intmax_zkp_core_tpu.models.ecdsa.account import (
    GX,
    GY,
    N256,
    P256,
    _point_add,
    point_mul,
    private_key_to_account,
    sign_message,
    verify_message,
)
from intmax_zkp_core_tpu.models.ecdsa.circuits import (
    make_ecdsa_verification_circuit,
)
from intmax_zkp_core_tpu.models.ecdsa.gadgets import (
    add_nonnative,
    add_virtual_biguint,
    constant_affine_point,
    constant_biguint,
    curve_add_nonequal,
    curve_double,
    curve_scalar_mul,
    curve_scalar_mul_constant_base,
    inv_nonnative,
    limbs_of,
    mul_nonnative,
    set_biguint_witness,
    sub_nonnative,
)

P = 0xFFFFFFFF00000001


def tiny_config():
    return CircuitConfig(fri=FriConfig(num_query_rounds=6, proof_of_work_bits=4))


def _register_biguint(builder, big):
    for limb in big.limbs:
        builder.register_public_input(limb)


def _from_pis(pis):
    return sum(v << (32 * i) for i, v in enumerate(pis))


def test_u32_mul_add_gate_prove_verify():
    builder = CircuitBuilder(tiny_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    c = builder.add_virtual_target()
    lo, hi = builder.u32_mul_add(a, b, c)
    for t in (a, b, c, lo, hi):
        builder.register_public_input(t)
    data = builder.build()

    pw = PartialWitness()
    av, bv, cv = 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF  # max case: v = p - 1
    pw.set_target(a, av)
    pw.set_target(b, bv)
    pw.set_target(c, cv)
    proof = data.prove(pw)
    v = av * bv + cv
    assert proof.public_inputs == [av, bv, cv, v & 0xFFFFFFFF, v >> 32]
    data.verify(proof)


def test_range_check_u32_rejects_large():
    builder = CircuitBuilder(tiny_config())
    t = builder.add_virtual_target()
    builder.range_check_u32(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(t, 1 << 32)
    with pytest.raises(AssertionError):
        data.check_witness(pw)


def test_nonnative_arithmetic_mod_n():
    x_v = 0xDEADBEEF_CAFEBABE_12345678_9ABCDEF0_0F1E2D3C_4B5A6978_87695A4B_3C2D1E0F
    y_v = N256 - 0x1234567890ABCDEF

    builder = CircuitBuilder(tiny_config())
    x = add_virtual_biguint(builder)
    y = add_virtual_biguint(builder)
    prod = mul_nonnative(builder, x, y, N256)
    s = add_nonnative(builder, x, y, N256)
    d = sub_nonnative(builder, x, y, N256)
    inv = inv_nonnative(builder, x, N256)
    for big in (prod, s, d, inv):
        _register_biguint(builder, big)
    data = builder.build()

    pw = PartialWitness()
    set_biguint_witness(pw, x, x_v)
    set_biguint_witness(pw, y, y_v)
    pis = data.check_witness(pw)
    assert _from_pis(pis[0:8]) == x_v * y_v % N256
    assert _from_pis(pis[8:16]) == (x_v + y_v) % N256
    assert _from_pis(pis[16:24]) == (x_v - y_v) % N256
    assert _from_pis(pis[24:32]) == pow(x_v, -1, N256)


def test_nonnative_mul_wrong_result_rejected():
    builder = CircuitBuilder(tiny_config())
    x = add_virtual_biguint(builder)
    out = add_virtual_biguint(builder)
    from intmax_zkp_core_tpu.models.ecdsa.gadgets import mul_nonnative_into

    mul_nonnative_into(builder, x, x, out, N256)
    data = builder.build()
    pw = PartialWitness()
    set_biguint_witness(pw, x, 123456789)
    set_biguint_witness(pw, out, 123456789**2 + 1)
    with pytest.raises(AssertionError):
        data.check_witness(pw)


def test_curve_add_and_double():
    p1 = point_mul(7)
    p2 = point_mul(11)

    builder = CircuitBuilder(tiny_config())
    t1 = constant_affine_point(builder, p1)
    t2 = constant_affine_point(builder, p2)
    s = curve_add_nonequal(builder, t1, t2)
    dbl = curve_double(builder, t1)
    for big in (s.x, s.y, dbl.x, dbl.y):
        _register_biguint(builder, big)
    data = builder.build()

    pis = data.check_witness(PartialWitness())
    exp_add = point_mul(18)
    exp_dbl = point_mul(14)
    assert (_from_pis(pis[0:8]), _from_pis(pis[8:16])) == exp_add
    assert (_from_pis(pis[16:24]), _from_pis(pis[24:32])) == exp_dbl


def test_scalar_mul_constant_base_small():
    scalar_v = 0xB7E5  # 16-bit scalar so the trimmed multiplier is sound
    builder = CircuitBuilder(tiny_config())
    scalar = add_virtual_biguint(builder)
    out = curve_scalar_mul_constant_base(builder, (GX, GY), scalar, n_bits=16)
    _register_biguint(builder, out.x)
    _register_biguint(builder, out.y)
    data = builder.build()
    pw = PartialWitness()
    set_biguint_witness(pw, scalar, scalar_v)
    pis = data.check_witness(pw)
    assert (_from_pis(pis[0:8]), _from_pis(pis[8:16])) == point_mul(scalar_v)


def test_scalar_mul_variable_base_small():
    scalar_v = 0x9D
    base = point_mul(1234567)
    builder = CircuitBuilder(tiny_config())
    scalar = add_virtual_biguint(builder)
    p = constant_affine_point(builder, base)
    out = curve_scalar_mul(builder, p, scalar, n_bits=8)
    _register_biguint(builder, out.x)
    _register_biguint(builder, out.y)
    data = builder.build()
    pw = PartialWitness()
    set_biguint_witness(pw, scalar, scalar_v)
    pis = data.check_witness(pw)
    assert (_from_pis(pis[0:8]), _from_pis(pis[8:16])) == point_mul(
        scalar_v, base
    )


def _contrived_small_exponent_signature(n_bits: int):
    """A valid (msg, r, s, pk) whose verifier scalars u1, u2 fit n_bits,
    so the bit-trimmed test circuit stays sound: pick small u1, u2, set
    Q = u1*G + u2*pk, r = Q.x mod n, then solve s = r * u2^{-1} and
    msg = u1 * s mod n."""
    d = 0x5EED5EED5EED5EED5EED5EED5EED5EED
    pk = point_mul(d)
    u1 = 0xA5F3 % (1 << n_bits)
    u2 = 0x3C71 % (1 << n_bits)
    q = _point_add(point_mul(u1), point_mul(u2, pk))
    r = q[0] % N256
    s = r * pow(u2, -1, N256) % N256
    msg = u1 * s % N256
    assert verify_message(pk, msg, (r, s))
    # the verifier's scalars really are the small ones
    c = pow(s, -1, N256)
    assert msg * c % N256 == u1 and r * c % N256 == u2
    return msg, (r, s), pk


def test_ecdsa_verification_circuit_small():
    msg, sig, pk = _contrived_small_exponent_signature(16)
    circuit = make_ecdsa_verification_circuit(
        msg, sig, pk, config=tiny_config(), n_bits=16
    )
    circuit.check()


def test_ecdsa_rejects_wrong_signature():
    msg, sig, pk = _contrived_small_exponent_signature(16)
    bad_sig = (sig[0], (sig[1] + 1) % N256)
    with pytest.raises(AssertionError):
        make_ecdsa_verification_circuit(
            msg, bad_sig, pk, config=tiny_config(), n_bits=16
        ).check()


def test_ecdsa_host_sign_verify_roundtrip():
    acct = private_key_to_account(0xDEADBEEF12345678)
    msg = 0x1122334455667788_99AABBCCDDEEFF00_0102030405060708_090A0B0C0D0E0F10
    sig = sign_message(0xDEADBEEF12345678, msg)
    assert verify_message(acct.public_key, msg, sig)
    assert not verify_message(acct.public_key, msg + 1, sig)
