"""Ground-truth sanity: fields, curves, serialization vectors, pairing, NTT.

The serialization vectors are the public ZCash-format encodings of the
BLS12-381 generators, which pins bit-compatibility with blst's
to_bytes/serialize (the encodings the reference emits on the wire,
reference src/rpc.rs:310-312 and setup files, src/engine/piano.rs:649-706).
"""

import random

from fourier_tpu.constants import FR_GENERATOR, P, R, root_of_unity
from fourier_tpu.refimpl import curve, field, pairing, poly
from fourier_tpu.refimpl.curve import (
    G1_GEN,
    G2_GEN,
    g1_add,
    g1_deserialize,
    g1_from_bytes,
    g1_mul,
    g1_serialize,
    g1_to_bytes,
    g2_deserialize,
    g2_from_bytes,
    g2_mul,
    g2_serialize,
    g2_to_bytes,
)

# Public ZCash-format vectors for the BLS12-381 generators.
G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb"
)
G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
    "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
    "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
)


def test_fr_roots_of_unity():
    for scale in (0, 1, 2, 5, 20, 32):
        w = root_of_unity(scale)
        assert pow(w, 1 << scale, R) == 1
        if scale > 0:
            assert pow(w, 1 << (scale - 1), R) != 1


def test_fr_generator_order():
    assert pow(FR_GENERATOR, R - 1, R) == 1
    # 7 is a non-residue (generates the full group iff 7^((r-1)/q) != 1 for
    # prime factors q; spot-check q = 2)
    assert pow(FR_GENERATOR, (R - 1) // 2, R) == R - 1


def test_g1_group():
    assert curve.g1_is_on_curve(G1_GEN)
    assert g1_mul(G1_GEN, R) is None          # group order
    two_g = g1_add(G1_GEN, G1_GEN)
    assert two_g == g1_mul(G1_GEN, 2)
    assert g1_add(two_g, curve.g1_neg(G1_GEN)) == G1_GEN
    assert g1_add(G1_GEN, None) == G1_GEN


def test_g2_group():
    assert curve.g2_is_on_curve(G2_GEN)
    assert g2_mul(G2_GEN, R) is None


def test_g1_serialization_vectors():
    assert g1_to_bytes(G1_GEN) == G1_GEN_COMPRESSED
    assert g1_from_bytes(G1_GEN_COMPRESSED) == G1_GEN
    ser = g1_serialize(G1_GEN)
    assert len(ser) == 96
    assert g1_deserialize(ser) == G1_GEN
    # infinity round trips
    assert g1_from_bytes(g1_to_bytes(None)) is None
    assert g1_deserialize(g1_serialize(None)) is None
    # random points round trip, both forms
    rnd = random.Random(1)
    for _ in range(5):
        pt = g1_mul(G1_GEN, rnd.randrange(1, R))
        assert g1_from_bytes(g1_to_bytes(pt)) == pt
        assert g1_deserialize(g1_serialize(pt)) == pt


def test_g2_serialization_vectors():
    assert g2_to_bytes(G2_GEN) == G2_GEN_COMPRESSED
    assert g2_from_bytes(G2_GEN_COMPRESSED) == G2_GEN
    assert g2_deserialize(g2_serialize(G2_GEN)) == G2_GEN
    assert g2_from_bytes(g2_to_bytes(None)) is None
    rnd = random.Random(2)
    for _ in range(3):
        pt = g2_mul(G2_GEN, rnd.randrange(1, R))
        assert g2_from_bytes(g2_to_bytes(pt)) == pt
        assert g2_deserialize(g2_serialize(pt)) == pt


def test_fr_bytes_roundtrip():
    rnd = random.Random(3)
    for _ in range(10):
        v = rnd.randrange(R)
        assert field.fr_from_bytes(field.fr_to_bytes(v)) == v
    try:
        field.fr_from_bytes(int(R).to_bytes(32, "big"))
        raise AssertionError("non-canonical scalar accepted")
    except ValueError:
        pass


def test_pairing_bilinearity():
    e_gg = pairing.pairing(G1_GEN, G2_GEN)
    assert not e_gg.is_one()
    a, b = 31415, 27182
    lhs = pairing.pairing(g1_mul(G1_GEN, a), g2_mul(G2_GEN, b))
    rhs = e_gg.pow(a * b % R)
    assert lhs == rhs
    # GT element has order r
    assert e_gg.pow(R).is_one()


def test_pairings_verify_kzg_identity():
    # e(g^(s*k), g2) == e(g^k, g2^s)  -- the shape of the KZG check
    s, k = 123456789, 987654321
    a1 = g1_mul(G1_GEN, s * k % R)
    b1 = g1_mul(G1_GEN, k)
    b2 = g2_mul(G2_GEN, s)
    assert pairing.pairings_verify_single(a1, G2_GEN, b1, b2)
    assert not pairing.pairings_verify_single(g1_mul(G1_GEN, 5), G2_GEN, b1, b2)


def test_ntt_roundtrip_and_lagrange():
    rnd = random.Random(4)
    scale = 4
    n = 1 << scale
    coeffs = [rnd.randrange(R) for _ in range(n)]
    evals = poly.ntt(coeffs, scale)
    back = poly.ntt(evals, scale, inverse=True)
    assert back == coeffs
    # direct evaluation agrees
    w = root_of_unity(scale)
    for k in (0, 1, 7, n - 1):
        assert evals[k] == poly.poly_eval(coeffs, pow(w, k, R))
    # Lagrange property L_i(w^j) = delta_ij (mirrors lagrange_test,
    # reference src/engine/piano.rs:1337-1390)
    for i in (0, 3):
        li = poly.lagrange_poly(i, scale)
        for j in range(n):
            expected = 1 if i == j else 0
            assert poly.poly_eval(li, pow(w, j, R)) == expected


def test_poly_div_linear():
    rnd = random.Random(5)
    coeffs = [rnd.randrange(R) for _ in range(8)]
    a = rnd.randrange(R)
    y = poly.poly_eval(coeffs, a)
    q = poly.poly_div_linear(coeffs, a)
    # check f(x) - y == q(x) * (x - a) at a few points
    for x in (1, 2, 12345):
        lhs = (poly.poly_eval(coeffs, x) - y) % R
        rhs = poly.poly_eval(q, x) * ((x - a) % R) % R
        assert lhs == rhs
