"""Native C++ wire marshalling vs the Python reference paths."""

import base64

import numpy as np
import pytest

from fourier_tpu import native
from fourier_tpu.constants import R
from fourier_tpu.ops.limbs import limbs_to_ints
from fourier_tpu.refimpl.field import fr_to_bytes


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_decode_scalars(lib, rng):
    vals = [rng.randrange(R) for _ in range(100)] + [0, 1, R - 1]
    strs = [
        base64.b64encode(fr_to_bytes(v)).decode().rstrip("=") for v in vals
    ]
    limbs = native.decode_scalars_b64(strs, int(R).to_bytes(32, "big"), 16)
    assert limbs_to_ints(limbs) == vals


def test_decode_rejects_noncanonical(lib):
    bad = base64.b64encode(int(R).to_bytes(32, "big")).decode().rstrip("=")
    with pytest.raises(ValueError):
        native.decode_scalars_b64([bad], int(R).to_bytes(32, "big"), 16)


def test_decode_rejects_malformed(lib):
    with pytest.raises(ValueError):
        native.decode_scalars_b64(["@@@@"], int(R).to_bytes(32, "big"), 16)


def test_encode_b64(lib, rng):
    raw = np.frombuffer(
        b"".join(fr_to_bytes(rng.randrange(R)) for _ in range(50)), np.uint8
    ).reshape(50, 32)
    got = native.encode_b64_batch(raw)
    expect = [
        base64.b64encode(raw[i].tobytes()).decode().rstrip("=") for i in range(50)
    ]
    assert got == expect


def test_server_parse_uses_native(lib, rng):
    from fourier_tpu.runtime.server import _parse_poly_limbs

    vals = [rng.randrange(R) for _ in range(10)]
    strs = [
        base64.b64encode(fr_to_bytes(v)).decode().rstrip("=") for v in vals
    ]
    out = _parse_poly_limbs(strs)
    assert limbs_to_ints(out.T) == vals


# -- native pairing kernel (fastpairing.cpp) ---------------------------------


@pytest.fixture(scope="module")
def plib():
    lib = native.get_pairing_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_pairing_value_matches_refimpl(plib, rng):
    from fourier_tpu.refimpl import pairing
    from fourier_tpu.refimpl.curve import G1_GEN, G2_GEN, g1_mul, g2_mul

    a, b = rng.randrange(2, R), rng.randrange(2, R)
    p, q = g1_mul(G1_GEN, a), g2_mul(G2_GEN, b)
    got = native.pairing_value(p, q)
    assert got is not None
    want = pairing.pairing(p, q)
    # 12 Fp coefficients in tower order (Fp12 -> Fp6 -> Fp2 -> Fp)
    flat = []
    for six in (want.c0, want.c1):
        for two in (six.c0, six.c1, six.c2):
            flat.extend([two.c0, two.c1])
    assert got == flat


def test_pairing_fast_vs_reference_path(plib, rng):
    """The fast pairing (twist-Jacobian Miller loop + Frobenius final
    exp) == the in-library reference path (affine Fp12 Miller loop +
    generic pow final exp) bit for bit: the Fp2 line-scale factors must
    vanish in the final exponentiation and the hard-part chain must
    exponentiate by exactly (p^4 - p^2 + 1)/r."""
    import ctypes

    from fourier_tpu.refimpl.curve import G1_GEN, G2_GEN, g1_mul, g2_mul

    p2_be, hard_be = native._exponents()
    plib.fw_pairing_ref.restype = ctypes.c_int
    for _ in range(2):
        p = g1_mul(G1_GEN, rng.randrange(2, R))
        q = g2_mul(G2_GEN, rng.randrange(2, R))
        fast = native.pairing_value(p, q)
        out = (ctypes.c_uint8 * (12 * 48))()
        rc = plib.fw_pairing_ref(native._enc_g1(p), native._enc_g2(q),
                                 p2_be, len(p2_be), hard_be, len(hard_be),
                                 out)
        assert rc == 0
        ref = [int.from_bytes(bytes(out[48 * k:48 * k + 48]), "big")
               for k in range(12)]
        assert fast == ref


def test_pairing_degenerate_inputs(plib):
    """Pins the identity-operand contract of the fast kernel:

    - a G2 identity (all-zero encoding) degenerates the twist Miller
      loop mid-chain: fw_pairing returns -1 and pairing_value None, so
      callers fall back to the exact refimpl path;
    - a G1 identity yields the Fp12 identity (= e(O, Q), correct);
    - fw_pairings_check handles BOTH explicitly (identity pairs
      contribute 1 to the product — the documented `continue`)."""
    from fourier_tpu.refimpl.curve import G1_GEN, G2_GEN

    assert native.pairing_value(G1_GEN, None) is None
    assert native.pairing_value(None, G2_GEN) == [1] + [0] * 11
    assert native.pairings_check([(G1_GEN, None)]) is True
    assert native.pairings_check([(None, G2_GEN)]) is True


def test_pairing_bilinearity_native(plib, rng):
    from fourier_tpu.refimpl.curve import G1_GEN, G2_GEN, g1_mul, g2_mul

    a, b = rng.randrange(2, 2**64), rng.randrange(2, 2**64)
    lhs = native.pairing_value(g1_mul(G1_GEN, a), g2_mul(G2_GEN, b))
    rhs = native.pairing_value(g1_mul(G1_GEN, a * b % R), G2_GEN)
    assert lhs == rhs


def test_pairings_check_accept_reject(plib, rng):
    from fourier_tpu.refimpl.curve import G1_GEN, G2_GEN, g1_mul, g1_neg, g2_mul

    s = rng.randrange(2, R)
    # e(-sG1, G2) * e(G1, sG2) == 1
    assert native.pairings_check(
        [(g1_neg(g1_mul(G1_GEN, s)), G2_GEN), (G1_GEN, g2_mul(G2_GEN, s))]
    ) is True
    assert native.pairings_check(
        [(g1_neg(g1_mul(G1_GEN, s + 1)), G2_GEN), (G1_GEN, g2_mul(G2_GEN, s))]
    ) is False


def test_pairings_check_infinity_lanes(plib):
    from fourier_tpu.refimpl.curve import G1_GEN, G2_GEN

    # e(O, Q) = e(P, O) = 1 -> empty product accepts
    assert native.pairings_check([(None, G2_GEN), (G1_GEN, None)]) is True


def test_verify_single_served_native(plib, rng):
    """pairings_verify_single must agree with the pure-Python path."""
    from fourier_tpu.refimpl import pairing
    from fourier_tpu.refimpl.curve import G1_GEN, G2_GEN, g1_mul, g2_mul

    # KZG-shaped identity: e(s*G1, G2) == e(G1, s*G2)
    s = rng.randrange(2, R)
    a1, a2 = g1_mul(G1_GEN, s), G2_GEN
    b1, b2 = G1_GEN, g2_mul(G2_GEN, s)
    assert pairing.pairings_verify_single(a1, a2, b1, b2)
    assert not pairing.pairings_verify_single(g1_mul(G1_GEN, s + 1), a2, b1, b2)


def test_native_group_ops_parity(rng):
    """C++ G1/G2 group kernels == the exact Python oracle, including
    identity points, zero scalars, and cancellation (P - P)."""
    from fourier_tpu.constants import R
    from fourier_tpu.refimpl.curve import (
        G1_GEN, G2_GEN, g1_msm, g1_msm_fast, g1_mul, g1_mul_fast,
        g1_sub, g1_sub_fast, g2_mul, g2_mul_fast, g2_sub, g2_sub_fast,
    )

    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(4)] + [None]
    ks = [rng.randrange(R) for _ in range(5)]
    ks[1] = 0
    assert g1_msm_fast(pts, ks) == g1_msm(pts, ks)
    assert g1_msm_fast([], []) is None
    assert g1_mul_fast(pts[0], ks[0]) == g1_mul(pts[0], ks[0])
    assert g1_mul_fast(None, 7) is None
    assert g1_sub_fast(pts[0], pts[2]) == g1_sub(pts[0], pts[2])
    assert g1_sub_fast(pts[0], pts[0]) is None

    q1 = g2_mul(G2_GEN, rng.randrange(1, R))
    q2 = g2_mul(G2_GEN, rng.randrange(1, R))
    k = rng.randrange(R)
    assert g2_mul_fast(q1, k) == g2_mul(q1, k)
    assert g2_mul_fast(None, k) is None
    assert g2_mul_fast(q1, 0) is None
    assert g2_sub_fast(q1, q2) == g2_sub(q1, q2)
    assert g2_sub_fast(q1, q1) is None
