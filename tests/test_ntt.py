"""NTT kernel vs the exact Python ground truth."""

import jax.numpy as jnp
import pytest

from fourier_tpu.constants import R, root_of_unity
from fourier_tpu.ops.field import FR
from fourier_tpu.ops.limbs import ints_to_vec, vec_to_ints
from fourier_tpu.ops.ntt import get_domain
from fourier_tpu.refimpl import poly as refpoly


@pytest.mark.parametrize("scale", [0, 1, 2, 3, 6])
def test_ntt_matches_ground_truth(scale, rng):
    n = 1 << scale
    coeffs = [rng.randrange(R) for _ in range(n)]
    dom = get_domain(scale)
    x = FR.to_mont(jnp.asarray(ints_to_vec(coeffs, FR.L)))

    fwd = vec_to_ints(FR.from_mont(dom.ntt(x)))
    assert fwd == refpoly.ntt(coeffs, scale)

    inv = vec_to_ints(FR.from_mont(dom.ntt(x, inverse=True)))
    assert inv == refpoly.ntt(coeffs, scale, inverse=True)


def test_ntt_roundtrip(rng):
    scale = 5
    n = 1 << scale
    coeffs = [rng.randrange(R) for _ in range(n)]
    dom = get_domain(scale)
    x = FR.to_mont(jnp.asarray(ints_to_vec(coeffs, FR.L)))
    back = vec_to_ints(FR.from_mont(dom.ntt(dom.ntt(x), inverse=True)))
    assert back == coeffs


def test_ntt_batched(rng):
    """Rows transform independently (the per-worker FFT shape)."""
    scale, rows = 3, 4
    n = 1 << scale
    data = [[rng.randrange(R) for _ in range(n)] for _ in range(rows)]
    dom = get_domain(scale)
    flat = [v for row in data for v in row]
    x = FR.to_mont(jnp.asarray(ints_to_vec(flat, FR.L)).reshape(FR.L, rows, n))
    out = FR.from_mont(dom.ntt(x))
    got = vec_to_ints(out)
    expect = [v for row in data for v in refpoly.ntt(row, scale)]
    assert got == expect


def test_ntt_lagrange_identity(rng):
    """IFFT of a unit vector gives Lagrange coefficients: L_i(w^j) = delta_ij
    (mirrors lagrange_test, reference src/engine/piano.rs:1337-1390)."""
    scale = 4
    n = 1 << scale
    i = 5
    unit = [0] * n
    unit[i] = 1
    dom = get_domain(scale)
    x = FR.to_mont(jnp.asarray(ints_to_vec(unit, FR.L)))
    li = vec_to_ints(FR.from_mont(dom.ntt(x, inverse=True)))
    w = root_of_unity(scale)
    for j in range(n):
        assert refpoly.poly_eval(li, pow(w, j, R)) == (1 if i == j else 0)
