"""MSM kernels vs the naive ground-truth fold (mirrors manual_commit_test,
reference src/engine/piano.rs:1415-1459)."""

import jax.numpy as jnp

from fourier_tpu.constants import R
from fourier_tpu.ops import curve as c
from fourier_tpu.ops import msm as m
from fourier_tpu.ops.limbs import ints_to_vec
from fourier_tpu.refimpl.curve import G1_GEN, g1_msm, g1_mul


def _setup(rng, n, with_edges=True):
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    if with_edges and n >= 4:
        scalars[0] = 0
        scalars[1] = 1
        pts[2] = None  # identity point in the batch
    points = c.affine_from_ints(pts)
    sc = jnp.asarray(ints_to_vec(scalars, 16))
    return pts, scalars, points, sc


def test_msm_pippenger(rng):
    pts, scalars, points, sc = _setup(rng, 64)
    got = c.jac_to_int_points(_single(m.msm(points, sc)))[0]
    assert got == g1_msm(pts, scalars)


def test_msm_pippenger_window_sweep(rng):
    pts, scalars, points, sc = _setup(rng, 32)
    expect = g1_msm(pts, scalars)
    for c_bits in (4, 8):
        got = c.jac_to_int_points(_single(m.msm(points, sc, c_bits)))[0]
        assert got == expect


def test_msm_naive(rng):
    pts, scalars, points, sc = _setup(rng, 8)
    got = c.jac_to_int_points(_single(m.msm_naive(points, sc)))[0]
    assert got == g1_msm(pts, scalars)


def test_msm_all_zero_scalars(rng):
    pts, scalars, points, _ = _setup(rng, 8, with_edges=False)
    sc = jnp.asarray(ints_to_vec([0] * 8, 16))
    got = c.jac_to_int_points(_single(m.msm(points, sc)))[0]
    assert got is None


def test_fixed_base_msm(rng):
    scalars = [0, 1, rng.randrange(R), rng.randrange(R)]
    sc = jnp.asarray(ints_to_vec(scalars, 16))
    got = c.jac_to_int_points(m.fixed_base_msm(G1_GEN, sc, c=8))
    assert got == [g1_mul(G1_GEN, k) for k in scalars]


def _single(p):
    """Wrap a batch-() Jacobian point into a batch-(1,) one."""
    return c.G1Jac(p.x[..., None], p.y[..., None], p.z[..., None])
