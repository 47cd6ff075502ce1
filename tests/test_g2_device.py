"""Device G2 ops (ops/fp2.py) vs the exact refimpl oracle.

The reference's FsG2 surface (blst G2 add/mul used on the verify side,
reference src/engine/piano.rs:344-347,402-410) re-expressed as the
field-generic Jacobian formulas over the device Fp2 adapter."""

import random

import jax.numpy as jnp
import pytest

from fourier_tpu.constants import FR_LIMBS, R
from fourier_tpu.ops import fp2 as f2
from fourier_tpu.ops.limbs import ints_to_vec
from fourier_tpu.refimpl.curve import G2_GEN, g2_add, g2_mul, g2_neg
from fourier_tpu.refimpl.tower import Fp2


@pytest.fixture
def rng():
    return random.Random(0xF2)


def _as_ints(pt):
    if pt is None:
        return None
    return ((pt[0].c0, pt[0].c1), (pt[1].c0, pt[1].c1))


def test_g2_dbl_add_parity(rng):
    ks = [rng.randrange(1, R) for _ in range(3)]
    pts = [g2_mul(G2_GEN, k) for k in ks]
    batch = f2.g2_affine_from_ints(pts)
    jac = f2.G1Jac(batch.x, batch.y,
                   f2.FP2.select(batch.inf,
                                 jnp.zeros_like(batch.x),
                                 f2.FP2.broadcast_const(
                                     f2.FP.one_mont, batch.x.shape[1:])))

    got_dbl = f2.g2_jac_to_int_points(f2.g2_dbl(jac))
    want_dbl = [_as_ints(g2_add(p, p)) for p in pts]
    assert got_dbl == want_dbl

    # pairwise adds: rotate the batch against itself
    rot = f2.G1Jac(jnp.roll(jac.x, 1, axis=-1), jnp.roll(jac.y, 1, axis=-1),
                   jnp.roll(jac.z, 1, axis=-1))
    got_add = f2.g2_jac_to_int_points(f2.g2_add(jac, rot))
    want_add = [_as_ints(g2_add(p, q))
                for p, q in zip(pts, pts[-1:] + pts[:-1])]
    assert got_add == want_add


def test_g2_add_edge_cases(rng):
    k = rng.randrange(1, R)
    p = g2_mul(G2_GEN, k)
    batch = f2.g2_affine_from_ints([p, p, None])
    one = f2.FP2.broadcast_const(f2.FP.one_mont, batch.x.shape[1:])
    z = f2.FP2.select(batch.inf, jnp.zeros_like(batch.x), one)
    jac = f2.G1Jac(batch.x, batch.y, z)

    # q = [-p, p, p]: same-point doubling, inverse-pair cancellation,
    # and identity-plus-point in one batch
    q_pts = [g2_neg(p), p, p]
    qb = f2.g2_affine_from_ints(q_pts)
    qz = f2.FP2.select(qb.inf, jnp.zeros_like(qb.x), one)
    qjac = f2.G1Jac(qb.x, qb.y, qz)

    got = f2.g2_jac_to_int_points(f2.g2_add(jac, qjac))
    want = [None, _as_ints(g2_add(p, p)), _as_ints(p)]
    assert got == want


def test_g2_scalar_mul_batched(rng):
    ks = [rng.randrange(R) for _ in range(3)]
    ks[1] = 0
    gen = f2.g2_generator_jac((len(ks),))
    sc = jnp.asarray(ints_to_vec(ks, FR_LIMBS))
    got = f2.g2_jac_to_int_points(f2.g2_scalar_mul(gen, sc))
    want = [_as_ints(g2_mul(G2_GEN, k)) for k in ks]
    assert got == want


def test_fp2_field_algebra(rng):
    from fourier_tpu.constants import P

    a0, a1 = rng.randrange(P), rng.randrange(P)
    b0, b1 = rng.randrange(P), rng.randrange(P)

    def enc(c0, c1):
        return jnp.asarray(ints_to_vec(
            [c0 * f2.FP.mont_r % P, c1 * f2.FP.mont_r % P], 24
        )).reshape(24, 2, 1)

    def dec(arr):
        from fourier_tpu.ops.limbs import vec_to_ints

        vals = vec_to_ints(f2.FP.from_mont(arr.reshape(24, -1)))
        return vals[0], vals[1]

    a, b = enc(a0, a1), enc(b0, b1)
    ra, rb = Fp2(a0, a1), Fp2(b0, b1)
    assert dec(f2.FP2.mul(a, b)) == ((ra * rb).c0, (ra * rb).c1)
    assert dec(f2.FP2.square(a)) == ((ra * ra).c0, (ra * ra).c1)
    inv = f2.FP2.inv(a)
    prod = f2.FP2.mul(a, inv)
    assert dec(prod) == (1, 0)
