"""Batched G1 kernels vs the exact Python ground truth."""

import jax.numpy as jnp
import numpy as np

from fourier_tpu.constants import R
from fourier_tpu.ops import curve as c
from fourier_tpu.refimpl.curve import G1_GEN, g1_add, g1_mul, g1_neg


def _points(rng, n):
    """Random G1 points with a few edge lanes."""
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    return pts


def test_dbl_add_vs_ground_truth(rng):
    n = 8
    pts = _points(rng, n)
    batch = c.from_affine(c.affine_from_ints(pts))

    doubled = c.jac_to_int_points(c.dbl(batch))
    assert doubled == [g1_add(p, p) for p in pts]

    pts2 = _points(rng, n)
    batch2 = c.from_affine(c.affine_from_ints(pts2))
    summed = c.jac_to_int_points(c.add(batch, batch2))
    assert summed == [g1_add(p, q) for p, q in zip(pts, pts2)]


def test_add_edge_cases(rng):
    p = _points(rng, 1)[0]
    cases_a = [p, None, None, p, p]
    cases_b = [None, p, None, p, g1_neg(p)]
    a = c.from_affine(c.affine_from_ints(cases_a))
    b = c.from_affine(c.affine_from_ints(cases_b))
    got = c.jac_to_int_points(c.add(a, b))
    expect = [g1_add(x, y) for x, y in zip(cases_a, cases_b)]
    assert got == expect
    # identity doubles to identity
    assert c.jac_to_int_points(c.dbl(c.from_affine(c.affine_from_ints([None]))))[0] is None


def test_madd_vs_ground_truth(rng):
    n = 8
    jac_pts = _points(rng, n)
    aff_pts = _points(rng, n)
    # edge lanes: identity jacobian, identity affine, equal, inverse
    jac_pts[0], aff_pts[1] = None, None
    aff_pts[2] = jac_pts[2]
    aff_pts[3] = g1_neg(jac_pts[3])
    a = c.from_affine(c.affine_from_ints(jac_pts))
    b = c.affine_from_ints(aff_pts)
    got = c.jac_to_int_points(c.madd(a, b))
    assert got == [g1_add(x, y) for x, y in zip(jac_pts, aff_pts)]


def test_tree_sum(rng):
    n = 16
    pts = _points(rng, n)
    batch = c.from_affine(c.affine_from_ints(pts))
    total = c.jac_to_int_points(c.tree_sum(batch))  # [1]
    expect = None
    for p in pts:
        expect = g1_add(expect, p)
    assert total[0] == expect


def test_generator_and_neg():
    g = c.generator_jac((1,))
    got = c.jac_to_int_points(g)[0]
    assert got == G1_GEN
    assert c.jac_to_int_points(c.neg(g))[0] == g1_neg(G1_GEN)


def test_batch_inv_matches_fermat(rng):
    """Chunked Montgomery batch inversion == per-lane Fermat inversion,
    including zero lanes and a non-chunk-multiple lane count."""
    import numpy as np

    from fourier_tpu.constants import P
    from fourier_tpu.ops import curve as cv
    from fourier_tpu.ops.field import FP
    from fourier_tpu.ops.limbs import ints_to_vec

    n = 150
    vals = [rng.randrange(1, P) for _ in range(n)]
    vals[4] = 0
    vals[77] = 0
    a = FP.to_mont(jnp.asarray(ints_to_vec(vals, 24)))
    want = np.asarray(FP.inv(a))
    got = np.asarray(cv.batch_inv(a))
    assert np.array_equal(got, want)


def test_to_affine_batched_matches(rng):
    import numpy as np

    from fourier_tpu.constants import R
    from fourier_tpu.ops import curve as cv
    from fourier_tpu.refimpl.curve import G1_GEN, g1_mul

    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(37)]
    pts[5] = None
    j = cv.dbl_fast(cv.from_affine(cv.affine_from_ints(pts)))
    a1, a2 = cv.to_affine(j), cv.to_affine_batched(j)
    for f in ("x", "y", "inf"):
        assert np.array_equal(np.asarray(getattr(a1, f)),
                              np.asarray(getattr(a2, f)))
