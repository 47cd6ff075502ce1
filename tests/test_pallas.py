"""The fused Pallas kernels, exercised via the Pallas interpreter.

Mosaic cannot lower on CPU, but `pallas_call(interpret=True)` executes
the identical kernel bodies with plain jax ops — so the TPU fast path
(including the incomplete-add collision-flag contract and the `lax.cond`
exact-fallback wrappers in ops.curve) is covered in the CPU suite.

The reference needs no analog: its blst point ops are complete by
construction.  The collision-flagged incomplete addition is this build's
own optimization, so the adversarial lanes here (forced same-point
collisions, identities, inverse pairs, non-TILE-divisible batches) are
the tests that guard it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourier_tpu.constants import R
from fourier_tpu.ops import curve as cv
from fourier_tpu.ops import pallas_curve as pc
from fourier_tpu.refimpl.curve import G1_GEN, g1_add, g1_mul, g1_neg


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """Route ops through the Pallas interpreter, restored per-test."""
    monkeypatch.setenv("FOURIER_PALLAS", "1")
    monkeypatch.setenv("FOURIER_PALLAS_INTERPRET", "1")
    # small tile => multi-step grids + padding at small n, fast interpret
    monkeypatch.setattr(pc, "TILE", 128)


# 160 lanes = 2 grid steps of TILE=128 with 96 padded lanes: covers the
# multi-step grid and the pad/slice path in one compile per kernel.
N = 160
COLLIDE, INVERSE, P_INF, Q_INF, BOTH_INF = 10, 11, 12, 13, 14


def _lane_plan(rng):
    """(jacobian operands, affine/second operands) with adversarial lanes."""
    ps = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(N)]
    qs = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(N)]
    qs[COLLIDE] = ps[COLLIDE]          # same point -> doubling path / flag
    qs[INVERSE] = g1_neg(ps[INVERSE])  # h == 0, rr != 0 -> identity result
    ps[P_INF] = None
    qs[Q_INF] = None
    ps[BOTH_INF] = qs[BOTH_INF] = None
    return ps, qs


def test_madd_kernels(rng):
    ps, qs = _lane_plan(rng)
    p = cv.from_affine(cv.affine_from_ints(ps))
    q = cv.affine_from_ints(qs)
    expect = [g1_add(a, b) for a, b in zip(ps, qs)]

    # complete kernel: exact on every lane including the collision
    ox, oy, oz = jax.jit(pc.madd)(p.x, p.y, p.z, q.x, q.y, q.inf)
    assert cv.jac_to_int_points(cv.G1Jac(ox, oy, oz)) == expect

    # incomplete kernel: must flag exactly the collision lane
    ox, oy, oz, fl = jax.jit(pc.madd_inc)(p.x, p.y, p.z, q.x, q.y, q.inf)
    flags = np.asarray(fl).reshape(-1)
    assert flags[COLLIDE] == 1 and flags.sum() == 1
    got = cv.jac_to_int_points(cv.G1Jac(ox, oy, oz))
    for lane in range(N):
        if lane != COLLIDE:
            assert got[lane] == expect[lane], f"lane {lane}"

    # checked wrapper: lax.cond fallback restores exactness everywhere
    ox, oy, oz = jax.jit(pc.madd_checked)(p.x, p.y, p.z, q.x, q.y, q.inf)
    assert cv.jac_to_int_points(cv.G1Jac(ox, oy, oz)) == expect


def test_add_kernels(rng):
    ps, qs = _lane_plan(rng)
    p = cv.from_affine(cv.affine_from_ints(ps))
    q = cv.from_affine(cv.affine_from_ints(qs))
    expect = [g1_add(a, b) for a, b in zip(ps, qs)]

    ox, oy, oz = jax.jit(pc.add)(p.x, p.y, p.z, q.x, q.y, q.z)
    assert cv.jac_to_int_points(cv.G1Jac(ox, oy, oz)) == expect

    ox, oy, oz, fl = jax.jit(pc.add_inc)(p.x, p.y, p.z, q.x, q.y, q.z)
    flags = np.asarray(fl).reshape(-1)
    assert flags[COLLIDE] == 1 and flags.sum() == 1

    ox, oy, oz = jax.jit(pc.add_checked)(p.x, p.y, p.z, q.x, q.y, q.z)
    assert cv.jac_to_int_points(cv.G1Jac(ox, oy, oz)) == expect


def test_dbl_kernel(rng):
    ps = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(N)]
    ps[0] = None  # identity doubles to identity
    p = cv.from_affine(cv.affine_from_ints(ps))
    ox, oy, oz = jax.jit(pc.dbl)(p.x, p.y, p.z)
    got = cv.jac_to_int_points(cv.G1Jac(ox, oy, oz))
    assert got == [g1_add(a, a) for a in ps]


def test_curve_routing_with_collision_fallback(rng):
    """madd_fast/add_fast route through the incomplete kernels when Pallas
    is on; a collision lane must trigger the complete-formula cond branch
    and still produce the exact result (curve.py's FP_COMPACT path)."""
    ps, qs = _lane_plan(rng)
    p = cv.from_affine(cv.affine_from_ints(ps))
    qa = cv.affine_from_ints(qs)
    qj = cv.from_affine(qa)
    expect = [g1_add(a, b) for a, b in zip(ps, qs)]

    got = cv.jac_to_int_points(jax.jit(cv.madd_fast)(p, qa))
    assert got == expect
    got = cv.jac_to_int_points(jax.jit(cv.add_fast)(p, qj))
    assert got == expect
    got = cv.jac_to_int_points(jax.jit(cv.dbl_fast)(p))
    assert got == [g1_add(a, a) for a in ps]


def test_horner_2k_kernel(rng):
    """sum_k 2^k * sum_r T[k, r] vs ground truth, identity lanes included."""
    K, width = 6, 4
    terms = [
        [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(width)]
        for _ in range(K)
    ]
    terms[2][1] = None  # identity lane inside a term
    flat = [pt for row in terms for pt in row]
    jac = cv.from_affine(cv.affine_from_ints(flat))  # [L, K*width]

    ox, oy, oz = pc.horner_2k(jac.x, jac.y, jac.z, width=width)
    res = cv.fold_small(cv.G1Jac(ox, oy, oz))
    got = cv.jac_to_int_points(res)[0]

    expect = None
    for k in range(K):
        row = None
        for pt in terms[k]:
            row = g1_add(row, pt)
        expect = g1_add(expect, g1_mul(row, 1 << k))
    assert got == expect


def test_msm_fused_quad_pad(rng):
    """n not a multiple of the gather quad (ops.msm_fused._quadify pads
    the packed table): the padded rows must never leak into the sum."""
    from fourier_tpu.constants import FR_LIMBS
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.limbs import ints_to_vec

    n = 13
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    points = cv.affine_from_ints(pts)
    sc = jnp.asarray(ints_to_vec(scalars, FR_LIMBS))

    import unittest.mock
    with unittest.mock.patch.object(mf, "BTILE", 128):
        want = cv.jac_to_int_points(msm_mod.msm_naive(points, sc))[0]
        got = cv.jac_to_int_points(mf.msm_fused(points, sc, 5))[0]
        assert got == want


def test_msm_fused_slab(rng):
    """The fused-slab MSM (ops.msm_fused) vs the naive oracle, covering
    the adversarial lanes of its round loop: an infinity point, a zero
    scalar, a duplicated point with equal scalar (same bucket -> forced
    same-point collision -> exact-fallback round), and the all-equal
    scalars skew that spills into multiple slab rounds."""
    from fourier_tpu.constants import FR_LIMBS
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.limbs import ints_to_vec

    n = 64
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    pts[5] = None                     # infinity lane
    pts[9] = pts[8]                   # duplicate point ...
    scalars = [rng.randrange(R >> 192) << rng.randrange(150) for _ in range(n)]
    scalars[3] = 0                    # zero scalar
    scalars[9] = scalars[8]           # ... same scalar -> bucket collision
    points = cv.affine_from_ints(pts)
    sc = jnp.asarray(ints_to_vec(scalars, FR_LIMBS))

    import unittest.mock
    with unittest.mock.patch.object(mf, "BTILE", 128):
        want = cv.jac_to_int_points(msm_mod.msm_naive(points, sc))[0]
        got = cv.jac_to_int_points(mf.msm_fused(points, sc, 6))[0]
        assert got == want

        # all-equal scalars: one bucket per window swallows everything,
        # exceeding the slab SLACK -> multi-round while_loop path
        eq = jnp.asarray(ints_to_vec([12345678901234567890] * n, FR_LIMBS))
        want_eq = cv.jac_to_int_points(msm_mod.msm_naive(points, eq))[0]
        got_eq = cv.jac_to_int_points(mf.msm_fused(points, eq, 6))[0]
        assert got_eq == want_eq


def test_msm_fused_bgmw(rng):
    """The shared-bucket fixed-base fused MSM (ops.msm_fused.msm_fused_bgmw
    over a bgmw_expand table) vs the naive oracle, with identity points,
    zero scalars, and the duplicated-point collision lane."""
    from fourier_tpu.constants import FR_LIMBS
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.limbs import ints_to_vec

    n = 32
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    pts[5] = None
    pts[9] = pts[8]
    scalars = [rng.randrange(R) for _ in range(n)]
    scalars[3] = 0
    scalars[9] = scalars[8]
    points = cv.affine_from_ints(pts)
    sc = jnp.asarray(ints_to_vec(scalars, FR_LIMBS))

    c = 7
    table = msm_mod.bgmw_expand(points, c)
    packed = mf.pack_points(table)

    import unittest.mock
    with unittest.mock.patch.object(mf, "BTILE", 128):
        want = cv.jac_to_int_points(msm_mod.msm_naive(points, sc))[0]
        got = cv.jac_to_int_points(
            mf.msm_fused_bgmw(packed, table.inf, sc, c)
        )[0]
        assert got == want


def test_scan_sum_and_fold(rng):
    """tree_sum_fast's scan stages + fold_small vs a direct sum, on a
    width that is not a multiple of any stage (padding with identities)."""
    n = 37
    ps = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    ps[5] = None
    batch = cv.from_affine(cv.affine_from_ints(ps))
    out = cv.tree_sum_fast(batch, stop=32)
    total = cv.jac_to_int_points(cv.fold_small(out))[0]
    expect = None
    for a in ps:
        expect = g1_add(expect, a)
    assert total == expect
