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


def test_fused_slab_round_bound():
    """Adversarially skewed digits cannot degrade the fused MSM to serial
    adds (the round-1 cliff): after heavy-bucket splitting, the slab
    allocator's round count stays ~ceil(total/capacity) for worst-case
    load shapes at production size."""
    import numpy as np

    from fourier_tpu.ops import msm_fused as mf

    n, c = 1 << 19, 13
    W = -(-mf.SCALAR_BITS // c)
    B = 1 << c
    cap = mf._split_cap(n, B)
    spare = max(mf.BTILE // 8, -(-n // cap))
    Bp = B + spare
    n_tiles = -(-(W * Bp) // mf.BTILE)
    G = mf._grid_size(W * n, n_tiles)
    capacity = (G - n_tiles) * mf.BTILE

    def rounds(per_window_counts):
        counts = jnp.asarray(per_window_counts, jnp.int32)  # [W, B]
        starts = jnp.zeros_like(counts)
        counts_s, _, _ = mf._split_heavy_slots(counts, starts, cap, spare)
        return mf.simulate_rounds(np.asarray(counts_s).reshape(-1),
                                  n_tiles, G)

    # uniform random loads: one round
    rng2 = np.random.default_rng(0)
    uniform = rng2.multinomial(n, np.ones(B) / B, size=W)
    assert rounds(uniform) == 1

    # all scalars equal: one bucket per window swallows everything
    skew = np.zeros((W, B), np.int64)
    skew[:, 1] = n
    optimal = -(-(W * n) // capacity)
    got = rounds(skew)
    assert got <= optimal + 1, (got, optimal)

    # single megabucket
    one = np.zeros((W, B), np.int64)
    one[0, 1] = n
    assert rounds(one) <= -(-n // capacity) + 1


def test_signed_digits_identity(rng):
    """Balanced signed digits reconstruct the scalar exactly, with
    magnitudes bounded by 2^(c-1), for any 256-bit value."""
    import jax.numpy as jnp
    import numpy as np

    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.limbs import ints_to_vec

    for cw in (7, 11, 17, 20):
        W = mf.signed_window_count(cw)
        vals = [rng.randrange(1 << 256) for _ in range(29)] + [
            0, 1, (1 << 256) - 1,
        ]
        sc = jnp.asarray(ints_to_vec(vals, 16))
        mag, neg = mf._signed_digits(sc, cw, W)
        mag = np.asarray(mag)
        neg = np.asarray(neg)
        assert mag.max() <= 1 << (cw - 1), cw
        for i, v in enumerate(vals):
            total = sum(
                (-int(m) if g else int(m)) << (cw * w)
                for w, (m, g) in enumerate(zip(mag[:, i], neg[:, i]))
            )
            assert total == v, (cw, i)
