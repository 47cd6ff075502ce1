"""TPU limb field arithmetic vs the exact Python ground truth.

Device layout is limbs-first: uint32[L, batch...].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourier_tpu.constants import P, R
from fourier_tpu.ops.field import FP, FR
from fourier_tpu.ops.limbs import ints_to_vec, vec_to_ints


@pytest.mark.parametrize("field,modulus", [(FR, R), (FP, P)], ids=["fr", "fp"])
def test_add_sub_mul_vs_ground_truth(field, modulus, rng):
    n = 64
    xs = [rng.randrange(modulus) for _ in range(n)]
    ys = [rng.randrange(modulus) for _ in range(n)]
    # include edge values
    xs[:4] = [0, 1, modulus - 1, modulus - 1]
    ys[:4] = [0, modulus - 1, modulus - 1, 1]
    a = jnp.asarray(ints_to_vec(xs, field.L))
    b = jnp.asarray(ints_to_vec(ys, field.L))

    got_add = vec_to_ints(field.add(a, b))
    got_sub = vec_to_ints(field.sub(a, b))
    assert got_add == [(x + y) % modulus for x, y in zip(xs, ys)]
    assert got_sub == [(x - y) % modulus for x, y in zip(xs, ys)]

    # Montgomery mul: convert, multiply, convert back
    am = field.to_mont(a)
    bm = field.to_mont(b)
    prod = field.from_mont(field.mul(am, bm))
    assert vec_to_ints(prod) == [x * y % modulus for x, y in zip(xs, ys)]

    # round trip
    assert vec_to_ints(field.from_mont(am)) == xs


@pytest.mark.parametrize("field,modulus", [(FR, R), (FP, P)], ids=["fr", "fp"])
def test_inv_and_pow(field, modulus, rng):
    n = 16
    xs = [rng.randrange(1, modulus) for _ in range(n)]
    a = field.to_mont(jnp.asarray(ints_to_vec(xs, field.L)))
    inv = vec_to_ints(field.from_mont(field.inv(a)))
    assert inv == [pow(x, -1, modulus) for x in xs]

    e = 0xDEADBEEF
    powd = vec_to_ints(field.from_mont(field.pow_const(a, e)))
    assert powd == [pow(x, e, modulus) for x in xs]


def test_neg_and_predicates(rng):
    xs = [0, 1, R - 1, rng.randrange(R)]
    a = jnp.asarray(ints_to_vec(xs, FR.L))
    neg = vec_to_ints(FR.neg(a))
    assert neg == [(-x) % R for x in xs]
    assert list(np.asarray(FR.is_zero(a))) == [x == 0 for x in xs]
    assert bool(FR.eq(a[:, 0], a[:, 0]))
    assert not bool(FR.eq(a[:, 0], a[:, 1]))


def test_broadcasting(rng):
    xs = [rng.randrange(R) for _ in range(8)]
    y = rng.randrange(R)
    a = FR.to_mont(jnp.asarray(ints_to_vec(xs, FR.L)))
    b = FR.to_mont(jnp.asarray(ints_to_vec([y], FR.L)))  # [L, 1] broadcasts
    out = vec_to_ints(FR.from_mont(FR.mul(a, b)))
    assert out == [x * y % R for x in xs]


def test_2d_batch(rng):
    xs = [[rng.randrange(R) for _ in range(4)] for _ in range(3)]
    flat = [v for row in xs for v in row]
    a = jnp.asarray(ints_to_vec(flat, FR.L)).reshape(FR.L, 3, 4)
    out = vec_to_ints(FR.add(a, a))
    assert out == [2 * v % R for v in flat]


def test_wide_square_formulation(rng):
    """The symmetric squaring pass (TPU/Pallas formulation) is exact.

    Exercised via a kernel-view field (emb_concat) so the wide path runs
    even on the CPU test backend."""
    import jax.numpy as jnp

    from fourier_tpu.ops.field import packed_consts, with_consts

    for field in (FR, FP):
        fv = with_consts(field, jnp.asarray(packed_consts(field)))
        xs = [rng.randrange(field.modulus) for _ in range(8)] + [0, 1, field.modulus - 1]
        a = field.to_mont(jnp.asarray(ints_to_vec(xs, field.L)))
        sq = type(field).square.__wrapped__(fv, a)
        got = vec_to_ints(field.from_mont(sq))
        assert got == [x * x % field.modulus for x in xs]
        # and the wide general multiply agrees too
        mm = type(field).mul.__wrapped__(fv, a, a)
        assert vec_to_ints(field.from_mont(mm)) == got


def test_lazy_kernel_ops(rng):
    """The lazy [0, 2N) kernel domain (mul_lazy/square_lazy/add_lazy/
    sub_lazy/is_zero_lazy): values stay below 2N, results are exact mod N
    after canonicalize, and both zero representatives are recognized.
    Exercised via a kernel-view field so the wide path runs on CPU."""
    import jax.numpy as jnp
    import numpy as np

    from fourier_tpu.ops.field import packed_consts, with_consts

    import pytest as _pytest

    # The lazy domain needs 4N < 2^(16L): holds for Fp only; Fr must
    # refuse (its kernels stay canonical).
    with _pytest.raises(ValueError):
        with_consts(FR, jnp.asarray(packed_consts(FR))).mul_lazy(
            jnp.zeros((FR.L, 1), jnp.uint32), jnp.zeros((FR.L, 1), jnp.uint32)
        )

    for field in (FP,):
        N = field.modulus
        fv = with_consts(field, jnp.asarray(packed_consts(field)))
        # non-canonical representatives v + N alongside canonical ones
        xs = [rng.randrange(N) for _ in range(6)] + [0, 1, N - 1]
        ys = [rng.randrange(N) for _ in range(6)] + [N - 1, 0, 1]
        a_reps = [x + N if i % 2 else x for i, x in enumerate(xs)]
        b_reps = [y + N if i % 3 == 0 else y for i, y in enumerate(ys)]
        a = jnp.asarray(ints_to_vec(a_reps, field.L))
        b = jnp.asarray(ints_to_vec(b_reps, field.L))

        from fourier_tpu.constants import LIMB_BITS

        # the fused conditional reduction pads the domain by a small
        # constant number of top-limb units (see Field.add_lazy): the
        # top-column false-negative gap admits up to ~2 units of
        # overshoot for add_lazy and ~3 for sub_lazy, so assert the
        # derived 4-unit bound rather than the nominal 1-unit pad
        bound = 2 * N + 4 * (1 << (LIMB_BITS * (field.L - 1)))

        def values(limbs):
            out = vec_to_ints(jnp.asarray(limbs))
            assert all(v < bound for v in out), "left the lazy domain"
            return [v % N for v in out]

        # mul_lazy computes the Montgomery product abR^-1 mod N
        rinv = pow(field.mont_r, -1, N)
        got = values(fv.mul_lazy(a, b))
        assert got == [x * y * rinv % N for x, y in zip(a_reps, b_reps)]
        got = values(fv.square_lazy(a))
        assert got == [x * x * rinv % N for x in a_reps]
        assert values(fv.add_lazy(a, b)) == [
            (x + y) % N for x, y in zip(a_reps, b_reps)
        ]
        assert values(fv.sub_lazy(a, b)) == [
            (x - y) % N for x, y in zip(a_reps, b_reps)
        ]
        # all three zero representatives recognized; nonzero values not
        zeros = jnp.asarray(
            ints_to_vec([0, N, 2 * N, 1, N + 1, N - 1], field.L))
        assert np.asarray(fv.is_zero_lazy(zeros)).tolist() == [
            True, True, True, False, False, False
        ]
        # chained lazy ops stay in the padded domain and exact mod N:
        # (a + b) - b - b + b == a
        chain = fv.add_lazy(fv.sub_lazy(fv.sub_lazy(fv.add_lazy(a, b), b),
                                        b), b)
        assert values(chain) == [x % N for x in a_reps]
        # canonicalize brings any representative below N
        canon = vec_to_ints(field.canonicalize(a))
        assert canon == [x % N for x in a_reps]
