"""TPU limb field arithmetic vs the exact Python ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourier_tpu.constants import P, R
from fourier_tpu.ops.field import FP, FR
from fourier_tpu.ops.limbs import ints_to_limbs, limbs_to_ints


@pytest.mark.parametrize("field,modulus", [(FR, R), (FP, P)], ids=["fr", "fp"])
def test_add_sub_mul_vs_ground_truth(field, modulus, rng):
    n = 64
    xs = [rng.randrange(modulus) for _ in range(n)]
    ys = [rng.randrange(modulus) for _ in range(n)]
    # include edge values
    xs[:4] = [0, 1, modulus - 1, modulus - 1]
    ys[:4] = [0, modulus - 1, modulus - 1, 1]
    a = jnp.asarray(ints_to_limbs(xs, field.L))
    b = jnp.asarray(ints_to_limbs(ys, field.L))

    got_add = limbs_to_ints(jax.jit(field.add)(a, b))
    got_sub = limbs_to_ints(jax.jit(field.sub)(a, b))
    assert got_add == [(x + y) % modulus for x, y in zip(xs, ys)]
    assert got_sub == [(x - y) % modulus for x, y in zip(xs, ys)]

    # Montgomery mul: convert, multiply, convert back
    am = field.to_mont(a)
    bm = field.to_mont(b)
    prod = field.from_mont(jax.jit(field.mul)(am, bm))
    assert limbs_to_ints(prod) == [x * y % modulus for x, y in zip(xs, ys)]

    # round trip
    assert limbs_to_ints(field.from_mont(am)) == xs


@pytest.mark.parametrize("field,modulus", [(FR, R), (FP, P)], ids=["fr", "fp"])
def test_inv_and_pow(field, modulus, rng):
    n = 16
    xs = [rng.randrange(1, modulus) for _ in range(n)]
    a = field.to_mont(jnp.asarray(ints_to_limbs(xs, field.L)))
    inv = limbs_to_ints(field.from_mont(jax.jit(field.inv)(a)))
    assert inv == [pow(x, -1, modulus) for x in xs]

    e = 0xDEADBEEF
    powd = limbs_to_ints(field.from_mont(field.pow_const(a, e)))
    assert powd == [pow(x, e, modulus) for x in xs]


def test_neg_and_predicates(rng):
    xs = [0, 1, R - 1, rng.randrange(R)]
    a = jnp.asarray(ints_to_limbs(xs, FR.L))
    neg = limbs_to_ints(FR.neg(a))
    assert neg == [(-x) % R for x in xs]
    assert list(np.asarray(FR.is_zero(a))) == [x == 0 for x in xs]
    assert bool(FR.eq(a[0], a[0]))
    assert not bool(FR.eq(a[0], a[1]))


def test_broadcasting(rng):
    xs = [rng.randrange(R) for _ in range(8)]
    y = rng.randrange(R)
    a = FR.to_mont(jnp.asarray(ints_to_limbs(xs, FR.L)))
    b = FR.to_mont(jnp.asarray(ints_to_limbs([y], FR.L))[0])
    out = limbs_to_ints(FR.from_mont(FR.mul(a, b)))
    assert out == [x * y % R for x in xs]
