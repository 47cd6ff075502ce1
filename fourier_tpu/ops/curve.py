"""Batched G1 arithmetic on TPU: Jacobian coordinates over limb-decomposed Fp.

TPU-native replacement for blst's G1 point ops behind rust-kzg's FsG1
(add/sub/mul/identity semantics used throughout the reference,
src/engine/piano.rs:143-298).  Everything is branchless — exceptional
cases (identity inputs, doubling, inverse pairs) are resolved with
vectorized selects so batches of thousands of point ops fill the VPU.

Representation:
- Jacobian point batch: G1Jac(x, y, z) of uint32[L, ...] Montgomery-form
  Fp limbs; the identity is z == 0 (blst convention: FsG1::default() has
  an all-zero z, reference src/engine/piano.rs:149,1754).
- Affine point batch: G1Aff(x, y, inf) with an explicit infinity mask.

Formulas: a=0 short-Weierstrass `dbl-2009-l` and `add-2007-bl` /
`madd-2007-bl` (Bernstein–Lange EFD), chosen so the doubling needs no
exceptional cases at all and additions degrade to selects.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FP_LIMBS, G1_GENERATOR_X, G1_GENERATOR_Y
from .field import FP
from .limbs import ints_to_vec


class G1Jac(NamedTuple):
    x: jax.Array  # [L, ...]
    y: jax.Array
    z: jax.Array


class G1Aff(NamedTuple):
    x: jax.Array   # [L, ...]
    y: jax.Array
    inf: jax.Array  # bool [...]


def jac_identity(batch_shape) -> G1Jac:
    """All-zero Jacobian point (z=0 => identity), matching FsG1::default()."""
    shape = (FP_LIMBS,) + tuple(batch_shape)
    z = jnp.zeros(shape, jnp.uint32)
    return G1Jac(z, z, z)


def generator_jac(batch_shape=()) -> G1Jac:
    gx = FP.broadcast_const(
        np.asarray(ints_to_vec([G1_GENERATOR_X * FP.mont_r % FP.modulus], FP_LIMBS))[:, 0],
        batch_shape,
    )
    gy = FP.broadcast_const(
        np.asarray(ints_to_vec([G1_GENERATOR_Y * FP.mont_r % FP.modulus], FP_LIMBS))[:, 0],
        batch_shape,
    )
    gz = FP.broadcast_const(FP.one_mont, batch_shape)
    return G1Jac(gx, gy, gz)


def is_identity(p: G1Jac):
    return FP.is_zero(p.z)


@jax.jit
def dbl(p: G1Jac) -> G1Jac:
    """Point doubling; identity maps to identity with no special casing
    (z3 = 2*y*z = 0 whenever z = 0)."""
    f = FP
    a = f.square(p.x)
    b = f.square(p.y)
    c = f.square(b)
    d0 = f.square(f.add(p.x, b))
    d = f.add(t := f.sub(f.sub(d0, a), c), t)  # 2*((x+b)^2 - a - c)
    e = f.add(f.add(a, a), a)                  # 3a
    ff = f.square(e)
    x3 = f.sub(ff, f.add(d, d))
    c8 = f.add(t2 := f.add(c, c), t2)
    c8 = f.add(c8, c8)                         # 8c
    y3 = f.sub(f.mul(e, f.sub(d, x3)), c8)
    z3 = f.mul(f.add(p.y, p.y), p.z)
    return G1Jac(x3, y3, z3)


@jax.jit
def add(p: G1Jac, q: G1Jac) -> G1Jac:
    """Complete Jacobian + Jacobian addition via branchless selects."""
    f = FP
    z1z1 = f.square(p.z)
    z2z2 = f.square(q.z)
    u1 = f.mul(p.x, z2z2)
    u2 = f.mul(q.x, z1z1)
    s1 = f.mul(f.mul(p.y, q.z), z2z2)
    s2 = f.mul(f.mul(q.y, p.z), z1z1)
    h = f.sub(u2, u1)
    i = f.square(f.add(h, h))
    j = f.mul(h, i)
    rr = f.sub(s2, s1)
    rr = f.add(rr, rr)
    v = f.mul(u1, i)
    x3 = f.sub(f.sub(f.square(rr), j), f.add(v, v))
    s1j = f.mul(s1, j)
    y3 = f.sub(f.mul(rr, f.sub(v, x3)), f.add(s1j, s1j))
    z3 = f.mul(f.sub(f.sub(f.square(f.add(p.z, q.z)), z1z1), z2z2), h)
    # h == 0, rr == 0 -> same point: use the doubling result.
    # h == 0, rr != 0 -> inverse pair: z3 = 0 falls out automatically.
    same = f.is_zero(h) & f.is_zero(rr)
    dp = dbl(p)
    x3 = f.select(same, dp.x, x3)
    y3 = f.select(same, dp.y, y3)
    z3 = f.select(same, dp.z, z3)
    p_inf = is_identity(p)
    q_inf = is_identity(q)
    x3 = f.select(p_inf, q.x, f.select(q_inf, p.x, x3))
    y3 = f.select(p_inf, q.y, f.select(q_inf, p.y, y3))
    z3 = f.select(p_inf, q.z, f.select(q_inf, p.z, z3))
    return G1Jac(x3, y3, z3)


@jax.jit
def madd(p: G1Jac, q: G1Aff) -> G1Jac:
    """Mixed addition (q affine, z=1): the MSM workhorse (7M + 4S)."""
    f = FP
    z1z1 = f.square(p.z)
    u2 = f.mul(q.x, z1z1)
    s2 = f.mul(f.mul(q.y, p.z), z1z1)
    h = f.sub(u2, p.x)
    hh = f.square(h)
    i = f.add(hh, hh)
    i = f.add(i, i)
    j = f.mul(h, i)
    rr = f.sub(s2, p.y)
    rr = f.add(rr, rr)
    v = f.mul(p.x, i)
    x3 = f.sub(f.sub(f.square(rr), j), f.add(v, v))
    yj = f.mul(p.y, j)
    y3 = f.sub(f.mul(rr, f.sub(v, x3)), f.add(yj, yj))
    z3 = f.sub(f.sub(f.square(f.add(p.z, h)), z1z1), hh)
    same = f.is_zero(h) & f.is_zero(rr)
    dp = dbl(p)
    x3 = f.select(same, dp.x, x3)
    y3 = f.select(same, dp.y, y3)
    z3 = f.select(same, dp.z, z3)
    # q at infinity -> p unchanged; p at infinity -> q (lifted to z=1)
    p_inf = is_identity(p)
    one = f.broadcast_const(f.one_mont, p.z.shape[1:])
    x3 = f.select(p_inf, q.x, x3)
    y3 = f.select(p_inf, q.y, y3)
    z3 = f.select(p_inf, one, z3)
    x3 = f.select(q.inf, p.x, x3)
    y3 = f.select(q.inf, p.y, y3)
    z3 = f.select(q.inf, p.z, z3)
    return G1Jac(x3, y3, z3)


@jax.jit
def neg(p: G1Jac) -> G1Jac:
    return G1Jac(p.x, FP.neg(p.y), p.z)


@jax.jit
def to_affine(p: G1Jac) -> G1Aff:
    """Batch Jacobian -> affine via batched Fermat inversion of z."""
    f = FP
    zinv = f.inv(p.z)          # 0 -> 0, harmless for identity lanes
    zinv2 = f.square(zinv)
    zinv3 = f.mul(zinv2, zinv)
    return G1Aff(f.mul(p.x, zinv2), f.mul(p.y, zinv3), is_identity(p))


@jax.jit
def from_affine(q: G1Aff) -> G1Jac:
    one = FP.broadcast_const(FP.one_mont, q.x.shape[1:])
    zero = jnp.zeros_like(one)
    return G1Jac(q.x, q.y, FP.select(q.inf, zero, one))


def tree_sum(p: G1Jac) -> G1Jac:
    """Reduce a [L, n] point batch to a single point by pairwise adds
    (log2 n batched additions). n must be a power of two."""
    n = p.x.shape[-1]
    while n > 1:
        half = n // 2
        p = add(
            G1Jac(p.x[..., :half], p.y[..., :half], p.z[..., :half]),
            G1Jac(p.x[..., half:], p.y[..., half:], p.z[..., half:]),
        )
        n = half
    return p


# -- host conversions (test/IO boundary) ------------------------------------

def affine_from_ints(points) -> G1Aff:
    """List of refimpl affine points (or None) -> device batch."""
    xs, ys, infs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(0)
            infs.append(True)
        else:
            xs.append(pt[0] * FP.mont_r % FP.modulus)
            ys.append(pt[1] * FP.mont_r % FP.modulus)
            infs.append(False)
    return G1Aff(
        jnp.asarray(ints_to_vec(xs, FP_LIMBS)),
        jnp.asarray(ints_to_vec(ys, FP_LIMBS)),
        jnp.asarray(np.array(infs)),
    )


def jac_to_int_points(p: G1Jac):
    """Device Jacobian batch -> list of refimpl affine points (or None)."""
    from .limbs import vec_to_ints

    aff = to_affine(p)
    xs = vec_to_ints(FP.from_mont(aff.x))
    ys = vec_to_ints(FP.from_mont(aff.y))
    infs = list(np.asarray(aff.inf).reshape(-1))
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


# -- fast-path dispatch (Pallas kernels on TPU) -----------------------------

def _flatten_batch(a):
    return a.reshape(a.shape[0], -1)


def _unflatten(a, shape):
    return a.reshape(shape)


def madd_fast(p: G1Jac, q: G1Aff) -> G1Jac:
    """madd, routed through the fused Pallas kernel on TPU backends."""
    from . import pallas_curve as pc

    if pc.enabled():
        shape = p.x.shape
        ox, oy, oz = pc.madd_checked(
            _flatten_batch(p.x), _flatten_batch(p.y), _flatten_batch(p.z),
            _flatten_batch(q.x), _flatten_batch(q.y), jnp.atleast_1d(q.inf).reshape(-1),
        )
        return G1Jac(ox.reshape(shape), oy.reshape(shape), oz.reshape(shape))
    return madd(p, q)


def add_fast(p: G1Jac, q: G1Jac) -> G1Jac:
    from . import pallas_curve as pc

    if pc.enabled():
        shape = p.x.shape
        ox, oy, oz = pc.add_checked(
            _flatten_batch(p.x), _flatten_batch(p.y), _flatten_batch(p.z),
            _flatten_batch(q.x), _flatten_batch(q.y), _flatten_batch(q.z),
        )
        return G1Jac(ox.reshape(shape), oy.reshape(shape), oz.reshape(shape))
    return add(p, q)


def dbl_fast(p: G1Jac) -> G1Jac:
    from . import pallas_curve as pc

    if pc.enabled():
        shape = p.x.shape
        ox, oy, oz = pc.dbl(
            _flatten_batch(p.x), _flatten_batch(p.y), _flatten_batch(p.z)
        )
        return G1Jac(ox.reshape(shape), oy.reshape(shape), oz.reshape(shape))
    return dbl(p)


def tree_sum_fast(p: G1Jac) -> G1Jac:
    """tree_sum using the fused add kernel for the wide levels."""
    n = p.x.shape[-1]
    while n > 1:
        half = n // 2
        p = add_fast(
            G1Jac(p.x[..., :half], p.y[..., :half], p.z[..., :half]),
            G1Jac(p.x[..., half:], p.y[..., half:], p.z[..., half:]),
        )
        n = half
    return p
