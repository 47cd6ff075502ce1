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


# A Field view that always uses the rolled (fori_loop) formulation: the
# complete-formula fallback branches below are traced into `lax.cond`
# alternates that execute only on collision lanes (cryptographically
# unreachable for honest inputs) — with the wide unrolled formulation
# they would bloat the compiled executable by tens of MB, which on a
# tunneled TPU directly costs minutes of program-upload time.
import copy as _copy

FP_COMPACT = _copy.copy(FP)
FP_COMPACT.force_rolled = True


@partial(jax.jit, static_argnums=0)
def _dbl_impl(f, p: G1Jac) -> G1Jac:
    """Point doubling; identity maps to identity with no special casing
    (z3 = 2*y*z = 0 whenever z = 0)."""
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


def dbl(p: G1Jac) -> G1Jac:
    return _dbl_impl(FP, p)


@partial(jax.jit, static_argnums=0)
def _add_impl(f, p: G1Jac, q: G1Jac) -> G1Jac:
    """Complete Jacobian + Jacobian addition via branchless selects."""
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
    dp = _dbl_impl(f, p)
    x3 = f.select(same, dp.x, x3)
    y3 = f.select(same, dp.y, y3)
    z3 = f.select(same, dp.z, z3)
    p_inf = f.is_zero(p.z)
    q_inf = f.is_zero(q.z)
    x3 = f.select(p_inf, q.x, f.select(q_inf, p.x, x3))
    y3 = f.select(p_inf, q.y, f.select(q_inf, p.y, y3))
    z3 = f.select(p_inf, q.z, f.select(q_inf, p.z, z3))
    return G1Jac(x3, y3, z3)


def add(p: G1Jac, q: G1Jac) -> G1Jac:
    return _add_impl(FP, p, q)


@partial(jax.jit, static_argnums=0)
def _madd_impl(f, p: G1Jac, q: G1Aff) -> G1Jac:
    """Mixed addition (q affine, z=1): the MSM workhorse (7M + 4S)."""
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
    dp = _dbl_impl(f, p)
    x3 = f.select(same, dp.x, x3)
    y3 = f.select(same, dp.y, y3)
    z3 = f.select(same, dp.z, z3)
    # q at infinity -> p unchanged; p at infinity -> q (lifted to z=1)
    p_inf = f.is_zero(p.z)
    one = f.broadcast_const(f.one_mont, p.z.shape[1:])
    x3 = f.select(p_inf, q.x, x3)
    y3 = f.select(p_inf, q.y, y3)
    z3 = f.select(p_inf, one, z3)
    x3 = f.select(q.inf, p.x, x3)
    y3 = f.select(q.inf, p.y, y3)
    z3 = f.select(q.inf, p.z, z3)
    return G1Jac(x3, y3, z3)


def madd(p: G1Jac, q: G1Aff) -> G1Jac:
    return _madd_impl(FP, p, q)


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


@partial(jax.jit, static_argnums=(1,))
def batch_inv(z, chunk: int = 64):
    """Montgomery batch inversion over the last axis (Field.batch_inv
    on Fp); 0 maps to 0.  Used by multi-million-lane affine conversions
    (BGMW table building)."""
    return FP.batch_inv(z, chunk)


@jax.jit
def to_affine_batched(p: G1Jac) -> G1Aff:
    """to_affine with chunked batch inversion: the form for multi-million
    lane conversions (BGMW window tables, bench point sets)."""
    f = FP
    zinv = batch_inv(p.z)
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


# Narrow batches are padded up to one Pallas tile: a one-tile kernel launch
# is ~30us while the unfused jnp chain is ~1ms of HBM round-trips, so the
# fused path wins at every width.  What IS expensive is each *distinct
# shape* (seconds of trace+Mosaic-lowering per instantiation) — callers
# keep the set of shapes small and reuse them (see scan_sum).
_PALLAS_MIN_WIDTH = 1


def _batch_width(a) -> int:
    n = 1
    for d in a.shape[1:]:
        n *= d
    return n


def madd_fast(p: G1Jac, q: G1Aff) -> G1Jac:
    """madd, routed through the fused Pallas kernel on TPU backends.

    The Pallas kernel is the *incomplete* (collision-flagged) variant: the
    doubling path is omitted (~35% fewer ops) and any same-point collision
    lane raises a flag; `lax.cond` re-runs the cheap-to-trace jnp complete
    formula in that (cryptographically unreachable for honest SRS inputs,
    but exactly handled) case.
    """
    from . import pallas_curve as pc

    if pc.enabled() and _batch_width(p.x) >= _PALLAS_MIN_WIDTH:
        shape = p.x.shape
        ox, oy, oz, fl = pc.madd_inc(
            _flatten_batch(p.x), _flatten_batch(p.y), _flatten_batch(p.z),
            _flatten_batch(q.x), _flatten_batch(q.y),
            jnp.atleast_1d(q.inf).reshape(-1),
        )

        def slow(_):
            r = _madd_impl(FP_COMPACT, p, q)
            return _flatten_batch(r.x), _flatten_batch(r.y), _flatten_batch(r.z)

        ox, oy, oz = jax.lax.cond(
            jnp.any(fl > 0), slow, lambda _: (ox, oy, oz), operand=None
        )
        return G1Jac(ox.reshape(shape), oy.reshape(shape), oz.reshape(shape))
    return madd(p, q)


def add_fast(p: G1Jac, q: G1Jac) -> G1Jac:
    from . import pallas_curve as pc

    if pc.enabled() and _batch_width(p.x) >= _PALLAS_MIN_WIDTH:
        shape = p.x.shape
        ox, oy, oz, fl = pc.add_inc(
            _flatten_batch(p.x), _flatten_batch(p.y), _flatten_batch(p.z),
            _flatten_batch(q.x), _flatten_batch(q.y), _flatten_batch(q.z),
        )

        def slow(_):
            r = _add_impl(FP_COMPACT, p, q)
            return _flatten_batch(r.x), _flatten_batch(r.y), _flatten_batch(r.z)

        ox, oy, oz = jax.lax.cond(
            jnp.any(fl > 0), slow, lambda _: (ox, oy, oz), operand=None
        )
        return G1Jac(ox.reshape(shape), oy.reshape(shape), oz.reshape(shape))
    return add(p, q)


def dbl_fast(p: G1Jac) -> G1Jac:
    from . import pallas_curve as pc

    if pc.enabled() and _batch_width(p.x) >= _PALLAS_MIN_WIDTH:
        shape = p.x.shape
        ox, oy, oz = pc.dbl(
            _flatten_batch(p.x), _flatten_batch(p.y), _flatten_batch(p.z)
        )
        return G1Jac(ox.reshape(shape), oy.reshape(shape), oz.reshape(shape))
    return dbl(p)


def _pad_last(p: G1Jac, pad: int) -> G1Jac:
    """Append `pad` identity lanes along the last axis."""
    shape = p.x.shape[:-1] + (pad,)
    z = jnp.zeros(shape, jnp.uint32)
    return G1Jac(
        jnp.concatenate([p.x, z], axis=-1),
        jnp.concatenate([p.y, z], axis=-1),
        jnp.concatenate([p.z, z], axis=-1),
    )


def scan_sum(p: G1Jac, width: int) -> G1Jac:
    """Reduce the last axis [..., W] -> [..., width] by scan-accumulating
    W/width contiguous chunks.

    Unlike a halving tree (log W *distinct shapes*, each re-instantiating
    the fused Pallas kernels at seconds of trace+Mosaic-lowering cost
    apiece), this folds the axis as [S, ..., width] under `lax.scan`, so
    the point add is traced and lowered exactly once.  W is padded up to
    a multiple of `width` with identity lanes.
    """
    n = p.x.shape[-1]
    if n <= width:
        return p
    pad = (-n) % width
    if pad:
        p = _pad_last(p, pad)
        n += pad
    steps = n // width

    def reshape(a):
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (steps, width)), -2, 0)

    sx, sy, sz = reshape(p.x), reshape(p.y), reshape(p.z)
    init = G1Jac(
        jnp.zeros(sx.shape[1:], jnp.uint32),
        jnp.zeros(sx.shape[1:], jnp.uint32),
        jnp.zeros(sx.shape[1:], jnp.uint32),
    )

    def body(acc, chunk):
        return add_fast(acc, G1Jac(*chunk)), None

    acc, _ = jax.lax.scan(body, init, (sx, sy, sz))
    return acc


def tree_reduce_last(p: G1Jac, to: int = 1) -> G1Jac:
    """Halving-tree reduction of the last axis down to `to` lanes with the
    fused add: log2(n/to) launches, every round at maximum batch width.

    scan_sum (above) optimizes for ONE kernel shape at the cost of a long
    sequential chain of narrow steps; on the MSM combine path those
    chains measured ~8x slower than their point-add count (rows+cols of
    the factorized bucket reduction: 49 ms for ~6 ms of adds —
    tools/PROFILE_MSM.log `combine_budget_c16`).  This variant pays a
    handful of distinct (compile-cached) kernel shapes instead and is
    the combine-path default since round 5.
    """
    n = p.x.shape[-1]
    if n <= to:
        return p
    # pad with identity lanes up to to * 2^k so every halving is exact
    k = (-(-n // to) - 1).bit_length()
    target = to << k
    if target != n:
        p = _pad_last(p, target - n)
        n = target
    while n > to:
        half = n // 2
        p = add_fast(
            G1Jac(p.x[..., :half], p.y[..., :half], p.z[..., :half]),
            G1Jac(p.x[..., half:], p.y[..., half:], p.z[..., half:]),
        )
        n = half
    return p


def tree_reduce_axis(p: G1Jac, axis: int) -> G1Jac:
    """Halving-tree reduction over an arbitrary (usually non-minor) axis
    by slicing, with the fused add: no transposed copy.  The moveaxis
    form of this reduction measured 9.5 ms for a log2(8)-round combine
    whose adds are worth ~2 ms — the [.., K, big] -> [.., big, K] minor
    transpose dominated.  The axis is REMOVED from the result shape."""
    if axis < 0:
        axis += p.x.ndim
    n = p.x.shape[axis]
    pow2 = 1 << (n - 1).bit_length() if n > 1 else 1
    if pow2 != n:
        pad_shape = list(p.x.shape)
        pad_shape[axis] = pow2 - n
        z = jnp.zeros(pad_shape, jnp.uint32)
        p = G1Jac(
            jnp.concatenate([p.x, z], axis=axis),
            jnp.concatenate([p.y, z], axis=axis),
            jnp.concatenate([p.z, z], axis=axis),
        )
        n = pow2

    def sl(a, lo, hi):
        return jax.lax.slice_in_dim(a, lo, hi, axis=axis)

    while n > 1:
        half = n // 2
        p = add_fast(
            G1Jac(sl(p.x, 0, half), sl(p.y, 0, half), sl(p.z, 0, half)),
            G1Jac(sl(p.x, half, n), sl(p.y, half, n), sl(p.z, half, n)),
        )
        n = half
    return G1Jac(
        jnp.squeeze(p.x, axis=axis),
        jnp.squeeze(p.y, axis=axis),
        jnp.squeeze(p.z, axis=axis),
    )


def tree_sum_fast(p: G1Jac, stop: int = 1) -> G1Jac:
    """Reduce the last axis of a [..., n] point batch to [..., stop].

    scan_sum stages (1024/32/1, cut at `stop`): each is one fused-add
    instantiation at a fixed shape, versus log2(n) distinct shapes for a
    halving tree.  Callers that can consume a residual lane axis pass
    stop=32 and fold it later (fold_small) — the 32->1 stage is the one
    with no batch parallelism left.
    """
    for width in (1024, 32, 1):
        if width >= stop:
            p = scan_sum(p, width)
    return p


def fold_small(p: G1Jac) -> G1Jac:
    """Halving-tree reduce of a small last axis (<= ~32 lanes) to [..., 1]
    using the compact complete-add formulas: correctness path, off the
    hot loop, traced small."""
    n = p.x.shape[-1]
    pow2 = 1 << (n - 1).bit_length() if n > 1 else 1
    if pow2 != n:
        p = _pad_last(p, pow2 - n)
        n = pow2
    while n > 1:
        half = n // 2
        p = _add_impl(
            FP_COMPACT,
            G1Jac(p.x[..., :half], p.y[..., :half], p.z[..., :half]),
            G1Jac(p.x[..., half:], p.y[..., half:], p.z[..., half:]),
        )
        n = half
    return p
