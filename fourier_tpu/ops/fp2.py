"""Device Fp2 and G2: the quadratic-extension twin of ops/curve.py.

The reference's FsG2 lives in blst C/assembly and is used on the verify
side only (g2 tau points: reference src/engine/piano.rs:344-347,402-410
and the 96/192-byte serde at piano.rs:660-668,732-745).  This module
closes the TPU-side gap: Fp2 arithmetic as a Field-shaped adapter over
the limb engine (ops/field.py) so the field-generic Jacobian formulas in
ops/curve.py run unchanged for G2, plus batched scalar multiplication.

Representation: an Fp2 element is a uint32 array [L, 2, *batch] — limb
axis first (what the base Field expects), the real/imag component axis
second, batch after.  u^2 = -1 (the BLS12-381 quadratic nonresidue), so
mul is one Karatsuba over component slices.

The serving path keeps the native C++ kernels (fastpairing.cpp) for its
single-point verify-side G2 algebra — a one-point device round trip is
pure launch latency; this module is the capability + the batched form
(e.g. G2 SRS generation on device), pinned against refimpl by
tests/test_g2_device.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FP_LIMBS, G2_GENERATOR_X, G2_GENERATOR_Y
from . import curve as cv
from .curve import G1Aff, G1Jac
from .field import FP
from .limbs import ints_to_vec, vec_to_ints


class FP2Field:
    """Field-protocol adapter: Fp2 ops over [L, 2, *batch] limb arrays.

    Implements exactly the surface the generic point formulas in
    ops/curve.py consume (add/sub/mul/square/is_zero/select/
    broadcast_const/one_mont); everything delegates to the base Fp
    engine, with the component axis treated as one more batch dim for
    linear ops and Karatsuba-combined for products."""

    def __init__(self, base):
        self.base = base

    @property
    def one_mont(self):
        return self.base.one_mont

    def add(self, a, b):
        return self.base.add(a, b)

    def sub(self, a, b):
        return self.base.sub(a, b)

    def _split(self, a):
        return a[:, 0], a[:, 1]

    def mul(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        f = self.base
        t0 = f.mul(a0, b0)
        t1 = f.mul(a1, b1)
        t2 = f.mul(f.add(a0, a1), f.add(b0, b1))
        c0 = f.sub(t0, t1)
        c1 = f.sub(f.sub(t2, t0), t1)
        return jnp.stack([c0, c1], axis=1)

    def square(self, a):
        a0, a1 = self._split(a)
        f = self.base
        c0 = f.mul(f.add(a0, a1), f.sub(a0, a1))
        t = f.mul(a0, a1)
        c1 = f.add(t, t)
        return jnp.stack([c0, c1], axis=1)

    def inv(self, a):
        """(a0 + a1 u)^-1 = (a0 - a1 u) / (a0^2 + a1^2); 0 -> 0."""
        a0, a1 = self._split(a)
        f = self.base
        n = f.add(f.mul(a0, a0), f.mul(a1, a1))
        ninv = f.inv(n)
        c0 = f.mul(a0, ninv)
        c1 = f.mul(f.sub(jnp.zeros_like(a1), a1), ninv)
        return jnp.stack([c0, c1], axis=1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(0, 1))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(0, 1))

    def select(self, mask, a, b):
        return jnp.where(mask[None, None], a, b)

    def broadcast_const(self, value_limbs: np.ndarray, batch_shape):
        """Embed a base-field [L] constant as (value, 0) in Fp2.

        The generic formulas pass batch_shape = z.shape[1:], whose
        leading dim is the component axis."""
        assert batch_shape[0] == 2, "Fp2 arrays carry the component axis"
        re = self.base.broadcast_const(value_limbs, tuple(batch_shape[1:]))
        return jnp.stack([re, jnp.zeros_like(re)], axis=1)


FP2 = FP2Field(FP)
FP2_COMPACT = FP2Field(cv.FP_COMPACT)


# -- G2 points ---------------------------------------------------------------
# Reuse the G1Jac / G1Aff containers: coordinates are [L, 2, *batch].

def g2_identity(batch_shape) -> G1Jac:
    z = jnp.zeros((FP_LIMBS, 2) + tuple(batch_shape), jnp.uint32)
    return G1Jac(z, z, z)


def _fp2_const(pair, batch_shape=()):
    vals = [c * FP.mont_r % FP.modulus for c in pair]
    arr = jnp.asarray(ints_to_vec(vals, FP_LIMBS))          # [L, 2]
    return jnp.broadcast_to(
        arr.reshape((FP_LIMBS, 2) + (1,) * len(batch_shape)),
        (FP_LIMBS, 2) + tuple(batch_shape),
    )


def g2_generator_jac(batch_shape=()) -> G1Jac:
    return G1Jac(
        _fp2_const(G2_GENERATOR_X, batch_shape),
        _fp2_const(G2_GENERATOR_Y, batch_shape),
        FP2.broadcast_const(FP.one_mont, (2,) + tuple(batch_shape)),
    )


def g2_dbl(p: G1Jac) -> G1Jac:
    return cv._dbl_impl(FP2, p)


def g2_add(p: G1Jac, q: G1Jac) -> G1Jac:
    return cv._add_impl(FP2, p, q)


def g2_madd(p: G1Jac, q: G1Aff) -> G1Jac:
    return cv._madd_impl(FP2, p, q)


@jax.jit
def g2_scalar_mul(p: G1Jac, scalars) -> G1Jac:
    """[k]P batched: double-and-add over the 256 scalar bits (MSB first).

    p: Jacobian batch [L, 2, *batch]; scalars: uint32 [FR_LIMBS, *batch]
    canonical little-endian limbs.  Identity in -> identity out; k = 0
    -> identity."""
    n_bits = 16 * scalars.shape[0]

    def bit_at(i):
        limb = i // 16
        off = i % 16
        return ((scalars[limb] >> off) & 1).astype(bool)

    def step(acc, i):
        acc = cv._dbl_impl(FP2, acc)
        with_p = cv._add_impl(FP2, acc, p)
        b = bit_at(n_bits - 1 - i)
        return G1Jac(
            FP2.select(b, with_p.x, acc.x),
            FP2.select(b, with_p.y, acc.y),
            FP2.select(b, with_p.z, acc.z),
        ), None

    init = g2_identity(p.z.shape[2:])
    out, _ = jax.lax.scan(step, init, jnp.arange(n_bits))
    return out


def g2_to_affine(p: G1Jac):
    """Jacobian batch -> (x, y, inf) affine arrays ([L, 2, *batch])."""
    inf = FP2.is_zero(p.z)
    safe_z = FP2.select(inf, FP2.broadcast_const(FP.one_mont, p.z.shape[1:]),
                        p.z)
    zinv = FP2.inv(safe_z)
    zinv2 = FP2.square(zinv)
    zinv3 = FP2.mul(zinv2, zinv)
    return FP2.mul(p.x, zinv2), FP2.mul(p.y, zinv3), inf


def g2_affine_from_ints(points) -> G1Aff:
    """List of refimpl G2 points (Fp2-coeff pairs or None) -> device batch."""
    xs, ys, infs = [], [], []
    for pt in points:
        if pt is None:
            xs.extend([0, 0])
            ys.extend([0, 0])
            infs.append(True)
        else:
            (x, y) = pt
            x0, x1 = (x.c0, x.c1) if hasattr(x, "c0") else (x[0], x[1])
            y0, y1 = (y.c0, y.c1) if hasattr(y, "c0") else (y[0], y[1])
            xs.extend([x0 * FP.mont_r % FP.modulus,
                       x1 * FP.mont_r % FP.modulus])
            ys.extend([y0 * FP.mont_r % FP.modulus,
                       y1 * FP.mont_r % FP.modulus])
            infs.append(False)
    n = len(points)
    x = jnp.asarray(ints_to_vec(xs, FP_LIMBS)).reshape(FP_LIMBS, n, 2)
    y = jnp.asarray(ints_to_vec(ys, FP_LIMBS)).reshape(FP_LIMBS, n, 2)
    return G1Aff(jnp.moveaxis(x, 2, 1), jnp.moveaxis(y, 2, 1),
                 jnp.asarray(np.array(infs)))


def g2_jac_to_int_points(p: G1Jac):
    """Device G2 Jacobian batch -> list of ((x0,x1),(y0,y1)) or None."""
    x, y, inf = g2_to_affine(p)
    # point-major flatten: [L, 2, n] -> [L, n, 2] -> [L, 2n]
    xs = vec_to_ints(FP.from_mont(
        jnp.moveaxis(x, 1, -1).reshape(FP_LIMBS, -1)))
    ys = vec_to_ints(FP.from_mont(
        jnp.moveaxis(y, 1, -1).reshape(FP_LIMBS, -1)))
    infs = list(np.asarray(inf).reshape(-1))
    out = []
    for i, is_inf in enumerate(infs):
        if is_inf:
            out.append(None)
        else:
            out.append(((xs[2 * i], xs[2 * i + 1]),
                        (ys[2 * i], ys[2 * i + 1])))
    return out
