"""Batched prime-field arithmetic in JAX: 16-bit limbs, Montgomery form.

Replaces the reference's blst Fr/Fp CPU arithmetic (FsFr/FsFp, used
throughout reference src/engine/piano.rs) with a TPU-native design:

- Elements are ``uint32[L, ...]`` arrays of little-endian 16-bit limbs
  (L=16 for Fr, L=24 for Fp), **limb axis leading**: the minor-most axes
  are batch, so elementwise kernels fill the 8x128 VPU lanes with the
  batch dimension instead of padding a 16/24-wide limb axis to 128 lanes.
- Limb products are exact in 32-bit lanes; multiplication is schoolbook
  column accumulation with deferred carries (column sums stay < 2^23),
  followed by word-serial Montgomery reduction (CIOS-style: L short
  steps, each a full-width vector op over the batch).
- Carry/borrow resolution is an exact ``lax.scan`` over the leading limb
  axis; everything is branchless and batched over arbitrary trailing dims.

All methods are traceable/jittable; the `Field` instance only holds
numpy constants which embed as XLA constants.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    FP_LIMBS,
    FR_LIMBS,
    LIMB_BITS,
    LIMB_MASK,
    P,
    R,
)
from .limbs import int_to_limbs

_MASK = np.uint32(LIMB_MASK)


class Field:
    """Montgomery limb arithmetic for a fixed prime modulus.

    All arrays are uint32 with shape ``(L, *batch)``; Montgomery form
    unless stated otherwise.
    """

    def __init__(self, modulus: int, n_limbs: int, unroll: bool | None = None):
        self.modulus = modulus
        self.L = n_limbs
        radix = 1 << LIMB_BITS
        self.mont_r = (1 << (LIMB_BITS * n_limbs)) % modulus
        self.mont_r2 = (self.mont_r * self.mont_r) % modulus
        self.n0inv = np.uint32((-pow(modulus, -1, radix)) % radix)
        self.mod_limbs = int_to_limbs(modulus, n_limbs)        # [L]
        self.r2_limbs = int_to_limbs(self.mont_r2, n_limbs)    # [L]
        self.one_mont = int_to_limbs(self.mont_r, n_limbs)     # [L]
        # Unrolled limb loops give XLA maximal fusion freedom but trace to
        # ~10x larger HLO (slow compiles); rolled fori_loops keep graphs
        # small.  Default rolled; flip with FOURIER_UNROLL=1 to measure.
        if unroll is None:
            unroll = os.environ.get("FOURIER_UNROLL", "0") == "1"
        self.unroll = unroll

    # -- helpers -----------------------------------------------------------

    def _bshape(self, c: np.ndarray, ndim: int):
        """Reshape a [L] constant for broadcasting against [L, ...batch]."""
        return c.reshape((c.shape[0],) + (1,) * (ndim - 1))

    def _pad_limb(self, x, offset: int, width: int):
        """Place x's leading axis at [offset, offset+len) of a width-wide axis."""
        cfg = [(offset, width - offset - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg)

    def _carry(self, x):
        """Resolve carries: any-magnitude limbs (|.| < 2^31) -> canonical 16-bit.

        Works for uint32 and int32 (borrows propagate via arithmetic shift).
        The caller guarantees the total value fits in the limb count.
        """
        zero = jnp.zeros(x.shape[1:], x.dtype)

        def step(c, xi):
            s = xi + c
            return s >> LIMB_BITS, s & x.dtype.type(LIMB_MASK)

        _, limbs = jax.lax.scan(step, zero, x)
        return limbs

    def _geq_mod(self, a):
        """a >= modulus, lexicographic from the most significant limb."""
        diff = a.astype(jnp.int32) - self._bshape(
            self.mod_limbs.astype(np.int32), a.ndim
        )
        rev = diff[::-1]
        nz = rev != 0
        idx = jnp.argmax(nz, axis=0)
        top = jnp.take_along_axis(rev, idx[None], axis=0)[0]
        return jnp.where(jnp.any(nz, axis=0), top > 0, True)

    def _cond_sub_mod(self, a):
        """Subtract the modulus where a >= modulus (requires a < 2*modulus)."""
        mask = self._geq_mod(a)
        diff = a.astype(jnp.int32) - self._bshape(
            self.mod_limbs.astype(np.int32), a.ndim
        )
        norm = self._carry(diff).astype(jnp.uint32)
        return jnp.where(mask[None], norm, a)

    # -- basic ops ---------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def add(self, a, b):
        s = self._carry((a + b).astype(jnp.uint32))
        return self._cond_sub_mod(s)

    @partial(jax.jit, static_argnums=0)
    def sub(self, a, b):
        t = (
            a.astype(jnp.int32)
            - b.astype(jnp.int32)
            + self._bshape(self.mod_limbs.astype(np.int32), a.ndim)
        )
        norm = self._carry(t).astype(jnp.uint32)
        return self._cond_sub_mod(norm)

    @partial(jax.jit, static_argnums=0)
    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        """mask ? a : b, with mask shaped like the batch dims."""
        return jnp.where(mask[None], a, b)

    def broadcast_const(self, value_limbs: np.ndarray, batch_shape):
        """Embed a [L] constant as a [L, *batch_shape] array."""
        return jnp.broadcast_to(
            self._bshape(value_limbs, 1 + len(batch_shape)),
            (self.L,) + tuple(batch_shape),
        )

    # -- multiplication ----------------------------------------------------

    def _contrib(self, p):
        """Limb products p [L, ...] -> [L+1, ...] column contribution
        (lo parts at offset 0, hi parts shifted up one limb)."""
        lo = p & _MASK
        hi = p >> LIMB_BITS
        pad = jnp.zeros((1,) + p.shape[1:], jnp.uint32)
        return jnp.concatenate([lo, pad], axis=0).at[1:].add(hi)

    def _mul_wide(self, a, b):
        """Exact 2L-limb product with deferred carries (columns < 2^22)."""
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        acc = jnp.zeros((2 * L,) + a.shape[1:], jnp.uint32)
        if self.unroll:
            for i in range(L):
                p = a[i : i + 1] * b  # exact: (2^16-1)^2 < 2^32
                acc = acc + self._pad_limb(self._contrib(p), i, 2 * L)
            return acc

        def body(i, acc):
            ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=0)
            seg = jax.lax.dynamic_slice_in_dim(acc, i, L + 1, axis=0)
            seg = seg + self._contrib(ai * b)
            return jax.lax.dynamic_update_slice_in_dim(acc, seg, i, axis=0)

        return jax.lax.fori_loop(0, L, body, acc, unroll=False)

    def _mont_reduce(self, acc):
        """Word-serial Montgomery reduction of a 2L-limb deferred-carry
        accumulator; returns L limbs (< 2^23 each), value < 2*modulus."""
        L = self.L
        mod = self._bshape(self.mod_limbs, acc.ndim)
        if self.unroll:
            for i in range(L):
                m = ((acc[i : i + 1] & _MASK) * self.n0inv) & _MASK
                acc = acc + self._pad_limb(self._contrib(m * mod), i, 2 * L)
                carry = acc[i : i + 1] >> LIMB_BITS
                acc = acc + self._pad_limb(carry, i + 1, 2 * L)
            return acc[L:]

        def body(i, acc):
            seg = jax.lax.dynamic_slice_in_dim(acc, i, L + 1, axis=0)
            m = ((seg[:1] & _MASK) * self.n0inv) & _MASK
            seg = seg + self._contrib(m * mod)
            carry = seg[:1] >> LIMB_BITS
            seg = seg.at[1:2].add(carry)
            return jax.lax.dynamic_update_slice_in_dim(acc, seg, i, axis=0)

        acc = jax.lax.fori_loop(0, L, body, acc, unroll=False)
        return acc[L:]

    @partial(jax.jit, static_argnums=0)
    def mul(self, a, b):
        """Montgomery product: mul(aR, bR) = abR (mod modulus)."""
        red = self._mont_reduce(self._mul_wide(a, b))
        return self._cond_sub_mod(self._carry(red))

    @partial(jax.jit, static_argnums=0)
    def square(self, a):
        return self.mul(a, a)

    # -- Montgomery domain conversions --------------------------------------

    @partial(jax.jit, static_argnums=0)
    def to_mont(self, a):
        return self.mul(a, self._bshape(self.r2_limbs, a.ndim))

    @partial(jax.jit, static_argnums=0)
    def from_mont(self, a):
        wide = self._pad_limb(a, 0, 2 * self.L)
        red = self._mont_reduce(wide)
        return self._cond_sub_mod(self._carry(red))

    # -- exponentiation ----------------------------------------------------

    @partial(jax.jit, static_argnums=(0, 2))
    def pow_const(self, a, e: int):
        """a^e for a static exponent; Montgomery in/out. O(bits) scan."""
        if e == 0:
            return self.broadcast_const(self.one_mont, a.shape[1:])
        bits = np.array([c == "1" for c in bin(e)[2:]], dtype=np.bool_)

        def step(acc, bit):
            acc = self.mul(acc, acc)
            with_a = self.mul(acc, a)
            return jnp.where(bit, with_a, acc), None

        # the leading exponent bit is 1: start from a itself
        out, _ = jax.lax.scan(step, jnp.asarray(a), bits[1:])
        return out

    @partial(jax.jit, static_argnums=0)
    def inv(self, a):
        """Batched Fermat inversion a^(p-2); Montgomery in/out.

        0 maps to 0 (callers guard).  Replaces blst's field inversion on
        the quotient path — fully parallel over the batch, ~2*|p| deep.
        """
        return self.pow_const(a, self.modulus - 2)


FR = Field(R, FR_LIMBS)
FP = Field(P, FP_LIMBS)
