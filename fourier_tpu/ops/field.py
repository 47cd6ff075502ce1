"""Batched prime-field arithmetic in JAX: 16-bit limbs, Montgomery form.

Replaces the reference's blst Fr/Fp CPU arithmetic (FsFr/FsFp, used
throughout reference src/engine/piano.rs) with a TPU-native design:

- Elements are ``uint32[..., L]`` arrays of little-endian 16-bit limbs
  (L=16 for Fr, L=24 for Fp).  Limb products are exact in 32-bit lanes.
- Multiplication is schoolbook column accumulation (all limb products
  issued as wide vector ops; carries deferred — column sums stay < 2^23)
  followed by word-serial Montgomery reduction (CIOS-style, L short
  steps, each a full-width vector op over the batch).
- Carry/borrow resolution is an exact ``lax.scan`` over the limb axis;
  everything is branchless and batched over arbitrary leading dims, so
  the VPU lanes are filled by the batch dimension.

All methods are traceable/jittable; the `Field` instance only holds
numpy constants which embed as XLA constants.
"""

from __future__ import annotations

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
    """Montgomery limb arithmetic for a fixed prime modulus."""

    def __init__(self, modulus: int, n_limbs: int):
        self.modulus = modulus
        self.L = n_limbs
        radix = 1 << LIMB_BITS
        self.mont_r = (1 << (LIMB_BITS * n_limbs)) % modulus
        self.mont_r2 = (self.mont_r * self.mont_r) % modulus
        self.n0inv = np.uint32((-pow(modulus, -1, radix)) % radix)
        self.mod_limbs = int_to_limbs(modulus, n_limbs)
        self.r2_limbs = int_to_limbs(self.mont_r2, n_limbs)
        self.one_mont = int_to_limbs(self.mont_r, n_limbs)
        self.zero = np.zeros(n_limbs, np.uint32)

    # -- helpers -----------------------------------------------------------

    def _pad_tail(self, x, offset: int, width: int):
        """Place x's last axis at [offset, offset+len) in a width-wide axis."""
        cfg = [(0, 0)] * (x.ndim - 1) + [(offset, width - offset - x.shape[-1])]
        return jnp.pad(x, cfg)

    def _carry(self, x):
        """Resolve carries: any-magnitude limbs (< 2^31) -> canonical 16-bit.

        Works for uint32 and int32 (borrows propagate via arithmetic shift).
        The caller guarantees the total value fits in L limbs.
        """
        xt = jnp.moveaxis(x, -1, 0)
        zero = jnp.zeros(x.shape[:-1], x.dtype)

        def step(c, xi):
            s = xi + c
            return s >> LIMB_BITS, s & x.dtype.type(LIMB_MASK)

        _, limbs = jax.lax.scan(step, zero, xt)
        return jnp.moveaxis(limbs, 0, -1)

    def _geq_mod(self, a):
        """a >= modulus, lexicographic from the most significant limb."""
        diff = a.astype(jnp.int32) - self.mod_limbs.astype(np.int32)
        rev = diff[..., ::-1]
        nz = rev != 0
        idx = jnp.argmax(nz, axis=-1)
        top = jnp.take_along_axis(rev, idx[..., None], axis=-1)[..., 0]
        return jnp.where(jnp.any(nz, axis=-1), top > 0, True)

    def _cond_sub_mod(self, a):
        """Subtract the modulus where a >= modulus (a < 2*modulus)."""
        mask = self._geq_mod(a)
        diff = a.astype(jnp.int32) - self.mod_limbs.astype(np.int32)
        norm = self._carry(diff).astype(jnp.uint32)
        return jnp.where(mask[..., None], norm, a)

    # -- basic ops ---------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def add(self, a, b):
        s = self._carry((a + b).astype(jnp.uint32))
        return self._cond_sub_mod(s)

    @partial(jax.jit, static_argnums=0)
    def sub(self, a, b):
        t = a.astype(jnp.int32) + self.mod_limbs.astype(np.int32) - b.astype(jnp.int32)
        norm = self._carry(t).astype(jnp.uint32)
        return self._cond_sub_mod(norm)

    @partial(jax.jit, static_argnums=0)
    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, mask, a, b):
        """mask ? a : b, with mask shaped like the batch dims."""
        return jnp.where(mask[..., None], a, b)

    # -- multiplication ----------------------------------------------------

    def _mul_wide(self, a, b):
        """Exact 2L-limb product with deferred carries (columns < 2^22)."""
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        acc = jnp.zeros(a.shape[:-1] + (2 * L,), jnp.uint32)
        for i in range(L):
            p = a[..., i : i + 1] * b  # exact: (2^16-1)^2 < 2^32
            lo = p & _MASK
            hi = p >> LIMB_BITS
            acc = acc + self._pad_tail(lo, i, 2 * L)
            acc = acc + self._pad_tail(hi, i + 1, 2 * L)
        return acc

    def _mont_reduce(self, acc):
        """Word-serial Montgomery reduction of a 2L-limb deferred-carry
        accumulator; returns L limbs (< 2^23 each), value < 2*modulus."""
        L = self.L
        mod = self.mod_limbs
        for i in range(L):
            m = ((acc[..., i] & _MASK) * self.n0inv) & _MASK
            p = m[..., None] * mod
            lo = p & _MASK
            hi = p >> LIMB_BITS
            acc = acc + self._pad_tail(lo, i, 2 * L)
            acc = acc + self._pad_tail(hi, i + 1, 2 * L)
            carry = (acc[..., i] >> LIMB_BITS)[..., None]
            acc = acc + self._pad_tail(carry, i + 1, 2 * L)
        return acc[..., L:]

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
        return self.mul(a, jnp.asarray(self.r2_limbs))

    @partial(jax.jit, static_argnums=0)
    def from_mont(self, a):
        wide = self._pad_tail(a, 0, 2 * self.L)
        red = self._mont_reduce(wide)
        return self._cond_sub_mod(self._carry(red))

    # -- exponentiation ----------------------------------------------------

    @partial(jax.jit, static_argnums=(0, 2))
    def pow_const(self, a, e: int):
        """a^e for a static exponent; Montgomery in/out. O(bits) scan."""
        if e == 0:
            return jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)
        bits = np.array([c == "1" for c in bin(e)[2:]], dtype=np.bool_)

        def step(acc, bit):
            acc = self.mul(acc, acc)
            with_a = self.mul(acc, a)
            return jnp.where(bit, with_a, acc), None

        init = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)
        # first bit is the leading 1: start from a directly
        init = jnp.asarray(a)
        out, _ = jax.lax.scan(step, init, bits[1:])
        return out

    @partial(jax.jit, static_argnums=0)
    def inv(self, a):
        """Batched Fermat inversion a^(p-2); Montgomery in/out.

        0 maps to 0 (callers guard).  Replaces blst's field inversion on
        the quotient path — fully parallel over the batch, ~2*255 deep.
        """
        return self.pow_const(a, self.modulus - 2)


FR = Field(R, FR_LIMBS)
FP = Field(P, FP_LIMBS)
