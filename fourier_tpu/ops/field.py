"""Batched prime-field arithmetic in JAX: 16-bit limbs, Montgomery form.

Replaces the reference's blst Fr/Fp CPU arithmetic (FsFr/FsFp, used
throughout reference src/engine/piano.rs) with a TPU-native design.
CPU bignum code is word-serial (carry chains, CIOS loops); a literal
port would turn every field op into hundreds of microscopic sequential
steps and die of loop overhead on the VPU.  Everything here is therefore
reformulated as a short pipeline of *wide* vector ops:

- Elements are ``uint32[L, ...]`` little-endian 16-bit limbs (L=16 for
  Fr, L=24 for Fp), **limb axis leading**: the minor axes are batch, so
  kernels fill the 8x128 VPU lanes with the batch dimension.
- Limb products are exact in 32-bit lanes (16x16 -> 32).  Products are
  accumulated as *deferred-carry column sums* (columns stay < 2^22, no
  per-limb carries during accumulation).
- **Montgomery reduction by full multiplication**: instead of the
  word-serial CIOS loop,  m = (t mod R) * N' mod R  and
  u = (t + m*N) / R  are computed with two more full limb-product
  passes —三 passes of independent multiply-adds, zero sequential steps.
- **Carry resolution is exact and log-depth**: two value-bounded ripple
  passes reduce limbs to <= 2^16, then a Kogge-Stone carry-lookahead
  (generate/propagate prefix, log2 L steps) finishes exactly.
- Subtraction is two's-complement (a + ~b + N + 1 with the overflow
  limb dropped), so there are no signed borrow chains at all.

All methods are traceable/jittable; `Field` instances only hold numpy
constants which embed as XLA constants.
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

    def __init__(self, modulus: int, n_limbs: int):
        self.modulus = modulus
        self.L = n_limbs
        radix_bits = LIMB_BITS * n_limbs
        self.mont_r = (1 << radix_bits) % modulus
        self.mont_r2 = (self.mont_r * self.mont_r) % modulus
        # N' = -N^{-1} mod 2^(16L), full width (for reduction-by-multiplication)
        self.nprime_limbs = int_to_limbs(
            (-pow(modulus, -1, 1 << radix_bits)) % (1 << radix_bits), n_limbs
        )
        self.n0inv = np.uint32((-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        self.mod_limbs = int_to_limbs(modulus, n_limbs)        # [L]
        self.compl_mod = (_MASK - self.mod_limbs).astype(np.uint32)  # ~N per limb
        self.r2_limbs = int_to_limbs(self.mont_r2, n_limbs)    # [L]
        self.one_mont = int_to_limbs(self.mont_r, n_limbs)     # [L]
        one0 = np.zeros(n_limbs, np.uint32)
        one0[0] = 1
        self.one0 = one0                                        # [L] == integer 1
        # lazy-domain constants: 2N fits the limb radix for both fields
        self.mod2_limbs = int_to_limbs(2 * modulus, n_limbs)    # [L]
        self.compl_mod2 = (_MASK - self.mod2_limbs).astype(np.uint32)
        # 4N (Fp only — Fr's lazy domain is rejected anyway) and the
        # top-limb thresholds for the fused conditional reduction in
        # add_lazy/sub_lazy: a pre-carry top column > t2n (t4n) proves
        # the value is >= 2N (4N).
        if 4 * modulus < (1 << radix_bits):
            self.mod4_limbs = int_to_limbs(4 * modulus, n_limbs)
        else:
            self.mod4_limbs = np.zeros(n_limbs, np.uint32)
        self._t2n = int((2 * modulus) >> (LIMB_BITS * (n_limbs - 1)))
        self._t4n = int((4 * modulus) >> (LIMB_BITS * (n_limbs - 1)))
        # Static closure check for the PADDED lazy domain (see the
        # add_lazy/sub_lazy block): _fused_reduce's top-column test can
        # leave reduced values up to PAD_UNITS top-limb units above 2N
        # (<= 2 carry units from the low columns + 1 from the 2N fold,
        # with one unit of threshold ambiguity).  The domain is closed
        # only if the mul headroom absorbs that bound: for a, b <
        # B = 2N + pad, mul_lazy yields (ab + mN)/2^(16L) < B^2/2^(16L)
        # + N, which contracts back below 2N iff B^2 <= N * 2^(16L).
        # A future limb-layout change that breaks this must fail loudly
        # here, not silently corrupt kernel arithmetic.
        if 4 * modulus < (1 << radix_bits):  # fields with a lazy domain
            _PAD_UNITS = 4
            pad = _PAD_UNITS << (LIMB_BITS * (n_limbs - 1))
            bound = 2 * modulus + pad
            assert bound * bound <= modulus << radix_bits, (
                "padded lazy domain is not closed under mul_lazy: "
                "2N + pad exceeds the Montgomery contraction bound"
            )
            # and the top-column thresholds must be distinguishable:
            # one top-limb unit of pre-carry ambiguity each side
            assert self._t4n - self._t2n > 2 * _PAD_UNITS, (
                "t2n/t4n thresholds too close for the pad bound"
            )
        # Limb-embedding lowering: jnp.pad compiles fast under CPU/TPU XLA
        # but Mosaic rejects pad; Pallas kernel views flip this to
        # concatenate (see with_consts).
        self.emb_concat = False
        # Force the rolled (fori_loop) formulation regardless of backend:
        # used for rarely-executed fallback branches on TPU, where the
        # wide unrolled formulation would add tens of MB of executable
        # for code that runs ~never (see curve.FP_COMPACT).
        self.force_rolled = False

    # -- helpers -----------------------------------------------------------

    def _bshape(self, c: np.ndarray, ndim: int):
        """Reshape a [L]-like constant to broadcast against [L, ...batch]."""
        return c.reshape((c.shape[0],) + (1,) * (ndim - 1))

    def _shift_up(self, x, d: int):
        """Shift limbs towards higher indices by d (drop overflow)."""
        if d == 0:
            return x
        kept = x[: x.shape[0] - d]
        if self.emb_concat:  # Mosaic path: no pad support
            zeros = jnp.zeros((d,) + x.shape[1:], x.dtype)
            return jnp.concatenate([zeros, kept], axis=0)
        cfg = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(kept, cfg)

    def _place(self, x, off: int, width: int):
        """Embed x's leading axis at [off, off+len) of a width-wide axis."""
        tail = width - off - x.shape[0]
        if self.emb_concat:
            parts = []
            if off:
                parts.append(jnp.zeros((off,) + x.shape[1:], jnp.uint32))
            parts.append(x)
            if tail:
                parts.append(jnp.zeros((tail,) + x.shape[1:], jnp.uint32))
            return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        cfg = [(off, tail)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg)

    def _use_wide(self) -> bool:
        """Trace-time formulation choice.

        The wide log-depth formulation is right for the TPU (short
        pipelines of fat fused ops) but its large HLO graphs compile
        pathologically slowly under CPU XLA; the rolled fori_loop/scan
        formulation compiles in seconds on CPU with adequate runtime.
        Pallas kernel views (emb_concat) always use wide.
        """
        if self.emb_concat:
            return True
        if self.force_rolled:
            return False
        try:
            return jax.default_backend() != "cpu"
        except Exception:
            return True

    def _carry(self, x):
        """Exact carry resolution for limbs with |values| < 2^26; dispatches
        between the log-depth Kogge-Stone form and a sequential scan."""
        if not self._use_wide():
            return self._carry_seq(x)
        return self._carry_ks(x)

    def _carry_seq(self, x):
        """lax.scan carry chain (tiny graph; CPU-test formulation).
        Handles signed dtypes too (arithmetic shift propagates borrows)."""
        zero = jnp.zeros(x.shape[1:], x.dtype)

        def step(c, xi):
            s = xi + c
            return s >> LIMB_BITS, s & x.dtype.type(LIMB_MASK)

        _, limbs = jax.lax.scan(step, zero, x)
        return limbs.astype(x.dtype)

    def _carry_ks(self, x):
        """Exact carry resolution for uint32 limbs with values < 2^26.

        Two bounded ripple passes bring every limb to <= 2^16, then a
        Kogge-Stone generate/propagate prefix finishes in log2(L) steps.
        Carry out of the top limb is dropped (callers guarantee fit or
        rely on the 2^(16L) wrap).
        """
        for _ in range(2):
            c = x >> LIMB_BITS
            x = (x & _MASK) + self._shift_up(c, 1)
        # limbs now <= 0x10000: single-bit carries.  Flags kept as uint32
        # 0/1 (not bool): Mosaic cannot shift/concatenate i1 vectors.
        g = (x >> LIMB_BITS).astype(jnp.uint32)        # generate (0/1)
        p = ((x & _MASK) == _MASK).astype(jnp.uint32)  # propagate (0/1)
        r = x & _MASK
        # carry INTO position i: chain over positions < i
        G = self._shift_up(g, 1)
        Pp = self._shift_up(p, 1)
        d = 1
        while d < x.shape[0]:
            G = G | (Pp & self._shift_up(G, d))
            Pp = Pp & self._shift_up(Pp, d)
            d *= 2
        return (r + G) & _MASK

    def _carry_with_overflow(self, x):
        """Like _carry but returns (limbs, overflow_bit) where overflow is
        the carry out of the top limb (x gets an extra scratch limb).

        Static slices only (integer indexing would lower to dynamic_slice,
        which Mosaic does not support inside Pallas kernels)."""
        n = x.shape[0]
        if self.emb_concat:
            pad = jnp.zeros((1,) + x.shape[1:], x.dtype)
            wide = jnp.concatenate([x, pad], axis=0)
        else:
            wide = jnp.pad(x, [(0, 1)] + [(0, 0)] * (x.ndim - 1))
        out = self._carry(wide)
        top = jax.lax.index_in_dim(out, n, axis=0, keepdims=False)
        return jax.lax.slice_in_dim(out, 0, n, axis=0), top > 0

    def _sub_mod_raw(self, a):
        """(a - N) mod 2^(16L) and the a >= N flag, via two's complement."""
        compl = self._bshape(self.compl_mod, a.ndim)
        t = a + compl + self._bshape(self.one0, a.ndim)
        limbs, ge = self._carry_with_overflow(t)
        return limbs, ge

    def _cond_sub_mod(self, a):
        """Subtract the modulus where a >= modulus (requires a < 2*modulus)."""
        sub, ge = self._sub_mod_raw(a)
        return jnp.where(ge[None], sub, a)

    # -- basic ops ---------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def add(self, a, b):
        s = self._carry(a + b)  # a+b < 2N < 2^(16L): no top overflow
        return self._cond_sub_mod(s)

    @partial(jax.jit, static_argnums=0)
    def sub(self, a, b):
        # a - b + N  ==  a + ~b + N + 1  (mod 2^(16L)), all limbs unsigned
        t = (
            a
            + (b ^ _MASK)
            + self._bshape(self.mod_limbs, a.ndim)
            + self._bshape(self.one0, a.ndim)
        )
        s = self._carry(t)  # value a-b+N in [1, 2N) after wrap
        return self._cond_sub_mod(s)

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
        ).astype(jnp.uint32)

    # -- rolled CIOS formulation (CPU-test path: tiny graphs) ---------------

    def _contrib(self, p):
        """Limb products p [k, ...] -> [k+1, ...] column contribution
        (lo parts at offset 0, hi parts shifted up one limb)."""
        lo = p & _MASK
        hi = p >> LIMB_BITS
        pad = jnp.zeros((1,) + p.shape[1:], jnp.uint32)
        return jnp.concatenate([lo, pad], axis=0).at[1:].add(hi)

    def _redc_rolled(self, acc):
        """Word-serial Montgomery reduction via fori_loop (graph stays tiny)."""
        L = self.L
        mod = self._bshape(self.mod_limbs, acc.ndim)

        def body(i, acc):
            seg = jax.lax.dynamic_slice_in_dim(acc, i, L + 1, axis=0)
            m = ((seg[:1] & _MASK) * self.n0inv) & _MASK
            seg = seg + self._contrib(m * mod)
            carry = seg[:1] >> LIMB_BITS
            seg = seg.at[1:2].add(carry)
            return jax.lax.dynamic_update_slice_in_dim(acc, seg, i, axis=0)

        acc = jax.lax.fori_loop(0, L, body, acc)
        return acc[L:]

    def _mul_rolled(self, a, b):
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        acc = jnp.zeros((2 * L,) + a.shape[1:], jnp.uint32)

        def body(i, acc):
            ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=0)
            seg = jax.lax.dynamic_slice_in_dim(acc, i, L + 1, axis=0)
            seg = seg + self._contrib(ai * b)
            return jax.lax.dynamic_update_slice_in_dim(acc, seg, i, axis=0)

        acc = jax.lax.fori_loop(0, L, body, acc)
        red = self._redc_rolled(acc)
        return self._cond_sub_mod(self._carry(red))

    # -- multiplication ----------------------------------------------------

    def _acc_products(self, a, b, width: int, truncate: bool):
        """Deferred-carry column accumulation of a*b.

        a, b: [L, ...] canonical limbs.  Returns [width, ...] column sums
        (each < 2L * 2^16 < 2^22).  With truncate=True only columns
        < width are formed (low product).  Fully unrolled: ~4L wide vector
        ops with no loop-carried sequential dependency chains beyond the
        accumulation adds, which XLA fuses and trees.
        """
        L = self.L
        batch = jnp.broadcast_shapes(a.shape, b.shape)[1:]
        acc = jnp.zeros((width,) + batch, jnp.uint32)

        def place(x, off: int):
            return self._place(x, off, width)

        for i in range(L):
            span = min(L, width - i) if truncate else L
            if span <= 0:
                break
            p = a[i : i + 1] * b[:span]            # [span, ...] exact
            lo = p & _MASK
            hi = p >> LIMB_BITS
            lo_w = min(span, width - i)
            hi_w = min(span, width - i - 1)
            acc = acc + place(lo[:lo_w], i)
            if hi_w > 0:
                acc = acc + place(hi[:hi_w], i + 1)
        return acc

    @partial(jax.jit, static_argnums=0)
    def mul(self, a, b):
        """Montgomery product mul(aR, bR) = abR mod N, via reduction by
        full multiplication:  t = a*b;  m = (t mod R)*N' mod R;
        result = (t + m*N) / R.  Three column-accumulation passes + three
        log-depth carry resolutions; zero word-serial steps.  On CPU
        (tests) a rolled CIOS formulation keeps compiles fast.
        """
        if not self._use_wide():
            return self._mul_rolled(a, b)
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        t = self._carry_wide(self._acc_products(a, b, 2 * L, truncate=False))
        t_lo = t[:L]
        m = self._carry(
            self._acc_products(
                t_lo, self._bshape(self.nprime_limbs, a.ndim), L, truncate=True
            )
        )
        mn = self._acc_products(m, self._bshape(self.mod_limbs, a.ndim), 2 * L,
                                truncate=False)
        u = self._carry_wide(mn + t)
        # low L limbs of u are zero by construction; result is the high half
        res = u[L:]
        return self._cond_sub_mod(res)

    def _carry_wide(self, x):
        """_carry for a 2L-limb accumulator (same algorithm, any length)."""
        return self._carry(x)

    def _acc_square(self, a, width: int):
        """Deferred-carry column accumulation of a*a using symmetry:
        off-diagonal products contribute twice, so only L(L+1)/2 limb
        multiplies are issued (~45% fewer than _acc_products).  Doubling
        happens on the 16-bit halves (< 2^17), keeping column sums < 2^23.
        """
        L = self.L
        acc = jnp.zeros((width,) + a.shape[1:], jnp.uint32)
        for i in range(L):
            span = L - i
            p = a[i : i + 1] * a[i:]            # products a_i * a_j, j >= i
            lo = p & _MASK
            hi = p >> LIMB_BITS
            # diagonal term once, off-diagonal terms twice
            two = jnp.concatenate(
                [jnp.ones((1,) + a.shape[1:], jnp.uint32),
                 jnp.full((span - 1,) + a.shape[1:], 2, jnp.uint32)],
                axis=0,
            ) if span > 1 else jnp.ones((1,) + a.shape[1:], jnp.uint32)
            acc = acc + self._place(lo * two, 2 * i, width)
            acc = acc + self._place(hi * two, 2 * i + 1, width)
        return acc

    @partial(jax.jit, static_argnums=0)
    def square(self, a):
        """Montgomery squaring: symmetric product pass + standard reduction."""
        if not self._use_wide():
            return self._mul_rolled(a, a)
        L = self.L
        t = self._carry(self._acc_square(a, 2 * L))
        t_lo = jax.lax.slice_in_dim(t, 0, L, axis=0)
        m = self._carry(
            self._acc_products(
                t_lo, self._bshape(self.nprime_limbs, a.ndim), L, truncate=True
            )
        )
        mn = self._acc_products(
            m, self._bshape(self.mod_limbs, a.ndim), 2 * L, truncate=False
        )
        u = self._carry(mn + t)
        res = jax.lax.slice_in_dim(u, L, 2 * L, axis=0)
        return self._cond_sub_mod(res)

    # -- lazy kernel domain: values in [0, 2N + 2^(16(L-1))) ----------------
    #
    # With R = 2^(16L) > 4N, the Montgomery product of a, b < ~2N satisfies
    # (a*b + mN)/R < N(4N/R + 1) < 2N — so a whole chain of muls can stay
    # lazy with NO final conditional subtract per mul.  Adds/subs use a
    # FUSED conditional reduction: the pre-carry top column alone decides
    # whether to fold in -2N/-4N (as complement constants) before the
    # single carry resolution, leaving at most one top-limb unit of
    # overshoot that the padded domain absorbs (muls contract it back).
    # Zero then has three limb representatives {0, N, 2N}: kernel
    # equality branches must use is_zero_lazy, and results are
    # canonicalized once on kernel exit (canonicalize).  Used by the MSM
    # accumulation kernel (ops.msm_fused), where the per-mul subtract,
    # the full-width first carry, and the per-add second carry are ~20%
    # of the point-add cost.

    def _cond_sub_mod2(self, a):
        """Subtract 2N where a >= 2N (requires a < 4N)."""
        compl = self._bshape(self.compl_mod2, a.ndim)
        t = a + compl + self._bshape(self.one0, a.ndim)
        limbs, ge = self._carry_with_overflow(t)
        return jnp.where(ge[None], limbs, a)

    # The lazy add/sub below keep values in the PADDED lazy domain
    # [0, 2N + pad) with pad a small constant number of top-limb units
    # (< 4 * 2^(16(L-1)), from the column-sum bound): instead of an
    # exact compare-and-subtract (a second full carry per op), the
    # pre-carry TOP COLUMN alone decides the reduction — top > t2n
    # (t4n) proves the value >= 2N (4N).  The top-column test has a
    # false-negative gap: the pre-carry low columns can carry up to ~2
    # units into the top for add_lazy (plus ~2N mod unit), and ~3 for
    # sub_lazy, so reduced values land below 2N + 4 units rather than
    # 2N + 1.  The pad is closed: muls contract (4N(1+eps)^2 < R
    # headroom), adds/subs re-reduce into the same padded bound, and
    # zero gains a third representative {0, N, 2N} (is_zero_lazy).
    # One carry per add/sub instead of two-plus.

    def _comp_cols(self, mod_limbs, ndim):
        """Column form of 2^(16L) - value(mod_limbs): adding it subtracts
        the value modulo 2^(16L) (the final carry drops the wrap)."""
        return (
            self._bshape(mod_limbs ^ _MASK, ndim)
            + self._bshape(self.one0, ndim)
        )

    def _fused_reduce(self, t, top_bias: int):
        """Conditionally subtract 4N / 2N decided by t's pre-carry TOP
        COLUMN, then resolve carries once.  Threshold t2n (t4n) proves
        the value is >= 2N (4N); the at-most-one-top-limb ambiguity is
        absorbed by the padded lazy domain.  top_bias is the wrap
        constant already folded into t (2^16 when t's integer form
        carries 2^(16L))."""
        self._check_lazy_ok()
        top = t[-1:]
        comp2 = self._comp_cols(self.mod2_limbs, t.ndim)
        comp4 = self._comp_cols(self.mod4_limbs, t.ndim)
        t = t + jnp.where(
            top > top_bias + self._t4n,
            comp4.astype(jnp.uint32),
            jnp.where(top > top_bias + self._t2n,
                      comp2.astype(jnp.uint32), jnp.uint32(0)),
        )
        return self._carry(t)

    def add_lazy(self, a, b):
        return self._fused_reduce(a + b, 0)

    def sub_lazy(self, a, b):
        # a - b + 4N  ==  a + ~b + 4N + 1 - 2^(16L): 4N keeps the value
        # positive for b in the padded domain (b < 2N + pad < 4N)
        t = (
            a
            + (b ^ _MASK)
            + self._bshape(self.mod4_limbs, a.ndim)
            + self._bshape(self.one0, a.ndim)
        )
        return self._fused_reduce(t, 1 << LIMB_BITS)


    def _check_lazy_ok(self):
        # The [0, 2N) closure proof needs R > 4N: true for Fp (2^384 vs
        # ~2^382.7) but NOT for Fr (2^256 vs ~2^256.9) — Fr kernels must
        # stay canonical.
        if 4 * self.modulus >= 1 << (LIMB_BITS * self.L):
            raise ValueError(
                "lazy domain requires 4N < 2^(16L); not satisfied for "
                f"modulus ~2^{self.modulus.bit_length()}"
            )

    def mul_lazy(self, a, b):
        """Montgomery product over [0, 2N) representatives.

        Two structural savings vs `mul`: the first carry resolution only
        covers the LOW half of the product columns (the value mod R is
        all `m` needs; the final carry consumes the raw high columns,
        whose sums stay under the 2^26 carry bound), and the trailing
        conditional subtract is dropped entirely."""
        self._check_lazy_ok()
        if not self._use_wide():
            return self._mul_rolled(a, b)  # canonical: a valid [0,2N) rep
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        acc = self._acc_products(a, b, 2 * L, truncate=False)
        t_lo = self._carry(jax.lax.slice_in_dim(acc, 0, L, axis=0))
        m = self._carry(
            self._acc_products(
                t_lo, self._bshape(self.nprime_limbs, a.ndim), L,
                truncate=True,
            )
        )
        mn = self._acc_products(m, self._bshape(self.mod_limbs, a.ndim),
                                2 * L, truncate=False)
        u = self._carry_wide(mn + acc)
        return jax.lax.slice_in_dim(u, L, 2 * L, axis=0)

    def square_lazy(self, a):
        """mul_lazy(a, a) via the symmetric product pass."""
        self._check_lazy_ok()
        if not self._use_wide():
            return self._mul_rolled(a, a)
        L = self.L
        acc = self._acc_square(a, 2 * L)
        t_lo = self._carry(jax.lax.slice_in_dim(acc, 0, L, axis=0))
        m = self._carry(
            self._acc_products(
                t_lo, self._bshape(self.nprime_limbs, a.ndim), L,
                truncate=True,
            )
        )
        mn = self._acc_products(m, self._bshape(self.mod_limbs, a.ndim),
                                2 * L, truncate=False)
        u = self._carry_wide(mn + acc)
        return jax.lax.slice_in_dim(u, L, 2 * L, axis=0)

    def is_zero_lazy(self, a):
        """Value == 0 for padded-lazy representatives ({0, N, 2N} forms)."""
        mod = self._bshape(self.mod_limbs, a.ndim)
        mod2 = self._bshape(self.mod2_limbs, a.ndim)
        return (jnp.all(a == 0, axis=0) | jnp.all(a == mod, axis=0)
                | jnp.all(a == mod2, axis=0))

    def canonicalize(self, a):
        """Padded-lazy representative (< 2N + 2^(16(L-1))) -> [0, N)."""
        return self._cond_sub_mod(self._cond_sub_mod2(a))

    # -- Montgomery domain conversions --------------------------------------

    @partial(jax.jit, static_argnums=0)
    def to_mont(self, a):
        return self.mul(a, self._bshape(self.r2_limbs, a.ndim))

    @partial(jax.jit, static_argnums=0)
    def from_mont(self, a):
        """mont_reduce(a): multiply by 1 in Montgomery semantics."""
        if not self._use_wide():
            wide = self._place(a, 0, 2 * self.L)
            return self._cond_sub_mod(self._carry(self._redc_rolled(wide)))
        L = self.L
        m = self._carry(
            self._acc_products(
                a, self._bshape(self.nprime_limbs, a.ndim), L, truncate=True
            )
        )
        mn = self._acc_products(m, self._bshape(self.mod_limbs, a.ndim), 2 * L,
                                truncate=False)
        pad = jnp.zeros((L,) + a.shape[1:], jnp.uint32)
        u = self._carry(mn + jnp.concatenate([a, pad], axis=0))
        return self._cond_sub_mod(u[L:])

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

        0 maps to 0 (callers guard).  Fully parallel over the batch.
        """
        return self.pow_const(a, self.modulus - 2)

    @partial(jax.jit, static_argnums=(0, 2))
    def batch_inv(self, z, chunk: int = 64):
        """Montgomery batch inversion over the last axis; 0 maps to 0.

        The per-lane Fermat chain (~2x bit-length muls per lane) is the
        right shape for a few thousand lanes but not for a million (the
        worker_open eval-form quotient at T=2^20): lanes are folded
        `chunk` at a time with two mul scans, and only the 1/chunk-sized
        chunk totals pay the Fermat chain — ~(2*chunk + bits/chunk) muls
        per lane instead of ~2*bits.
        """
        n = z.shape[-1]
        pad = (-n) % chunk
        zero = self.is_zero(z)
        one = self.broadcast_const(self.one_mont, z.shape[1:])
        zz = jnp.where(zero[None], one, z)
        if pad:
            cfg = [(0, 0)] * (zz.ndim - 1) + [(0, pad)]
            zz = jnp.pad(zz, cfg, constant_values=0)
            zz = zz.at[..., n:].set(
                jnp.broadcast_to(one[..., :1], zz[..., n:].shape))
        g = (n + pad) // chunk
        zc = jnp.moveaxis(
            zz.reshape(zz.shape[:-1] + (g, chunk)), -1, 0
        )  # [chunk, L, ..., g]

        def fwd(carry, zi):
            return self.mul(carry, zi), carry  # exclusive prefix products

        ones_g = self.broadcast_const(self.one_mont, zc.shape[2:])
        tot, pre = jax.lax.scan(fwd, ones_g, zc)
        tot_inv = self.inv(tot)  # Fermat on g lanes only

        def bwd(carry, args):
            zi, pre_i = args
            return self.mul(carry, zi), self.mul(carry, pre_i)

        _, invs = jax.lax.scan(bwd, tot_inv, (zc, pre), reverse=True)
        out = jnp.moveaxis(invs, 0, -1).reshape(zz.shape)[..., :n]
        return jnp.where(zero[None], 0, out)


FR = Field(R, FR_LIMBS)
FP = Field(P, FP_LIMBS)


# -- Pallas support: constants as kernel operands ---------------------------

_CONST_FIELDS = ("mod_limbs", "nprime_limbs", "compl_mod", "one_mont",
                 "r2_limbs", "one0", "mod2_limbs", "compl_mod2",
                 "mod4_limbs")


def packed_consts(field: Field) -> np.ndarray:
    """Stack the field's [L] constants into one [len(_CONST_FIELDS), L]
    operand, so Pallas kernels can receive them as an input (Mosaic
    rejects captured array constants)."""
    return np.stack([getattr(field, n) for n in _CONST_FIELDS])


def with_consts(field: Field, packed, rolled: bool = False) -> Field:
    """A shallow view of `field` whose constants are rows of `packed`
    (traced values inside a kernel).  Only the non-jitted method internals
    may be used on the view.

    rolled=True switches the view to the small-graph fori_loop
    formulation — used when a kernel runs under the Pallas *interpreter*
    (tests), where the wide formulation's giant HLO graph makes CPU XLA
    compiles pathological (~8 min per kernel).  The wide formulas
    themselves are covered bit-exactly by test_field_ops.
    """
    import copy

    fv = copy.copy(field)
    for i, n in enumerate(_CONST_FIELDS):
        setattr(fv, n, jax.lax.index_in_dim(packed, i, axis=0, keepdims=False))
    if rolled:
        fv.force_rolled = True  # interpreter: jnp.pad etc. are all legal
    else:
        fv.emb_concat = True  # Mosaic kernels cannot lower jnp.pad
    return fv
