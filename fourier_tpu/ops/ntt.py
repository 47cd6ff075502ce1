"""Radix-2 NTT/INTT over Fr on TPU.

TPU-native replacement for rust-kzg's FsFFTSettings::fft_fr (used by the
reference's PianoFFTSettings, src/engine/piano.rs:1096-1103):

- the element axis is minor-most, so every butterfly stage is one batched
  field multiply of width n/2 filling the VPU lanes;
- stages are a static Python loop (log2 n stages traced once under jit),
  twiddles are per-stage Montgomery-form constants;
- natural order in/out (c-kzg convention: out[k] = f(w^k)), inverse scales
  by n^-1, matching the reference semantics bit-for-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FR_LIMBS, R, root_of_unity
from .field import FR
from .limbs import ints_to_vec


def _bit_reverse_indices(scale: int) -> np.ndarray:
    n = 1 << scale
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for _ in range(scale):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev


class NTTDomain:
    """NTT domain of size 2^scale over Fr (Montgomery-form values)."""

    def __init__(self, scale: int):
        self.scale = scale
        self.n = 1 << scale
        self.w = root_of_unity(scale)
        self.w_inv = pow(self.w, -1, R) if scale > 0 else 1
        self.n_inv_mont = ints_to_vec(
            [pow(self.n, -1, R) * FR.mont_r % R], FR_LIMBS
        )  # [L, 1]
        self.bitrev = _bit_reverse_indices(scale)
        # Per-stage twiddles in Montgomery form, stage s has 2^(s-1) factors
        self.twiddles = []
        self.twiddles_inv = []
        for s in range(1, scale + 1):
            h = 1 << (s - 1)
            step = self.n >> s
            tw = [pow(self.w, k * step, R) * FR.mont_r % R for k in range(h)]
            twi = [pow(self.w_inv, k * step, R) * FR.mont_r % R for k in range(h)]
            self.twiddles.append(ints_to_vec(tw, FR_LIMBS))      # [L, h]
            self.twiddles_inv.append(ints_to_vec(twi, FR_LIMBS))

    def _stages(self, x, twiddles):
        """Iterative DIT butterflies; x is [L, ..., n] bit-reversed input."""
        L = x.shape[0]
        lead = x.shape[:-1]
        for s in range(1, self.scale + 1):
            m = 1 << s
            h = m >> 1
            tw = twiddles[s - 1]
            xb = x.reshape(lead + (self.n // m, m))
            u = xb[..., :h]
            v = xb[..., h:]
            twb = tw.reshape((L,) + (1,) * (xb.ndim - 2) + (h,))
            t = FR.mul(v, twb)
            x = jnp.concatenate([FR.add(u, t), FR.sub(u, t)], axis=-1)
            x = x.reshape(lead + (self.n,))
        return x

    @partial(jax.jit, static_argnums=(0, 2))
    def ntt(self, x, inverse: bool = False):
        """NTT/INTT along the minor axis; x is uint32[L, ..., n], Montgomery.

        Forward: out[k] = f(w^k) for the coefficient vector f, natural order.
        Inverse: exact inverse including the 1/n scaling.
        """
        if x.shape[-1] != self.n:
            raise ValueError(f"minor axis {x.shape[-1]} != domain size {self.n}")
        if self.scale == 0:
            return x
        x = jnp.take(x, jnp.asarray(self.bitrev), axis=-1)
        out = self._stages(x, self.twiddles_inv if inverse else self.twiddles)
        if inverse:
            ninv = self.n_inv_mont.reshape(
                (x.shape[0],) + (1,) * (x.ndim - 1)
            )
            out = FR.mul(out, ninv)
        return out


_domains: dict[int, NTTDomain] = {}


def get_domain(scale: int) -> NTTDomain:
    if scale not in _domains:
        _domains[scale] = NTTDomain(scale)
    return _domains[scale]
