"""Vectorized ZCash-format point serialization for device batches.

The wire and setup-file formats are blst's encodings (48B compressed /
96B uncompressed G1; see refimpl.curve for the scalar/spec-level rules
and the reference's usage at src/engine/piano.rs:649-846).  The reference
deserializes arrays with a chunked parallel reader (kzg::io_utils::
batch_reader); the TPU-native equivalent is numpy-vectorized byte
marshalling plus *device-batched* curve math for the expensive parts:
square roots when decompressing and on-curve checks when validating.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import FP_LIMBS, P
from .curve import G1Aff
from .field import FP
from .limbs import bytes_be_to_limbs, int_to_limbs, limbs_to_bytes_be

_COMPRESSED_FLAG = 0x80
_INFINITY_FLAG = 0x40
_SIGN_FLAG = 0x20

# threshold for "lexicographically largest y": y >= (p+1)/2
_Y_THRESHOLD = int_to_limbs((P + 1) // 2, FP_LIMBS).astype(np.int64)
_SQRT_EXP = (P + 1) // 4


def _np_geq(a: np.ndarray, thresh: np.ndarray) -> np.ndarray:
    """Lexicographic a >= thresh for [n, L] little-endian limb rows."""
    diff = a.astype(np.int64) - thresh[None, :]
    rev = diff[:, ::-1]
    nz = rev != 0
    idx = np.argmax(nz, axis=1)
    top = np.take_along_axis(rev, idx[:, None], axis=1)[:, 0]
    return np.where(nz.any(axis=1), top > 0, True)


_CHUNK = 1 << 18  # lanes per device dispatch for whole-array conversions


def from_mont_np(coord) -> np.ndarray:
    """Montgomery device [L, n] -> canonical numpy [L, n], chunked.

    Whole-array from_mont on a multi-million-lane table allocates ~20
    1.5 GB HLO temps at scale 20 (device OOM); slicing bounds the live
    set to one chunk."""
    n = coord.shape[-1]
    if n <= _CHUNK:
        return np.asarray(FP.from_mont(coord))
    out = np.empty(coord.shape, np.uint32)
    for lo in range(0, n, _CHUNK):
        out[..., lo:lo + _CHUNK] = np.asarray(
            FP.from_mont(coord[..., lo:lo + _CHUNK])
        )
    return out


def to_mont_device(arr_np):
    """Canonical numpy [L, n] -> Montgomery device [L, n], chunked."""
    import jax.numpy as jnp

    n = arr_np.shape[-1]
    if n <= _CHUNK:
        return FP.to_mont(jnp.asarray(arr_np))
    parts = [
        FP.to_mont(jnp.asarray(arr_np[..., lo:lo + _CHUNK]))
        for lo in range(0, n, _CHUNK)
    ]
    return jnp.concatenate(parts, axis=-1)


def _canonical_np(aff_coord) -> np.ndarray:
    """Montgomery device [L, n] -> canonical numpy [n, L]."""
    return from_mont_np(aff_coord).T


def g1_encode_batch(aff: G1Aff, compressed: bool) -> bytes:
    """Encode a device affine batch to concatenated 48B/96B encodings."""
    x = _canonical_np(aff.x)
    y = _canonical_np(aff.y)
    inf = np.asarray(aff.inf).reshape(-1)
    n = x.shape[0]
    if compressed:
        out = np.frombuffer(
            limbs_to_bytes_be(x, 48), np.uint8
        ).reshape(n, 48).copy()
        larger = _np_geq(y, _Y_THRESHOLD)
        out[:, 0] |= _COMPRESSED_FLAG
        out[larger, 0] |= _SIGN_FLAG
        out[inf] = 0
        out[inf, 0] = _COMPRESSED_FLAG | _INFINITY_FLAG
    else:
        xb = np.frombuffer(limbs_to_bytes_be(x, 48), np.uint8).reshape(n, 48)
        yb = np.frombuffer(limbs_to_bytes_be(y, 48), np.uint8).reshape(n, 48)
        out = np.concatenate([xb, yb], axis=1).copy()
        out[inf] = 0
        out[inf, 0] = _INFINITY_FLAG
    return out.tobytes()


def g1_decode_batch(data: bytes, compressed: bool, check_curve: bool = True) -> G1Aff:
    """Decode concatenated encodings into a device affine batch.

    Raises ValueError on malformed flags, non-canonical coordinates, or
    off-curve points (matching blst_p1_uncompress/deserialize behavior
    behind FsG1::from_bytes/deserialize).  Chunked above _CHUNK points:
    the compressed path's batched square root is ~380 sequential muls
    whose one-dispatch form at 2^20 lanes has crashed the TPU worker.
    """
    size = 48 if compressed else 96
    n_total = len(data) // size
    if n_total > _CHUNK:
        parts = [
            g1_decode_batch(data[lo * size:(lo + _CHUNK) * size],
                            compressed, check_curve)
            for lo in range(0, n_total, _CHUNK)
        ]
        return G1Aff(
            jnp.concatenate([p.x for p in parts], axis=-1),
            jnp.concatenate([p.y for p in parts], axis=-1),
            jnp.concatenate([p.inf for p in parts], axis=-1),
        )
    raw = np.frombuffer(data, np.uint8)
    if raw.size % size:
        raise ValueError(f"data size {raw.size} not a multiple of {size}")
    rows = raw.reshape(-1, size).copy()
    n = rows.shape[0]
    flags = rows[:, 0].copy()
    inf = (flags & _INFINITY_FLAG) != 0
    sign = (flags & _SIGN_FLAG) != 0
    has_comp = (flags & _COMPRESSED_FLAG) != 0
    if compressed:
        if not has_comp.all():
            raise ValueError("compressed bit not set")
        if np.any(inf & sign):
            raise ValueError("malformed infinity encoding")
    else:
        if has_comp.any():
            raise ValueError("compressed bit set on uncompressed encoding")
        if sign.any():
            # blst_p1_deserialize: the sign bit is only meaningful with the
            # compressed bit; set alone it is BLST_BAD_ENCODING.
            raise ValueError("sign bit set on uncompressed encoding")
    rows[:, 0] &= 0x1F
    # infinity rows must be all-zero beyond the flags
    if inf.any():
        body = rows[inf]
        if body.any():
            raise ValueError("malformed infinity encoding")

    if compressed:
        x = bytes_be_to_limbs(rows.tobytes(), 48, FP_LIMBS)  # [n, L]
        if (~_np_lt(x, int_to_limbs(P, FP_LIMBS)) & ~inf).any():
            raise ValueError("x is not canonical")
        xm = FP.to_mont(jnp.asarray(np.ascontiguousarray(x.T)))
        b_mont = FP.broadcast_const(
            int_to_limbs(4 * FP.mont_r % P, FP_LIMBS), (n,)
        )
        rhs = FP.add(FP.mul(FP.square(xm), xm), b_mont)     # x^3 + 4
        y = FP.pow_const(rhs, _SQRT_EXP)
        ok = FP.eq(FP.square(y), rhs) | jnp.asarray(inf)
        if not bool(jnp.all(ok)):
            raise ValueError("x is not on the curve")
        y_np = _canonical_np(y)
        larger = _np_geq(y_np, _Y_THRESHOLD)
        flip = (larger != sign) & ~inf
        y = FP.select(jnp.asarray(flip), FP.neg(y), y)
        return G1Aff(xm, y, jnp.asarray(inf))

    xb = rows[:, :48]
    yb = rows[:, 48:]
    x = bytes_be_to_limbs(xb.tobytes(), 48, FP_LIMBS)
    yl = bytes_be_to_limbs(yb.tobytes(), 48, FP_LIMBS)
    p_lim = int_to_limbs(P, FP_LIMBS)
    if ((~_np_lt(x, p_lim) | ~_np_lt(yl, p_lim)) & ~inf).any():
        raise ValueError("coordinate is not canonical")
    xm = FP.to_mont(jnp.asarray(np.ascontiguousarray(x.T)))
    ym = FP.to_mont(jnp.asarray(np.ascontiguousarray(yl.T)))
    if check_curve:
        b_mont = FP.broadcast_const(
            int_to_limbs(4 * FP.mont_r % P, FP_LIMBS), (n,)
        )
        rhs = FP.add(FP.mul(FP.square(xm), xm), b_mont)
        ok = FP.eq(FP.square(ym), rhs) | jnp.asarray(inf)
        if not bool(jnp.all(ok)):
            raise ValueError("point is not on the curve")
    return G1Aff(xm, ym, jnp.asarray(inf))


def _np_lt(a: np.ndarray, thresh: np.ndarray) -> np.ndarray:
    """Lexicographic a < thresh for [n, L] limb rows vs a [L] threshold."""
    return ~_np_geq(a, thresh)
