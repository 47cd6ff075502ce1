"""Native (C++) host-side marshalling kernels, loaded via ctypes.

Builds lazily with g++ on first import if the shared library is missing;
every entry point has a pure-numpy fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("fourier_tpu")

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "fastwire.cpp")

_lib = None


def _lib_path() -> str:
    """Shared-library path keyed on a content hash of the C++ source.

    Binaries are never committed (gitignored); a source edit changes the
    hash, so a stale build can never serve requests — unlike an mtime
    comparison, which git checkouts do not preserve.
    """
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"libfastwire-{digest}.so")


def _build(lib_path: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except Exception as e:  # no toolchain / failed build -> numpy fallback
        logger.debug("native build failed: %s", e)
        return False


def get_lib():
    """The loaded library or None (fallback mode)."""
    global _lib
    if _lib is not None:
        return _lib or None
    lib_path = _lib_path()
    if not os.path.exists(lib_path):
        if not _build(lib_path):
            _lib = False
            return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.fw_b64decode_many.restype = ctypes.c_int64
        lib.fw_decode_scalars.restype = ctypes.c_int64
        _lib = lib
    except OSError as e:
        logger.debug("native load failed: %s", e)
        _lib = False
        return None
    return _lib or None


def decode_scalars_b64(strs: list[str], modulus_be: bytes, n_limbs: int):
    """Batch base64 -> canonical-checked [n, n_limbs] uint32 limbs, or None
    if the native library is unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    data = "".join(strs).encode("ascii")
    offsets = np.zeros(len(strs) + 1, np.int64)
    np.cumsum([len(s) for s in strs], out=offsets[1:])
    out = np.empty((len(strs), n_limbs), np.uint32)
    bad = lib.fw_decode_scalars(
        data,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(strs),
        modulus_be,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n_limbs,
    )
    if bad >= 0:
        raise ValueError(f"scalar {bad} is malformed or not canonical")
    return out


def encode_b64_batch(raw: np.ndarray) -> list[str]:
    """[n, item_len] uint8 rows -> unpadded-base64 strings, or None."""
    lib = get_lib()
    if lib is None:
        return None
    n, item_len = raw.shape
    stride = (item_len * 4 + 2) // 3
    out = np.empty((n, stride), np.uint8)
    raw = np.ascontiguousarray(raw)
    lib.fw_b64encode_many(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        item_len,
        out.ctypes.data_as(ctypes.c_char_p),
        stride,
    )
    flat = out.tobytes().decode("ascii")
    return [flat[i * stride : (i + 1) * stride] for i in range(n)]
