"""Setup/precompute file persistence.

The **setup file** format is byte-compatible with the reference
(PianoSettings::save_setup_to_file / load_setup_from_file, reference
src/engine/piano.rs:649-846):

    g                                 48B compressed | 96B uncompressed G1
    u64-LE len, g_tau_x[len]          G1 array
    u64-LE len, g_tau_y[len]          G1 array
    u64-LE rows, u64-LE cols, U[r][c] G1 matrix, row-major
    g2, g2_tau_x, g2_tau_y            96B | 192B G2 each

There is no compression marker in the file; the caller must know
(reference src/engine/piano.rs:645-648).

The **precompute file** holds BGMW-style window tables.  The reference's
table layout comes from the external kzg crate and is tied to its CPU
BGMW internals; ours is the TPU device layout (documented here:
an .npz with canonical-form coordinate limb arrays), preserving the
*semantics* — persist precomputations so server start can skip
regeneration (reference src/engine/piano.rs:105-116).
"""

from __future__ import annotations

import io as _io
import struct

import numpy as np

from ..ops import curve as cv
from ..ops import serialize as ser
from ..ops.curve import G1Aff
from ..ops.field import FP
from ..refimpl import curve as rc


def _g1_single_bytes(pt, compressed: bool) -> bytes:
    return rc.g1_to_bytes(pt) if compressed else rc.g1_serialize(pt)


def _g2_single_bytes(pt, compressed: bool) -> bytes:
    return rc.g2_to_bytes(pt) if compressed else rc.g2_serialize(pt)


def save_setup(settings, path: str, compressed: bool) -> None:
    from ..models.piano import PianoSettings  # noqa: F401 (type only)

    with open(path, "wb") as f:
        f.write(_g1_single_bytes(settings.g, compressed))

        def write_array(aff: G1Aff):
            n = aff.x.shape[-1]
            f.write(struct.pack("<Q", n))
            f.write(ser.g1_encode_batch(aff, compressed))

        write_array(settings.g_tau_x)
        write_array(settings.g_tau_y)

        m = settings.u.x.shape[1]
        t = settings.u.x.shape[2]
        f.write(struct.pack("<Q", m))
        f.write(struct.pack("<Q", t))
        flat = G1Aff(
            settings.u.x.reshape(settings.u.x.shape[0], m * t),
            settings.u.y.reshape(settings.u.y.shape[0], m * t),
            settings.u.inf.reshape(m * t),
        )
        f.write(ser.g1_encode_batch(flat, compressed))

        f.write(_g2_single_bytes(settings.g2, compressed))
        f.write(_g2_single_bytes(settings.g2_tau_x, compressed))
        f.write(_g2_single_bytes(settings.g2_tau_y, compressed))


def load_setup(path: str, compressed: bool):
    from ..models.piano import PianoSettings

    g1_size = 48 if compressed else 96
    g2_size = 96 if compressed else 192
    g1_parse = rc.g1_from_bytes if compressed else rc.g1_deserialize
    g2_parse = rc.g2_from_bytes if compressed else rc.g2_deserialize

    with open(path, "rb") as f:
        g = g1_parse(f.read(g1_size))

        def read_array(n: int) -> G1Aff:
            return ser.g1_decode_batch(f.read(n * g1_size), compressed)

        (n_x,) = struct.unpack("<Q", f.read(8))
        g_tau_x = read_array(n_x)
        (n_y,) = struct.unpack("<Q", f.read(8))
        g_tau_y = read_array(n_y)
        (rows,) = struct.unpack("<Q", f.read(8))
        (cols,) = struct.unpack("<Q", f.read(8))
        u_flat = read_array(rows * cols)
        u = G1Aff(
            u_flat.x.reshape(u_flat.x.shape[0], rows, cols),
            u_flat.y.reshape(u_flat.y.shape[0], rows, cols),
            u_flat.inf.reshape(rows, cols),
        )
        g2 = g2_parse(f.read(g2_size))
        g2_tau_x = g2_parse(f.read(g2_size))
        g2_tau_y = g2_parse(f.read(g2_size))

    return PianoSettings(
        g=g,
        g_tau_x=g_tau_x,
        g_tau_y=g_tau_y,
        u=u,
        g2=g2,
        g2_tau_x=g2_tau_x,
        g2_tau_y=g2_tau_y,
        g_tau_y_host=cv.jac_to_int_points(cv.from_affine(g_tau_y)),
    )


# -- precompute (implementation-defined format, see module docstring) --------

def _aff_to_arrays(aff: G1Aff | None):
    if aff is None:
        return None
    # chunked: a scale-20 BGMW table is 2^24 lanes — whole-array
    # from_mont OOMs the device (ops.serialize.from_mont_np)
    return (
        ser.from_mont_np(aff.x),
        ser.from_mont_np(aff.y),
        np.asarray(aff.inf),
    )


def _aff_from_arrays(x, y, inf) -> G1Aff:
    import jax.numpy as jnp

    return G1Aff(
        ser.to_mont_device(x), ser.to_mont_device(y), jnp.asarray(inf)
    )


def save_precompute(pc, path: str) -> None:
    arrays: dict[str, np.ndarray] = {"c": np.array([pc.c if pc else 0])}
    if pc is not None:
        if pc.g1_tau_y is not None:
            x, y, i = _aff_to_arrays(pc.g1_tau_y)
            arrays.update(gy_x=x, gy_y=y, gy_inf=i)
        arrays["n_rows"] = np.array([len(pc.u_rows)])
        for k, row in enumerate(pc.u_rows):
            if row is not None:
                x, y, i = _aff_to_arrays(row)
                arrays.update({f"u{k}_x": x, f"u{k}_y": y, f"u{k}_inf": i})
    buf = _io.BytesIO()
    np.savez(buf, **arrays)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_precompute(path: str):
    from ..models.piano import PianoPrecompute

    with np.load(path) as z:
        c = int(z["c"][0])
        g1_tau_y = None
        if "gy_x" in z:
            g1_tau_y = _aff_from_arrays(z["gy_x"], z["gy_y"], z["gy_inf"])
        n_rows = int(z["n_rows"][0]) if "n_rows" in z else 0
        u_rows = []
        for k in range(n_rows):
            if f"u{k}_x" in z:
                u_rows.append(
                    _aff_from_arrays(z[f"u{k}_x"], z[f"u{k}_y"], z[f"u{k}_inf"])
                )
            else:
                u_rows.append(None)
    return PianoPrecompute(c=c, g1_tau_y=g1_tau_y, u_rows=u_rows)
