"""Native C++ wire marshalling vs the Python reference paths."""

import base64

import numpy as np
import pytest

from fourier_tpu import native
from fourier_tpu.constants import R
from fourier_tpu.ops.limbs import limbs_to_ints
from fourier_tpu.refimpl.field import fr_to_bytes


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_decode_scalars(lib, rng):
    vals = [rng.randrange(R) for _ in range(100)] + [0, 1, R - 1]
    strs = [
        base64.b64encode(fr_to_bytes(v)).decode().rstrip("=") for v in vals
    ]
    limbs = native.decode_scalars_b64(strs, int(R).to_bytes(32, "big"), 16)
    assert limbs_to_ints(limbs) == vals


def test_decode_rejects_noncanonical(lib):
    bad = base64.b64encode(int(R).to_bytes(32, "big")).decode().rstrip("=")
    with pytest.raises(ValueError):
        native.decode_scalars_b64([bad], int(R).to_bytes(32, "big"), 16)


def test_decode_rejects_malformed(lib):
    with pytest.raises(ValueError):
        native.decode_scalars_b64(["@@@@"], int(R).to_bytes(32, "big"), 16)


def test_encode_b64(lib, rng):
    raw = np.frombuffer(
        b"".join(fr_to_bytes(rng.randrange(R)) for _ in range(50)), np.uint8
    ).reshape(50, 32)
    got = native.encode_b64_batch(raw)
    expect = [
        base64.b64encode(raw[i].tobytes()).decode().rstrip("=") for i in range(50)
    ]
    assert got == expect


def test_server_parse_uses_native(lib, rng):
    from fourier_tpu.runtime.server import _parse_poly_limbs

    vals = [rng.randrange(R) for _ in range(10)]
    strs = [
        base64.b64encode(fr_to_bytes(v)).decode().rstrip("=") for v in vals
    ]
    out = _parse_poly_limbs(strs)
    assert limbs_to_ints(out.T) == vals
