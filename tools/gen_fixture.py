"""Generate the pinned protocol transcript fixture (tests/fixtures/).

A fixed-secret scale-4 / machines-scale-1 backend run through the full
worker->master protocol with a fixed witness: every wire-visible value
(setup file bytes, commitments, evals, proofs, z) is recorded so the
suite can detect ANY bit-level regression in field/curve/MSM/NTT/serde
behavior — the substitute for Rust-reference-generated vectors in an
environment without cargo (SURVEY.md §4 implication).

Run:  JAX_PLATFORMS=cpu python tools/gen_fixture.py
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from fourier_tpu.models.piano import (  # noqa: E402
    PianoBackend,
    PianoFFTSettings,
    generate_trusted_setup,
)
from fourier_tpu.refimpl.field import fr_to_bytes  # noqa: E402
from fourier_tpu.refimpl.curve import g1_to_bytes  # noqa: E402
from fourier_tpu.runtime import io as rio  # noqa: E402
from fourier_tpu.runtime import wire  # noqa: E402

SECRETS = (b"\x2a" * 32, b"\x2b" * 32)
SCALE, MSCALE = 4, 1
ALPHA = 0x1234567
BETA = 0x89ABCDE


def b64g1(pt):
    return wire.b64_encode(g1_to_bytes(pt))


def b64fr(v):
    return wire.b64_encode(fr_to_bytes(v))


def main():
    fft = PianoFFTSettings(SCALE, MSCALE)
    settings = generate_trusted_setup(fft, SECRETS)
    backend = PianoBackend(fft, settings)
    m, t = fft.M, fft.T

    rows = [[(7 * i + 3 * j + 1) % (1 << 62) for j in range(t)]
            for i in range(m)]

    coms, evals, proofs = [], [], []
    for i in range(m):
        coms.append(backend.worker_commit(i, rows[i]))
        y, pi = backend.worker_open(i, rows[i], ALPHA)
        assert backend.worker_verify(i, coms[i], ALPHA, y, pi)
        evals.append(y)
        proofs.append(pi)
    master_com = backend.master_commit(coms)
    z, (pi0, pi1) = backend.master_open(evals, proofs, BETA)
    assert backend.master_verify(master_com, BETA, ALPHA, z, (pi0, pi1))

    # setup file bytes, both compressions
    import tempfile

    hashes = {}
    for comp in (True, False):
        with tempfile.NamedTemporaryFile() as f:
            rio.save_setup(settings, f.name, compressed=comp)
            hashes["setup_sha256_" + ("c" if comp else "u")] = (
                hashlib.sha256(open(f.name, "rb").read()).hexdigest()
            )

    fixture = {
        "description": "pinned full-protocol transcript, scale 4 / "
                       "machines_scale 1, fixed secrets 0x2a*32 / 0x2b*32",
        "secrets_hex": [SECRETS[0].hex(), SECRETS[1].hex()],
        "scale": SCALE,
        "machines_scale": MSCALE,
        "alpha": ALPHA,
        "beta": BETA,
        "rows": rows,
        "commitments": [b64g1(c) for c in coms],
        "evals": [b64fr(y) for y in evals],
        "proofs": [b64g1(p) for p in proofs],
        "master_commitment": b64g1(master_com),
        "z": b64fr(z),
        "pi_0": b64g1(pi0),
        "pi_1": b64g1(pi1),
        **hashes,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "protocol_transcript_s4_m1.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(fixture, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
