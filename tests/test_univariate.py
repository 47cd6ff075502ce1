"""Legacy univariate KZG surface (the reference's documented L2' API)."""

from fourier_tpu.constants import R
from fourier_tpu.models.piano import PianoFFTSettings, generate_trusted_setup
from fourier_tpu.models.univariate import UnivariateKZG
from fourier_tpu.refimpl import poly as rpoly


def test_univariate_commit_open_verify(rng):
    fft = PianoFFTSettings(5, 1)  # T = 16
    settings = generate_trusted_setup(fft, (b"\x07" * 32, b"\x08" * 32))
    kzg = UnivariateKZG(settings, fft)

    coeffs = [rng.randrange(R) for _ in range(16)]
    x = rng.randrange(R)
    com = kzg.commit_to_poly(coeffs)
    y, proof = kzg.compute_proof_single(coeffs, x)
    assert y == rpoly.poly_eval(coeffs, x)
    assert kzg.verify_proof_single(com, x, y, proof)
    assert not kzg.verify_proof_single(com, x, (y + 1) % R, proof)
