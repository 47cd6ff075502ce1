"""Piano protocol tests, mirroring the reference's pyramid
(SURVEY.md §4; reference src/engine/piano.rs:1138-1956):

- setup shape checks (test_piano_setup)
- commit == naive MSM (manual_commit_test)
- distributed eval == direct bivariate eval (poly_reconstruction_test)
- full worker->master commit/open/verify sweep (pianist_test)
- degraded operation with inactive workers (partial_commit_test)
- adversarial behavior (test_fake_poly) and the vacuous-proof edge case
  (test_verify_default)
- setup/precompute persistence round trips (test_save_and_load_*)
"""

import os

import pytest

from fourier_tpu.constants import R
from fourier_tpu.models.bipoly import BivariatePolynomial
from fourier_tpu.models.piano import (
    PianoBackend,
    PianoFFTSettings,
    PianoPrecompute,
    SetupConfig,
    generate_trusted_setup,
)
from fourier_tpu.ops import curve as cv
from fourier_tpu.refimpl import curve as rc
from fourier_tpu.refimpl import poly as rpoly

SECRETS = (b"\x01" * 32, b"\x02" * 32)


def _make_backend(n: int, m: int) -> PianoBackend:
    fft = PianoFFTSettings(n, m)
    settings = generate_trusted_setup(fft, SECRETS)
    settings.precompute = PianoPrecompute.generate(settings)
    return PianoBackend(fft, settings)


def _random_rows(backend, rng):
    return [
        [rng.randrange(R) for _ in range(backend.fft.T)]
        for _ in range(backend.fft.M)
    ]


def _ground_truth_bipoly(backend, rows) -> BivariatePolynomial:
    """Lagrange-basis rows -> standard-basis bivariate coefficients."""
    m, t = backend.fft.m, backend.fft.t
    # IFFT each row along X, then IFFT along Y
    x_coeffs = [rpoly.ntt(row, t, inverse=True) for row in rows]
    y_major = list(zip(*x_coeffs))  # [T][M] columns
    y_coeffs = [rpoly.ntt(list(col), m, inverse=True) for col in y_major]
    # y_coeffs[b][a] = coeff of y^a x^b -> rows indexed by y power
    out_rows = [[y_coeffs[b][a] for b in range(1 << t)] for a in range(1 << m)]
    return BivariatePolynomial(out_rows)


def test_piano_setup():
    backend = _make_backend(4, 2)
    s = backend.settings
    assert s.u.x.shape[1:] == (4, 4)
    assert s.g_tau_x.x.shape[-1] == 4
    assert s.g_tau_y.x.shape[-1] == 4
    assert s.g == rc.G1_GEN
    assert rc.g2_is_on_curve(s.g2_tau_x)
    # U_{0,0} = g^{R_0(tau_y) L_0(tau_x)}
    from fourier_tpu.refimpl.field import hash_to_bls_field

    tau_x = hash_to_bls_field(SECRETS[0])
    tau_y = hash_to_bls_field(SECRETS[1])
    r0 = rpoly.poly_eval(rpoly.lagrange_poly(0, 2), tau_y)
    l0 = rpoly.poly_eval(rpoly.lagrange_poly(0, 2), tau_x)
    expect = rc.g1_mul(rc.G1_GEN, r0 * l0 % R)
    u00 = cv.jac_to_int_points(
        cv.from_affine(backend.settings.u_row(0))
    )[0]
    assert u00 == expect


def test_manual_commit(rng):
    """worker_commit == naive fold over the U row (manual_commit_test)."""
    backend = _make_backend(4, 1)
    coeffs = [rng.randrange(R) for _ in range(backend.fft.T)]
    got = backend.worker_commit(0, coeffs)
    u_row = cv.jac_to_int_points(cv.from_affine(backend.settings.u_row(0)))
    assert got == rc.g1_msm(u_row, coeffs)


def test_poly_reconstruction(rng):
    """Distributed evaluation equals direct bivariate evaluation."""
    backend = _make_backend(4, 2)
    rows = _random_rows(backend, rng)
    gt = _ground_truth_bipoly(backend, rows)
    alpha, beta = rng.randrange(R), rng.randrange(R)

    evals = []
    for i in range(backend.fft.M):
        y, _ = backend.worker_open(i, rows[i], alpha)
        evals.append(y)
    z, _ = backend.master_open(evals, [None] * len(evals), beta)
    assert z == gt.eval(alpha, beta)


# n in 2..8 like the reference sweep (piano.rs:1604-1722); m covers both
# edges (1 and n-1) for every n plus interior points — the full m
# cross-product at every n adds compile shapes without new code paths.
@pytest.mark.parametrize(
    "n,m",
    [(2, 1)]
    + [(n, m) for n in range(3, 9) for m in (1, n - 1)]
    + [(6, 2), (6, 3), (8, 4)],
)
def test_pianist(n, m, rng):
    """Full protocol sweep (pianist_test, reference piano.rs:1604-1722)."""
    backend = _make_backend(n, m)
    rows = _random_rows(backend, rng)
    gt = _ground_truth_bipoly(backend, rows)
    alpha, beta = rng.randrange(R), rng.randrange(R)

    commitments, evals, proofs = [], [], []
    for i in range(backend.fft.M):
        com = backend.worker_commit(i, rows[i])
        y, pi = backend.worker_open(i, rows[i], alpha)
        assert backend.worker_verify(i, com, alpha, y, pi), f"worker {i}"
        commitments.append(com)
        evals.append(y)
        proofs.append(pi)

    master_com = backend.master_commit(commitments)
    z, master_pi = backend.master_open(evals, proofs, beta)
    assert z == gt.eval(alpha, beta)
    assert backend.master_verify(master_com, beta, alpha, z, master_pi)
    # wrong point must fail
    assert not backend.master_verify(master_com, beta, alpha, (z + 1) % R, master_pi)


def test_open_alpha_in_domain(rng):
    """alpha on the evaluation domain takes the coefficient-basis fallback."""
    backend = _make_backend(4, 1)
    rows = _random_rows(backend, rng)
    alpha = backend.fft.left_roots[3]  # w^3: in-domain point
    com = backend.worker_commit(0, rows[0])
    y, pi = backend.worker_open(0, rows[0], alpha)
    assert y == rows[0][3]  # f(w^3) is the Lagrange coefficient itself
    assert backend.worker_verify(0, com, alpha, y, pi)


def test_partial_commit(rng):
    """Inactive machines contribute identity/zero and the aggregate still
    verifies (partial_commit_test, reference piano.rs:1726-1787)."""
    backend = _make_backend(4, 2)
    rows = _random_rows(backend, rng)
    active = [0, 2]
    alpha, beta = rng.randrange(R), rng.randrange(R)

    commitments, evals, proofs = [], [], []
    for i in range(backend.fft.M):
        if i in active:
            commitments.append(backend.worker_commit(i, rows[i]))
            y, pi = backend.worker_open(i, rows[i], alpha)
        else:
            commitments.append(None)  # FsG1::default() analog
            y, pi = 0, None
        evals.append(y)
        proofs.append(pi)

    master_com = backend.master_commit(commitments)
    z, master_pi = backend.master_open(evals, proofs, beta)
    assert backend.master_verify(master_com, beta, alpha, z, master_pi)


def test_fake_poly(rng):
    """A lying worker passes iff the verifier trusts the worker-supplied
    eval — documents the security model (test_fake_poly, piano.rs:1898-1955)."""
    backend = _make_backend(4, 1)
    honest = _random_rows(backend, rng)[0]
    fake = _random_rows(backend, rng)[0]
    alpha = rng.randrange(R)

    com_honest = backend.worker_commit(0, honest)
    com_fake = backend.worker_commit(0, fake)
    y_fake, pi_fake = backend.worker_open(0, fake, alpha)

    # proof for the fake poly against the honest commitment must fail
    assert not backend.worker_verify(0, com_honest, alpha, y_fake, pi_fake)
    # but is self-consistent against the fake commitment
    assert backend.worker_verify(0, com_fake, alpha, y_fake, pi_fake)


def test_verify_default(rng):
    """Identity commitment + zero eval + identity proof verifies — the
    vacuous-proof edge case (test_verify_default, piano.rs:1392-1412)."""
    backend = _make_backend(2, 1)
    alpha = rng.randrange(R)
    assert backend.worker_verify(0, None, alpha, 0, None)


def test_save_and_load_setup(tmp_path, rng):
    backend = _make_backend(4, 2)
    from fourier_tpu.runtime import io as rio

    for compressed in (True, False):
        path = str(tmp_path / f"setup_{compressed}")
        rio.save_setup(backend.settings, path, compressed)
        loaded = rio.load_setup(path, compressed)
        for name in ("g_tau_x", "g_tau_y"):
            a = cv.jac_to_int_points(cv.from_affine(getattr(backend.settings, name)))
            b = cv.jac_to_int_points(cv.from_affine(getattr(loaded, name)))
            assert a == b, name
        assert loaded.g == backend.settings.g
        assert loaded.g2_tau_x == backend.settings.g2_tau_x
        assert loaded.g2_tau_y == backend.settings.g2_tau_y
        # recommitting with the loaded SRS reproduces commitments
        loaded.precompute = None
        lb = PianoBackend(backend.fft, loaded)
        coeffs = [rng.randrange(R) for _ in range(backend.fft.T)]
        assert lb.worker_commit(1, coeffs) == backend.worker_commit(1, coeffs)


def test_save_and_load_precompute(tmp_path, rng):
    backend = _make_backend(4, 2)
    from fourier_tpu.runtime import io as rio

    path = str(tmp_path / "precompute")
    rio.save_precompute(backend.settings.precompute, path)
    loaded = rio.load_precompute(path)
    assert loaded.c == backend.settings.precompute.c
    assert len(loaded.u_rows) == len(backend.settings.precompute.u_rows)
    # commitments via loaded tables match (test_save_and_load_precompute,
    # reference piano.rs:1842-1875)
    coeffs = [rng.randrange(R) for _ in range(backend.fft.T)]
    original = backend.worker_commit(0, coeffs)
    backend.settings.precompute = loaded
    assert backend.worker_commit(0, coeffs) == original


def test_bipoly_algebra(rng):
    """add/mul/scale surface of the bivariate oracle (reference
    src/bipoly.rs:36-124): checked pointwise — algebra on coefficients
    must commute with evaluation."""
    def rand_poly(h, w):
        return BivariatePolynomial(
            [[rng.randrange(R) for _ in range(w)] for _ in range(h)]
        )

    a = rand_poly(3, 4)
    b = rand_poly(2, 5)
    k = rng.randrange(R)
    for _ in range(4):
        x, y = rng.randrange(R), rng.randrange(R)
        assert a.add(b).eval(x, y) == (a.eval(x, y) + b.eval(x, y)) % R
        assert a.mul(b).eval(x, y) == a.eval(x, y) * b.eval(x, y) % R
        assert a.scale(k).eval(x, y) == k * a.eval(x, y) % R
        assert BivariatePolynomial.zero().eval(x, y) == 0
        # partial evaluations agree with the full one
        from fourier_tpu.refimpl.poly import poly_eval
        assert poly_eval(a.eval_x(x), y) == a.eval(x, y)
        assert poly_eval(a.eval_y(y), x) == a.eval(x, y)
