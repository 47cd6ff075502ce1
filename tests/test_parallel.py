"""Multi-chip sharding on the 8-device virtual CPU mesh: the sharded MSM
and the full distributed prove step must be bit-identical to the
single-device protocol and verify against the host pairing checks."""

import jax
import jax.numpy as jnp
import pytest

from fourier_tpu.constants import R
from fourier_tpu.models.piano import (
    PianoBackend,
    PianoFFTSettings,
    generate_trusted_setup,
)
from fourier_tpu.ops import curve as cv
from fourier_tpu.ops.limbs import ints_to_vec, vec_to_int
from fourier_tpu.parallel.mesh import make_mesh
from fourier_tpu.parallel.msm_sharded import msm_sharded
from fourier_tpu.parallel.prove_sharded import (
    build_distributed_prove,
    prove_inputs_from_backend,
)
from fourier_tpu.refimpl.curve import G1_GEN, g1_msm, g1_mul

SECRETS = (b"\x05" * 32, b"\x06" * 32)


def test_msm_sharded_matches_naive(rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(4, axis="shard")
    n = 32
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    points = cv.affine_from_ints(pts)
    sc = jnp.asarray(ints_to_vec(scalars, 16))
    out = msm_sharded(points, sc, mesh, axis="shard")
    got = cv.jac_to_int_points(
        cv.G1Jac(out.x[..., None], out.y[..., None], out.z[..., None])
    )[0]
    assert got == g1_msm(pts, scalars)


def test_distributed_prove_with_tables(rng):
    """The SPMD prove step with BGMW-table per-worker MSMs (table_c set)
    == the single-device backend results."""
    n, m = 5, 2  # M=4 workers, T=8
    fft = PianoFFTSettings(n, m)
    settings = generate_trusted_setup(fft, SECRETS)
    backend = PianoBackend(fft, settings)

    mesh = make_mesh(4, axis="workers")
    prove = build_distributed_prove(mesh, axis="workers", table_c=8)

    rows = [
        [rng.randrange(R) for _ in range(fft.T)] for _ in range(fft.M)
    ]
    alpha, beta = rng.randrange(R), rng.randrange(R)
    args = prove_inputs_from_backend(backend, rows, alpha, beta, table_c=8)
    out = jax.block_until_ready(prove(*args))

    def pt(triple):
        return cv.jac_to_int_points(cv.G1Jac(*triple))[0]

    commits = [backend.worker_commit(i, rows[i]) for i in range(fft.M)]
    assert pt(out["master_com"]) == backend.master_commit(commits)
    evals, proofs = [], []
    for i in range(fft.M):
        y, pi = backend.worker_open(i, rows[i], alpha)
        evals.append(y)
        proofs.append(pi)
    z_ref, (pi0_ref, pi1_ref) = backend.master_open(evals, proofs, beta)
    assert vec_to_int(out["z"]) == z_ref
    assert pt(out["pi0"]) == pi0_ref
    assert pt(out["pi1"]) == pi1_ref


def test_msm_bgmw_sharded_matches_naive(rng):
    """The intra-worker sharded BGMW MSM (table axis split over chips,
    partials combined over the mesh) == the unsharded result == the
    refimpl MSM; window counts both divisible and checked."""
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.parallel.msm_fused_sharded import msm_bgmw_sharded

    mesh = make_mesh(4, axis="chips")
    n, c = 16, 8  # W = 32 windows, divisible by 4
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    points = cv.affine_from_ints(pts)
    sc = jnp.asarray(ints_to_vec(scalars, 16))
    table = msm_mod.bgmw_expand(points, c)
    out = msm_bgmw_sharded(table, sc, c, mesh, axis="chips")
    got = cv.jac_to_int_points(
        cv.G1Jac(out.x[..., None], out.y[..., None], out.z[..., None])
    )[0]
    assert got == g1_msm(pts, scalars)
    # all-equal scalars over the sharded path too (the adversarial input)
    eq = jnp.asarray(ints_to_vec([scalars[0]] * n, 16))
    out_eq = msm_bgmw_sharded(table, eq, c, mesh, axis="chips")
    got_eq = cv.jac_to_int_points(
        cv.G1Jac(out_eq.x[..., None], out_eq.y[..., None], out_eq.z[..., None])
    )[0]
    assert got_eq == g1_msm(pts, [scalars[0]] * n)


def test_msm_fused_bgmw_sharded_interpret(rng, monkeypatch):
    """The fused (Pallas) sharded BGMW path under the interpreter on the
    virtual mesh — the exact program the production multi-chip dispatch
    runs, minus Mosaic lowering."""
    import fourier_tpu.ops.pallas_curve as pc
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.parallel.msm_fused_sharded import msm_fused_bgmw_sharded

    monkeypatch.setenv("FOURIER_PALLAS", "1")
    monkeypatch.setenv("FOURIER_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(pc, "TILE", 128)
    import unittest.mock

    mesh = make_mesh(2, axis="chips")
    n, c = 16, 8  # c=8 divides SCALAR_BITS -> unsigned digits, W=32
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    points = cv.affine_from_ints(pts)
    sc = jnp.asarray(ints_to_vec(scalars, 16))
    table = msm_mod.bgmw_expand(points, c)
    packed = mf.pack_points(table)
    with unittest.mock.patch.object(mf, "BTILE", 128):
        out = msm_fused_bgmw_sharded(packed, table.inf, sc, c, mesh,
                                     axis="chips")
        got = cv.jac_to_int_points(
            cv.G1Jac(out.x[..., None], out.y[..., None], out.z[..., None])
        )[0]
    assert got == g1_msm(pts, scalars)


def test_msm_fused_bgmw_sharded_signed_interpret(rng, monkeypatch):
    """Sharded BGMW with balanced SIGNED digits (c=11 -> W=24, dynamic
    +1 bucket and negate flags cross the bucket-exchange reduction)."""
    import fourier_tpu.ops.pallas_curve as pc
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.parallel.msm_fused_sharded import msm_fused_bgmw_sharded

    monkeypatch.setenv("FOURIER_PALLAS", "1")
    monkeypatch.setenv("FOURIER_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(pc, "TILE", 128)
    import unittest.mock

    mesh = make_mesh(2, axis="chips")
    n, c = 8, 11  # signed: W = ceil(257/11) = 24, divisible by 2
    assert mf.signed_window_count(c) == -(-mf.SCALAR_BITS // c)
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    points = cv.affine_from_ints(pts)
    sc = jnp.asarray(ints_to_vec(scalars, 16))
    table = msm_mod.bgmw_expand(points, c)
    packed = mf.pack_points(table)
    with unittest.mock.patch.object(mf, "BTILE", 128):
        out = msm_fused_bgmw_sharded(packed, table.inf, sc, c, mesh,
                                     axis="chips")
        got = cv.jac_to_int_points(
            cv.G1Jac(out.x[..., None], out.y[..., None], out.z[..., None])
        )[0]
    assert got == g1_msm(pts, scalars)


def test_msm_fused_bgmw_sharded_midwindow_interpret(rng, monkeypatch):
    """Row-sliced sharding with W NOT divisible by D (c=9 -> W=29, D=2):
    shard boundaries fall mid-window, exercising that any contiguous
    row slice of the expanded table is a valid shared-bucket MSM."""
    import fourier_tpu.ops.pallas_curve as pc
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.parallel.msm_fused_sharded import msm_fused_bgmw_sharded

    monkeypatch.setenv("FOURIER_PALLAS", "1")
    monkeypatch.setenv("FOURIER_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(pc, "TILE", 128)
    import unittest.mock

    mesh = make_mesh(2, axis="chips")
    n, c = 16, 9  # signed: W = ceil(257/9) = 29, NOT divisible by 2
    assert mf.signed_window_count(c) == -(-mf.SCALAR_BITS // c)
    assert mf.signed_window_count(c) % 2 == 1
    pts = [g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    points = cv.affine_from_ints(pts)
    sc = jnp.asarray(ints_to_vec(scalars, 16))
    table = msm_mod.bgmw_expand(points, c)
    packed = mf.pack_points(table)
    with unittest.mock.patch.object(mf, "BTILE", 128):
        out = msm_fused_bgmw_sharded(packed, table.inf, sc, c, mesh,
                                     axis="chips")
        got = cv.jac_to_int_points(
            cv.G1Jac(out.x[..., None], out.y[..., None], out.z[..., None])
        )[0]
    assert got == g1_msm(pts, scalars)


@pytest.mark.parametrize("ndev", [2, 4])
def test_distributed_prove(ndev, rng):
    """Full prove round over a mesh == single-device backend results, and
    the proofs verify via the host pairing checks."""
    n, m = 5, 2  # M=4 workers, T=8
    fft = PianoFFTSettings(n, m)
    settings = generate_trusted_setup(fft, SECRETS)
    backend = PianoBackend(fft, settings)

    mesh = make_mesh(ndev, axis="workers")
    prove = build_distributed_prove(mesh, axis="workers")

    rows = [
        [rng.randrange(R) for _ in range(fft.T)] for _ in range(fft.M)
    ]
    alpha, beta = rng.randrange(R), rng.randrange(R)
    args = prove_inputs_from_backend(backend, rows, alpha, beta)
    out = jax.block_until_ready(prove(*args))

    def pt(triple):
        return cv.jac_to_int_points(cv.G1Jac(*triple))[0]

    master_com = pt(out["master_com"])
    pi0 = pt(out["pi0"])
    pi1 = pt(out["pi1"])
    z = vec_to_int(out["z"])

    # cross-check against the single-device protocol path
    commits, evals, proofs = [], [], []
    for i in range(fft.M):
        commits.append(backend.worker_commit(i, rows[i]))
        y, pi = backend.worker_open(i, rows[i], alpha)
        evals.append(y)
        proofs.append(pi)
    assert pt((out["commits"])) is not None  # shape sanity
    assert master_com == backend.master_commit(commits)
    z_ref, (pi0_ref, pi1_ref) = backend.master_open(evals, proofs, beta)
    assert z == z_ref
    assert pi0 == pi0_ref
    assert pi1 == pi1_ref

    # and the aggregate proof verifies
    assert backend.master_verify(master_com, beta, alpha, z, (pi0, pi1))


@pytest.mark.e2e
def test_multihost_prove():
    """Multi-host wiring (SURVEY.md §7.8b): two fake-host processes join a
    jax.distributed cluster over localhost, run the prove round as one
    SPMD program whose master aggregation is a cross-process collective,
    and each process asserts the results against the host protocol path.
    The reference's deployment analog is one server per machine with the
    client shuttling bytes (reference src/rpc.rs:866-875)."""
    from fourier_tpu.parallel.multihost import spawn_dryrun

    spawn_dryrun(n_processes=2, scale=5, machines_scale=2)


@pytest.mark.e2e
def test_multihost_prove_one_worker_per_host():
    """Four fake hosts with a single device each: the M=4 worker axis
    maps one worker per host — the exact topology of the reference's
    one-server-per-machine deployment."""
    from fourier_tpu.parallel.multihost import spawn_dryrun

    spawn_dryrun(n_processes=4, scale=5, machines_scale=2,
                 devices_per_process=1)
