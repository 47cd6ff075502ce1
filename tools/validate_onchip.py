"""On-chip bit-exactness gate for the fused MSM paths + the RPC surface.

The suite validates msm_fused / msm_fused_bgmw against the jnp MSM under
the Pallas interpreter on CPU (tests/test_pallas.py); this tool closes
the remaining gap — that the *compiled* TPU kernels (Mosaic lowering,
lazy [0,2N) Montgomery domain, dynamic heavy-bucket splitting) produce
the same bits as ground truth on real hardware.

Expected values are ANALYTIC: the test points have known discrete logs
(P_j = 5^(j+1) * G), so every expected MSM result is one host scalar
mul — no CPU-subprocess phase, no interpreter crawl.  Inputs include the
adversarial all-equal-scalar case (the round-2 VERDICT headline: a
client-controlled workerCommit input) alongside uniform random scalars,
at the exact window sizes production dispatch picks.

Also drives one protocol-level case end-to-end on the chip: a
PianoBackend workerCommit/workerOpen/verify cycle cross-checked against
the host refimpl MSM.

Run on the TPU host:   python tools/validate_onchip.py
Artifact:              tools/ONCHIP_VALIDATION.log (committed)
"""
import os
import sys
import time

# repo root on sys.path without clobbering PYTHONPATH (run from anywhere)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(os.environ.get("V_SCALE", "12"))
N = 1 << SCALE
CACHE = os.path.expanduser("~/.cache/fourier_tpu_bench")
os.makedirs(CACHE, exist_ok=True)

t0 = time.perf_counter()
_LINES = []


def log(m):
    line = f"[{time.perf_counter()-t0:7.1f}s] {m}"
    print(line, file=sys.stderr, flush=True)
    _LINES.append(line)


def host_points(np):
    """P_j = 5^(j+1) * G as CANONICAL limb arrays.

    Generated host-side (refimpl, independent of the device code under
    test) at small N; via the device fixed-base path at large N where
    the host walk would take minutes (the device path is itself pinned
    against refimpl by the suite's fixed-base tests)."""
    path = f"{CACHE}/points_host_{SCALE}.npz"
    if os.path.exists(path):
        with np.load(path) as z:
            return z["x"], z["y"]
    from fourier_tpu.constants import FP_LIMBS
    from fourier_tpu.ops.limbs import int_to_limbs
    from fourier_tpu.refimpl import curve as rc

    if N > (1 << 14):
        import jax.numpy as jnp

        from fourier_tpu.constants import FR_LIMBS, R
        from fourier_tpu.ops import msm as msm_mod
        from fourier_tpu.ops.curve import to_affine
        from fourier_tpu.ops.field import FP
        from fourier_tpu.ops.limbs import ints_to_vec

        seeds = [pow(5, j + 1, R) for j in range(N)]
        pts = to_affine(msm_mod.fixed_base_msm(
            rc.G1_GEN, jnp.asarray(ints_to_vec(seeds, FR_LIMBS))))
        xs = np.asarray(FP.from_mont(pts.x))
        ys = np.asarray(FP.from_mont(pts.y))
    else:
        xs = np.zeros((FP_LIMBS, N), np.uint32)
        ys = np.zeros((FP_LIMBS, N), np.uint32)
        p = rc.g1_mul_fast(rc.G1_GEN, 5)
        for j in range(N):
            xs[:, j] = int_to_limbs(p[0], FP_LIMBS)
            ys[:, j] = int_to_limbs(p[1], FP_LIMBS)
            if j + 1 < N:
                p = rc.g1_mul_fast(p, 5)
    np.savez(path, x=xs, y=ys)
    return xs, ys


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("FOURIER_XLA_CACHE",
                       os.path.expanduser("~/.cache/fourier_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from fourier_tpu.constants import FP_LIMBS, FR_LIMBS, R
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.curve import G1Aff, to_affine
    from fourier_tpu.ops.field import FP
    from fourier_tpu.ops.limbs import int_to_limbs, limbs_to_ints
    from fourier_tpu.refimpl import curve as rc

    log(f"devices={jax.devices()}  n=2^{SCALE}")
    xs, ys = host_points(np)
    points = G1Aff(FP.to_mont(jnp.asarray(xs)), FP.to_mont(jnp.asarray(ys)),
                   jnp.zeros((N,), bool))
    log("points ready (canonical host file -> Montgomery device form)")

    rng = np.random.default_rng(7)
    uniform = rng.integers(0, 1 << 16, size=(FR_LIMBS, N), dtype=np.uint32)
    uniform[-1] &= 0x7FFF
    skew = np.repeat(uniform[:, :1], N, axis=1)
    inputs = {"uniform": uniform, "skew": skew}

    def analytic(scalar_limbs):
        svals = limbs_to_ints(np.asarray(scalar_limbs).T)
        total, p5 = 0, 5
        for s in svals:
            total = (total + s * p5) % R
            p5 = p5 * 5 % R
        ex, ey = rc.g1_mul_fast(rc.G1_GEN, total)
        return (np.asarray(int_to_limbs(ex, FP_LIMBS), np.uint32),
                np.asarray(int_to_limbs(ey, FP_LIMBS), np.uint32))

    expected = {k: analytic(v) for k, v in inputs.items()}
    log("analytic expected values ready")

    # production window choices
    c_fused = msm_mod._auto_window(N)
    c_bgmw = mf.bgmw_auto_window(N)
    table = msm_mod.bgmw_expand(points, c_bgmw)
    packed = mf.pack_points(table)
    tab_inf = jnp.asarray(np.asarray(table.inf))
    log(f"bgmw table ready (c_fused={c_fused}, c_bgmw={c_bgmw})")

    failures = 0
    for name, sc in inputs.items():
        scal = jnp.asarray(sc)
        for path, run in (
            ("fused", lambda: mf.msm_fused(points, scal, c_fused)),
            ("bgmw", lambda: mf.msm_fused_bgmw(packed, tab_inf, scal,
                                               c_bgmw)),
        ):
            aff = to_affine(run())
            gx = np.asarray(FP.from_mont(aff.x)).ravel()
            gy = np.asarray(FP.from_mont(aff.y)).ravel()
            ex, ey = expected[name]
            ok = np.array_equal(gx, ex) and np.array_equal(gy, ey)
            log(f"{path}/{name}: {'OK' if ok else 'MISMATCH'}")
            failures += 0 if ok else 1

    # --- protocol-level case: workerCommit on the chip vs host refimpl ---
    log("protocol case: scale-8 backend, worker_commit with constant row")
    from fourier_tpu.models.piano import (PianoBackend, PianoFFTSettings,
                                          generate_trusted_setup)

    fft = PianoFFTSettings(8, 1)
    settings = generate_trusted_setup(fft, (b"\x11" * 32, b"\x22" * 32))
    backend = PianoBackend(fft, settings)
    const_row = [123456789] * fft.T          # adversarial low-entropy witness
    com = backend.worker_commit(0, const_row)
    u_host = [rc_pt for rc_pt in _u_row_host(settings, 0)]
    want = rc.g1_msm_fast(u_host, const_row)
    ok = com == want
    log(f"workerCommit const-row vs host refimpl MSM: "
        f"{'OK' if ok else 'MISMATCH'}")
    failures += 0 if ok else 1

    alpha = 987654321
    y, pi = backend.worker_open(0, const_row, alpha)
    ok = backend.worker_verify(0, com, alpha, y, pi)
    log(f"workerOpen/Verify const-row: {'OK' if ok else 'FAILED'}")
    failures += 0 if ok else 1

    verdict = (
        f"ONCHIP VALIDATION {'OK' if failures == 0 else 'FAILED'} "
        f"(2^{SCALE}, fused c={c_fused} + bgmw c={c_bgmw}, uniform+skew, "
        f"+ protocol const-row) failures={failures}"
    )
    log(verdict)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"ONCHIP_VALIDATION_s{SCALE}.log")
    with open(out, "w") as fh:
        fh.write("\n".join(_LINES) + "\n")
    print(verdict)
    if failures:
        raise SystemExit(1)


def _u_row_host(settings, i):
    from fourier_tpu.ops import curve as cv

    return cv.jac_to_int_points(cv.from_affine(settings.u_row(i)))


if __name__ == "__main__":
    main()
