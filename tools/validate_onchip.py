"""On-chip bit-exactness check for the fused MSM paths.

The suite validates msm_fused / msm_fused_bgmw against the jnp MSM under
the Pallas interpreter on CPU (tests/test_pallas.py); this tool closes
the remaining gap — that the *compiled* TPU kernels (Mosaic lowering,
lazy [0,2N) Montgomery domain, dynamic heavy-bucket splitting) produce
the same bits as the CPU path on real hardware.

Two-phase: first spawns itself under JAX_PLATFORMS=cpu to compute the
expected results with the plain jnp MSM, then runs the fused kernels on
the default (TPU) platform and compares affine coordinates exactly.

Inputs include the adversarial all-equal-scalar case (the heavy-bucket
cliff flagged in round-1 VERDICT) alongside uniform random scalars.
"""
import os
import subprocess
import sys
import time

SCALE = int(os.environ.get("V_SCALE", "12"))
N = 1 << SCALE
EXPECTED = os.path.expanduser(f"~/.cache/fourier_tpu_bench/validate_{SCALE}.npz")

t0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-t0:7.1f}s] {m}", file=sys.stderr, flush=True)


def make_inputs(np):
    from fourier_tpu.constants import FR_LIMBS

    rng = np.random.default_rng(7)
    uniform = rng.integers(0, 1 << 16, size=(FR_LIMBS, N), dtype=np.uint32)
    uniform[-1] &= 0x7FFF
    # adversarial: every scalar identical -> every digit lands in one bucket
    skew = np.repeat(uniform[:, :1], N, axis=1)
    return {"uniform": uniform, "skew": skew}


def load_points(jnp, np):
    from fourier_tpu.ops.curve import G1Aff

    path = os.path.expanduser(f"~/.cache/fourier_tpu_bench/points_{SCALE}.npz")
    if not os.path.exists(path):
        # deterministic generator multiples, same scheme as bench.py
        from fourier_tpu.constants import FR_LIMBS, R
        from fourier_tpu.ops import msm as msm_mod
        from fourier_tpu.ops.curve import to_affine
        from fourier_tpu.ops.limbs import ints_to_vec
        from fourier_tpu.refimpl.curve import G1_GEN

        seeds = [pow(5, j + 1, R) for j in range(N)]
        pts = to_affine(
            msm_mod.fixed_base_msm(G1_GEN, jnp.asarray(ints_to_vec(seeds, FR_LIMBS)))
        )
        np.savez(path, x=np.asarray(pts.x), y=np.asarray(pts.y))
    with np.load(path) as z:
        return G1Aff(jnp.asarray(z["x"]), jnp.asarray(z["y"]), jnp.zeros((N,), bool))


def phase_cpu():
    # config-level platform forcing, before any jax use: the env var alone
    # does not stop the axon TPU plugin from initializing, and the tunnel
    # is single-client — a CPU helper must never grab it.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops.curve import to_affine

    points = load_points(jnp, np)
    inputs = make_inputs(np)
    out = {}

    aff = to_affine(msm_mod.msm(points, jnp.asarray(inputs["uniform"])))
    out["uniform_x"] = np.asarray(aff.x)
    out["uniform_y"] = np.asarray(aff.y)
    log("cpu expected: uniform done")

    # skew (all scalars == s): the points have known discrete logs
    # (P_j = 5^(j+1) * G), so the expected value is one host scalar mul
    # s * (sum_j 5^(j+1) mod r) * G — the jnp path would crawl through
    # the very serial-bucket cliff this case exists to exercise.
    from fourier_tpu.constants import FP_LIMBS, R
    from fourier_tpu.ops.limbs import int_to_limbs, limbs_to_int
    from fourier_tpu.refimpl import curve as rc

    s = limbs_to_int(inputs["skew"][:, 0])
    dlog_sum = sum(pow(5, j + 1, R) for j in range(N)) % R
    ex, ey = rc.g1_mul_fast(rc.G1_GEN, s * dlog_sum % R)
    out["skew_x"] = np.asarray(int_to_limbs(ex, FP_LIMBS), dtype=np.uint32)
    out["skew_y"] = np.asarray(int_to_limbs(ey, FP_LIMBS), dtype=np.uint32)
    log("cpu expected: skew done (host analytic)")
    np.savez(EXPECTED, **out)


def phase_tpu():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "FOURIER_XLA_CACHE", os.path.expanduser("~/.cache/fourier_tpu_xla")
        ),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.curve import to_affine

    log(f"devices={jax.devices()}")
    points = load_points(jnp, np)
    exp = np.load(EXPECTED)
    inputs = make_inputs(np)

    c = mf.bgmw_auto_window(N)
    table = msm_mod.bgmw_expand(points, c)
    packed = mf.pack_points(table)
    tab_inf = jnp.zeros((packed.shape[0],), bool)
    log(f"bgmw table ready (c={c})")

    failures = 0
    for name, sc in inputs.items():
        scal = jnp.asarray(sc)
        for path, run in (
            ("fused", lambda: mf.msm_fused(points, scal)),
            ("bgmw", lambda: mf.msm_fused_bgmw(packed, tab_inf, scal, c)),
        ):
            aff = to_affine(run())
            gx, gy = np.asarray(aff.x).ravel(), np.asarray(aff.y).ravel()
            ok = np.array_equal(gx, exp[f"{name}_x"].ravel()) and np.array_equal(
                gy, exp[f"{name}_y"].ravel()
            )
            log(f"{path}/{name}: {'OK' if ok else 'MISMATCH'}")
            failures += 0 if ok else 1
    if failures:
        raise SystemExit(f"on-chip validation FAILED: {failures} mismatches")
    print(f"ONCHIP VALIDATION OK (2^{SCALE}, fused+bgmw, uniform+skew)")


if __name__ == "__main__":
    os.makedirs(os.path.dirname(EXPECTED), exist_ok=True)
    if "--cpu-phase" in sys.argv:
        phase_cpu()
    else:
        if not os.path.exists(EXPECTED):
            log("computing CPU expected values in subprocess ...")
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            subprocess.run(
                [sys.executable, __file__, "--cpu-phase"], env=env, check=True
            )
        phase_tpu()
