"""Benchmark: worker-commit MSM throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): its only harness is a
criterion bench of worker_commit at toy scale (reference
benches/piano.rs:41-63).  We benchmark the same operation — an MSM of
T random points against uniformly-drawn canonical scalars — at
BENCH_SCALE (default 2^19, the per-worker size of the reference's
default scale-20/machines-scale-1 configuration), reporting points/sec.
vs_baseline compares against BENCH_BASELINE.json (this build's round-1
measured numbers) when present.

Robustness (the round-1 driver run timed out before printing):
- base points are cached on disk after first generation;
- the MSM executable is AOT-cached (fourier_tpu.runtime.aot), so a
  warm process reaches its first result in seconds, not minutes;
- a wall-clock budget (BENCH_BUDGET, default 480 s) downshifts the
  scale ladder when artifacts are cold;
- SIGTERM/SIGINT print the best measurement taken so far, so even a
  driver-side `timeout` yields a parseable line.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

START = time.perf_counter()
_RESULT: dict | None = None
_PRINTED = False


def _log(msg: str) -> None:
    print(f"[bench {time.perf_counter() - START:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _emit() -> None:
    global _PRINTED
    if _PRINTED:
        return
    if _RESULT is not None:
        print(json.dumps(_RESULT), flush=True)
        _PRINTED = True


def _on_signal(signum, frame):
    _log(f"signal {signum}: emitting best-so-far result")
    _emit()
    raise SystemExit(0 if _PRINTED else 1)


def _points_cache_dir() -> str:
    path = os.path.join(os.path.expanduser("~"), ".cache", "fourier_tpu_bench")
    os.makedirs(path, exist_ok=True)
    return path


def _canonical_scalars(rng, n: int):
    """Uniform scalars in [0, r): rejection sampling on 255-bit draws.

    The reference benches real Fr elements (FsFr::rand); masking to
    2^255 without rejecting >= r would admit ~1.3% non-canonical
    scalars with a skewed top window."""
    import numpy as np

    from fourier_tpu.constants import FR_LIMBS, R
    from fourier_tpu.ops.limbs import int_to_limbs

    r_limbs = int_to_limbs(R, FR_LIMBS)  # little-endian uint32 view
    out = np.zeros((FR_LIMBS, n), dtype=np.uint32)
    need = np.ones(n, dtype=bool)
    while need.any():
        k = int(need.sum())
        draw = rng.integers(0, 1 << 16, size=(FR_LIMBS, k), dtype=np.uint32)
        draw[-1] &= 0x7FFF  # 255-bit
        lt = np.zeros(k, dtype=bool)
        eq = np.ones(k, dtype=bool)
        for limb in range(FR_LIMBS - 1, -1, -1):
            lt |= eq & (draw[limb] < r_limbs[limb])
            eq &= draw[limb] == r_limbs[limb]
        idx = np.flatnonzero(need)
        take = idx[: k][lt]
        out[:, take] = draw[:, lt]
        need[take] = False
    return out


def main() -> None:
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    global _RESULT
    os.environ.setdefault(
        "FOURIER_XLA_CACHE", os.path.expanduser("~/.cache/fourier_tpu_xla")
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ["FOURIER_XLA_CACHE"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fourier_tpu.constants import FP_LIMBS, FR_LIMBS, R
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops.curve import G1Aff, to_affine
    from fourier_tpu.ops.limbs import ints_to_vec
    from fourier_tpu.refimpl.curve import G1_GEN
    from fourier_tpu.runtime import aot

    target_scale = int(os.environ.get("BENCH_SCALE", "19"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    budget = float(os.environ.get("BENCH_BUDGET", "480"))
    deadline = START + budget

    def remaining() -> float:
        return deadline - time.perf_counter()

    _log(f"devices={jax.devices()} target=2^{target_scale} budget={budget}s")

    def load_points(scale: int) -> G1Aff:
        """Deterministic base points (generator multiples), disk-cached."""
        n = 1 << scale
        path = os.path.join(_points_cache_dir(), f"points_{scale}.npz")
        if os.path.exists(path):
            with np.load(path) as z:
                x, y = z["x"], z["y"]
            _log(f"points 2^{scale} loaded from cache")
            return G1Aff(jnp.asarray(x), jnp.asarray(y),
                         jnp.zeros((n,), bool))
        _log(f"generating 2^{scale} points on device ...")
        seeds = [pow(5, j + 1, R) for j in range(n)]
        pts = to_affine(
            msm_mod.fixed_base_msm(G1_GEN, jnp.asarray(ints_to_vec(seeds, FR_LIMBS)))
        )
        x = np.asarray(pts.x)
        y = np.asarray(pts.y)
        np.savez(path, x=x, y=y)
        _log(f"points 2^{scale} generated + cached")
        return G1Aff(jnp.asarray(x), jnp.asarray(y), jnp.zeros((n,), bool))

    def sync(a):
        # On tunneled platforms block_until_ready can report at enqueue;
        # a host readback is the only reliable completion barrier.
        return np.asarray(a)

    # Scale ladder: prefer the target, fall back to smaller scales when
    # artifacts are cold and the budget would not cover an XLA compile.
    ladder = []
    for s in (target_scale, 16, 12):
        if s not in ladder:
            ladder.append(s)

    baseline_map = {}
    bp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BENCH_BASELINE.json")
    if os.path.exists(bp):
        try:
            with open(bp) as f:
                baseline_map = json.load(f).get("points_per_s", {})
        except Exception:
            pass

    from fourier_tpu.ops import msm_fused as mf

    def bgmw_table(scale: int, points: G1Aff):
        """BGMW-expanded packed table (the production worker_commit
        config: reference benches/piano.rs benches worker_commit WITH
        precompute as its primary case).  Disk-cached; built fresh only
        when the budget allows (~1 min at 2^19)."""
        n = 1 << scale
        c = mf.bgmw_auto_window(n)
        path = os.path.join(_points_cache_dir(), f"bgmw_{scale}_{c}.npz")
        if os.path.exists(path):
            with np.load(path) as z:
                packed = jnp.asarray(z["packed"])
            _log(f"bgmw table 2^{scale} c={c} loaded from cache")
            return packed, c
        if remaining() < 240:
            _log(f"skip bgmw table build: {remaining():.0f}s left")
            return None, c
        _log(f"expanding bgmw table c={c} ...")
        table = msm_mod.bgmw_expand(points, c)
        packed = mf.pack_points(table)
        np.savez(path, packed=np.asarray(packed))
        _log("bgmw table built + cached")
        return packed, c

    for scale in ladder:
        n = 1 << scale
        probe = G1Aff(
            jax.ShapeDtypeStruct((FP_LIMBS, n), jnp.uint32),
            jax.ShapeDtypeStruct((FP_LIMBS, n), jnp.uint32),
            jax.ShapeDtypeStruct((n,), jnp.bool_),
        )
        sc_probe = jax.ShapeDtypeStruct((FR_LIMBS, n), jnp.uint32)
        warm = aot.exists(f"msm_s{scale}", (probe, sc_probe), extra_key="c0")
        if not warm:
            # the tabled path alone being warm is enough to measure
            c_probe = mf.bgmw_auto_window(n)
            W = -(-256 // c_probe)
            t_probe = jax.ShapeDtypeStruct((W * n, FP_LIMBS), jnp.uint32)
            i_probe = jax.ShapeDtypeStruct((W * n,), jnp.bool_)
            warm = aot.exists(
                f"msm_bgmw_s{scale}", (t_probe, i_probe, sc_probe),
                extra_key=f"c{c_probe}",
            )
        pts_cached = os.path.exists(
            os.path.join(_points_cache_dir(), f"points_{scale}.npz"))
        # Cold compile of the MSM program takes ~3-6 min on the tunneled
        # TPU; only attempt it with generous remaining budget.
        need = 60 if (warm and pts_cached) else 600
        if remaining() < need and scale != ladder[-1]:
            _log(f"skip 2^{scale}: {remaining():.0f}s left, need ~{need}s "
                 f"(aot={'warm' if warm else 'cold'})")
            continue

        points = load_points(scale)
        rng = np.random.default_rng(0)
        scalars = jnp.asarray(_canonical_scalars(rng, n))
        _log("scalars ready")

        # Candidate paths, fastest production config first: the tabled
        # shared-bucket MSM (worker_commit with precompute), then the
        # tableless kernel.  Whichever wins becomes the reported number;
        # both measure the same op as the reference's bench
        # (benches/piano.rs:41-63 measures both configs).
        runners = []
        packed, c_tab = bgmw_table(scale, points)
        if packed is not None:
            tab_inf = jnp.zeros((packed.shape[0],), bool)
            exe_t = aot.get_or_build(
                f"msm_bgmw_s{scale}", mf.msm_fused_bgmw,
                (packed, tab_inf, scalars),
                extra_key=f"c{c_tab}",
                lower_args=(packed, tab_inf, scalars, c_tab),
            )
            runners.append(("bgmw", lambda sc: exe_t(packed, tab_inf, sc)))
        exe = aot.get_or_build(
            f"msm_s{scale}", msm_mod.msm, (points, scalars),
            extra_key="c0", lower_args=(points, scalars, 0),
        )
        runners.append(("tableless", lambda sc: exe(points, sc)))
        _log("executables ready")

        for name, run in runners:
            out = run(scalars)
            sync(out.x if hasattr(out, "x") else out[0])
            _log(f"{name}: warm run done")

            # Median-of-iters with the spread logged: the recorded number
            # must be reproducible, not a lucky best-of-2 (round-2 VERDICT:
            # iteration times varied ~20%; the honest statistic is the
            # median with variance stated).
            times = []
            for i in range(iters):
                sc = jnp.asarray(_canonical_scalars(rng, n))
                sync(sc[:1, :1])
                t0 = time.perf_counter()
                out = run(sc)
                sync(out.x if hasattr(out, "x") else out[0])
                dt = time.perf_counter() - t0
                times.append(dt)
                value = n / float(np.median(times))
                best_prev = (_RESULT or {}).get("value", 0)
                if value > best_prev:
                    _RESULT = {
                        "metric": f"worker_commit_msm_2^{scale}_points_per_s",
                        "value": round(value, 1),
                        "unit": "points/s",
                        "vs_baseline": round(
                            value / float(
                                baseline_map.get(str(scale), value)), 4
                        ),
                    }
                _log(f"{name} iter {i}: {dt:.3f}s ({n/dt:.0f} pts/s)")
                if remaining() < dt * 1.5:
                    break
            spread = (max(times) - min(times)) / float(np.median(times))
            _log(f"{name}: median {np.median(times):.3f}s over "
                 f"{len(times)} iters (min {min(times):.3f}s, "
                 f"max {max(times):.3f}s, spread {100*spread:.1f}%)")
            if remaining() < 30:
                break
        break

    _emit()
    if _RESULT is None:
        raise SystemExit("bench: no measurement completed")


if __name__ == "__main__":
    main()
