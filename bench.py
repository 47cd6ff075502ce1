"""Benchmark: worker-commit MSM throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): its only harness is a
criterion bench of worker_commit at toy scale (reference
benches/piano.rs:41-63).  We benchmark the same operation — an MSM of
T random points against random canonical scalars — at
BENCH_SCALE (default 2^16 points), reporting points/sec.
vs_baseline is reported against the recorded value in BENCH_BASELINE.json
when present, else 1.0.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    os.environ.setdefault(
        "FOURIER_XLA_CACHE", os.path.expanduser("~/.cache/fourier_tpu_xla")
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ["FOURIER_XLA_CACHE"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fourier_tpu.constants import FR_LIMBS, R
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops.curve import G1Aff, to_affine
    from fourier_tpu.ops.limbs import ints_to_vec
    from fourier_tpu.refimpl.curve import G1_GEN

    scale = int(os.environ.get("BENCH_SCALE", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    n = 1 << scale

    # Base points: random multiples of the generator, built on device.
    seed_scalars = [pow(5, j + 1, R) for j in range(n)]
    points = to_affine(
        msm_mod.fixed_base_msm(
            G1_GEN, jnp.asarray(ints_to_vec(seed_scalars, FR_LIMBS))
        )
    )
    jax.block_until_ready(points)

    rng = np.random.default_rng(0)
    def rand_scalars():
        raw = rng.integers(0, 1 << 16, size=(FR_LIMBS, n), dtype=np.uint32)
        raw[-1] &= 0x7FFF  # < 2^255 < r guarantee not needed; keep < r loosely
        return jnp.asarray(raw)

    def sync(x):
        # On tunneled platforms block_until_ready can report at enqueue;
        # a host readback is the only reliable completion barrier.
        return np.asarray(x)

    sc_warm = rand_scalars()
    out = msm_mod.msm(points, sc_warm)
    sync(out.x)  # compile + run

    times = []
    for _ in range(iters):
        sc = rand_scalars()
        sync(sc[:1, :1])
        t0 = time.perf_counter()
        out = msm_mod.msm(points, sc)
        sync(out.x)
        times.append(time.perf_counter() - t0)

    best = min(times)
    ops_per_s = n / best

    vs_baseline = 1.0
    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                recorded = json.load(f).get("value")
            if recorded:
                vs_baseline = ops_per_s / float(recorded)
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": f"worker_commit_msm_2^{scale}_points_per_s",
                "value": round(ops_per_s, 1),
                "unit": "points/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
