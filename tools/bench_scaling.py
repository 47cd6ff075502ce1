"""Scaling-efficiency harness for the intra-worker sharded MSM.

Only one real chip is reachable in this environment, so multi-chip
throughput is measured by its exact decomposition instead of faked:
the D-chip sharded MSM (parallel.msm_fused_sharded) runs, per chip, the
single-chip program `bgmw_from_digits` on a 1/D contiguous slice of the
table, followed by one D-point all_gather (~100 B/chip over ICI, <50 us)
and a log2(D)-add tree on 300-byte points.  This tool measures the
per-chip program at every shard size ON THE REAL CHIP and reports the
projected efficiency

    E(D) = t(full) / (D * t(slice_D))

(The all_gather+combine term is bounded by one batched point-add chain
at width D — microseconds — and is also timed here on-chip as
`combine_us`.)  Results append to tools/SCALING.log as JSON lines; the
virtual-mesh correctness of the same sharded program is asserted by
tests/test_parallel.py and the driver's dryrun_multichip.

Run:  python tools/bench_scaling.py          (2^19 table, D = 1,2,4,8)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FOURIER_XLA_CACHE",
                      os.path.expanduser("~/.cache/fourier_tpu_xla"))

t0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-t0:7.1f}s] {m}", file=sys.stderr, flush=True)


SCALE = int(os.environ.get("SC_SCALE", "19"))
N = 1 << SCALE
ITERS = int(os.environ.get("SC_ITERS", "5"))
CACHE = os.path.expanduser("~/.cache/fourier_tpu_bench")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["FOURIER_XLA_CACHE"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from fourier_tpu.constants import FR_LIMBS
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops import curve as cv
    from fourier_tpu.ops.curve import G1Jac

    log(f"devices={jax.devices()}  table scale=2^{SCALE}")

    c = mf.bgmw_auto_window(N)
    W = -(-mf.SCALAR_BITS // c)
    path = os.path.join(CACHE, f"bgmw_{SCALE}_{c}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            packed = jnp.asarray(z["packed"])
        log(f"bgmw table loaded (c={c}, W={W})")
    else:
        with np.load(os.path.join(CACHE, f"points_{SCALE}.npz")) as z:
            from fourier_tpu.ops.curve import G1Aff

            points = G1Aff(jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                           jnp.zeros((N,), bool))
        table = msm_mod.bgmw_expand(points, c)
        packed = mf.pack_points(table)
        np.savez(path, packed=np.asarray(packed))
        log(f"bgmw table built (c={c}, W={W})")
    WN = packed.shape[0]
    tab_inf = jnp.zeros((WN,), bool)

    rng = np.random.default_rng(3)
    sc = rng.integers(0, 1 << 16, size=(FR_LIMBS, N), dtype=np.uint32)
    sc[-1] &= 0x7FFF
    scal = jnp.asarray(sc)
    digits = msm_mod._all_window_digits(scal, c, W)  # [W, n]

    def sync(a):
        return np.asarray(a)

    results = {}
    for D in (1, 2, 4, 8):
        if W % D:
            log(f"D={D}: skipped (W={W} not divisible)")
            continue
        wd = W // D
        pk = packed[: wd * N]
        inf_d = tab_inf[: wd * N]
        dg = digits[:wd].reshape(-1)
        run = lambda d: mf.bgmw_from_digits(pk, inf_d, d, c)
        out = run(dg)
        sync(out.x)  # warm/compile
        times = []
        for _ in range(ITERS):
            t = time.perf_counter()
            out = run(dg)
            sync(out.x)
            times.append(time.perf_counter() - t)
        med = float(np.median(times))
        results[D] = med
        log(f"D={D}: per-shard slice W/D={wd} -> {med:.3f}s "
            f"(min {min(times):.3f} max {max(times):.3f})")

    # combine cost: a D-lane gather tree on single points (upper bound on
    # the all_gather + tree-combine step, measured on-chip)
    one = cv.generator_jac((8,))
    comb = jax.jit(lambda x, y, z: cv.tree_sum(G1Jac(x, y, z)))
    sync(comb(one.x, one.y, one.z).x)
    t = time.perf_counter()
    for _ in range(10):
        sync(comb(one.x, one.y, one.z).x)
    combine_us = (time.perf_counter() - t) / 10 * 1e6

    line = {
        "metric": f"bgmw_msm_sharding_efficiency_2^{SCALE}",
        "single_chip_s": results.get(1),
        "per_shard_s": {str(d): results[d] for d in results},
        "efficiency": {
            str(d): round(results[1] / (d * results[d]), 4)
            for d in results if d > 1 and 1 in results
        },
        "combine_us_upper_bound": round(combine_us, 1),
        "n": N, "c": c, "W": W,
    }
    print(json.dumps(line))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "SCALING.log")
    with open(out_path, "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
