"""Scaling-efficiency harness for the intra-worker sharded MSM.

Only one real chip is reachable in this environment, so multi-chip
throughput is measured by its exact decomposition instead of faked: the
D-chip sharded MSM (parallel.msm_fused_sharded) runs, per chip,

  1. bgmw_buckets_from_digits on a 1/D contiguous slice of the table
     (digits for its own windows extracted locally),
  2. a tree-add of the D bucket sets exchanged by the all_to_all
     (log2 D wide adds over B/D lanes),
  3. the bucket-axis-sharded factorized reduction: local rows/cols, the
     column-partial combine (H-point tree over D sets), dynamic-weight
     spare terms, and the replicated Horner over the gathered lanes.

This tool times that EXACT per-chip program on the real chip — the
received bucket sets are stand-ins sliced from the chip's own set, and
the all_gathered lane axes are tiled locally, so shapes and compute
match the SPMD program; only the ICI transfers themselves are excluded
(bounded separately below: the all_to_all moves ~B*(D-1)/D * 288 B ~=
17 MB at c=16 — sub-ms at ICI bandwidth — plus two sub-100 KB gathers).
Projected efficiency:

    E(D) = t(full) / (D * t(chip_D))

Results append to tools/SCALING.log as JSON lines; the virtual-mesh
correctness of the same sharded program is asserted by
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
    from functools import partial

    from fourier_tpu.constants import FR_LIMBS, FP_LIMBS
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops import curve as cv
    from fourier_tpu.ops.curve import G1Jac

    log(f"devices={jax.devices()}  table scale=2^{SCALE}")

    c = int(os.environ.get("SC_C", "0")) or mf.bgmw_auto_window(N)
    W = (mf.signed_window_count(c)
         if mf.signed_window_count(c) == -(-mf.SCALAR_BITS // c)
         else -(-mf.SCALAR_BITS // c))
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
    digits_flat, neg_flat = mf.bgmw_digits_for(scal, c, W)
    signed = neg_flat is not None
    digits = digits_flat.reshape(W, N)
    negs = neg_flat.reshape(W, N) if signed else None
    Bpow = 1 << (c - 1) if signed else 1 << c
    h_bits = c // 2
    H = 1 << h_bits

    @partial(jax.jit, static_argnums=(3, 4))
    def chip_program(pk, inf_d, dg, D: int, c: int, ng=None):
        """Chip 0's compute of the D-way sharded MSM (module docstring):
        identical shapes/ops to the shard_map program, collective
        transfers replaced by local stand-ins."""
        buckets, weights = mf.bgmw_buckets_from_digits(pk, inf_d, dg, c, ng)
        if D == 1:
            return mf.bgmw_reduce(buckets, weights, c, signed)
        Bl = Bpow // D
        Gl = Bl // H
        # 1. combine the D exchanged bucket sets (stand-in: own slices)
        recv = G1Jac(
            buckets.x[..., :Bpow].reshape(FP_LIMBS, D, Bl),
            buckets.y[..., :Bpow].reshape(FP_LIMBS, D, Bl),
            buckets.z[..., :Bpow].reshape(FP_LIMBS, D, Bl),
        )
        local = cv.tree_reduce_axis(recv, -2)
        # 2. sharded factorized reduction on the local slice
        grid = G1Jac(local.x.reshape(FP_LIMBS, Gl, H),
                     local.y.reshape(FP_LIMBS, Gl, H),
                     local.z.reshape(FP_LIMBS, Gl, H))
        rows = mf._reduce_axis(grid, -1)
        colp = mf._reduce_axis(grid, -2)
        colg = G1Jac(jnp.tile(colp.x[..., None], (1, 1, D)),
                     jnp.tile(colp.y[..., None], (1, 1, D)),
                     jnp.tile(colp.z[..., None], (1, 1, D)))
        cols3 = cv.tree_reduce_last(colg, to=1)
        cols = G1Jac(cols3.x[..., 0], cols3.y[..., 0], cols3.z[..., 0])
        low = msm_mod._bit_partial_sums(cols, h_bits)
        g_idx = jnp.arange(Gl, dtype=jnp.int32)
        high_l = mf._weighted_partial_sums(rows, g_idx, c - h_bits)
        high = G1Jac(jnp.tile(high_l.x, (1, 1, D)),
                     jnp.tile(high_l.y, (1, 1, D)),
                     jnp.tile(high_l.z, (1, 1, D)))
        r_main = max(low.x.shape[-1], high.x.shape[-1])
        low = mf._pad_lanes(low, r_main)
        high = mf._pad_lanes(high, r_main)
        terms = G1Jac(jnp.concatenate([low.x, high.x], axis=-2),
                      jnp.concatenate([low.y, high.y], axis=-2),
                      jnp.concatenate([low.z, high.z], axis=-2))
        dyn = G1Jac(buckets.x[..., Bpow:], buckets.y[..., Bpow:],
                    buckets.z[..., Bpow:])
        dyn_l = mf._weighted_partial_sums(dyn, weights[..., Bpow:], c)
        dyn_t = G1Jac(jnp.tile(dyn_l.x, (1, 1, D)),
                      jnp.tile(dyn_l.y, (1, 1, D)),
                      jnp.tile(dyn_l.z, (1, 1, D)))
        terms = G1Jac(jnp.concatenate([terms.x, dyn_t.x], axis=-1),
                      jnp.concatenate([terms.y, dyn_t.y], axis=-1),
                      jnp.concatenate([terms.z, dyn_t.z], axis=-1))
        return msm_mod._horner_2k(terms)

    def sync(a):
        return np.asarray(a)

    results = {}
    for D in (1, 2, 4, 8):
        rows = WN // D          # contiguous row slice: window alignment
        pk = packed[:rows]      # is NOT required (weights are baked in)
        inf_d = tab_inf[:rows]
        dg = digits.reshape(-1)[:rows]
        ng = negs.reshape(-1)[:rows] if signed else None
        run = lambda: chip_program(pk, inf_d, dg, D, c, ng)
        out = run()
        sync(out.x)  # warm/compile
        # One host readback on the tunneled chip costs ~25 ms of pure
        # latency (tools/PROFILE_MSM.log round-5 note) — at D=8 the
        # per-chip program is ~100 ms, so a per-iteration sync would
        # inflate it ~25%.  Dispatch K back-to-back (async queue), sync
        # once, divide.
        K = 3
        times = []
        for _ in range(ITERS):
            t = time.perf_counter()
            for _k in range(K):
                out = run()
            sync(out.x)
            times.append((time.perf_counter() - t) / K)
        med = float(np.median(times))
        results[D] = med
        log(f"D={D}: per-chip slice rows={rows} -> {med:.3f}s "
            f"(min {min(times):.3f} max {max(times):.3f})")

    # communication bound (excluded from the per-chip timings above):
    # all_to_all payload per chip + the two small gathers, at a
    # conservative 40 GB/s per-link ICI figure.
    a2a_bytes = Bpow * 3 * FP_LIMBS * 4
    comm_ms = {str(D): round(a2a_bytes * (D - 1) / D / 40e9 * 1e3, 3)
               for D in results if D > 1}

    line = {
        "metric": f"bgmw_msm_sharding_efficiency_2^{SCALE}",
        "single_chip_s": results.get(1),
        "per_chip_s": {str(d): results[d] for d in results},
        "efficiency": {
            str(d): round(results[1] / (d * results[d]), 4)
            for d in results if d > 1 and 1 in results
        },
        "a2a_comm_bound_ms": comm_ms,
        "n": N, "c": c, "W": W, "signed": signed,
    }
    print(json.dumps(line))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "SCALING.log")
    with open(out_path, "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
