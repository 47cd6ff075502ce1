"""Stage timing of the per-chip sharded-MSM program at D=4/8 (2^19,
production c): where does the per-chip fixed cost live?

Stages (cumulative jits, amortized-sync timing):
  A = bgmw_buckets_from_digits on the 1/D slice       (slab accumulation)
  B = A + D-set combine tree                          (bucket exchange)
  C = B + sharded factorized reduction + horner       (the full program)

Appends a JSON line to tools/PROFILE_MSM.log.
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
CACHE = os.path.expanduser("~/.cache/fourier_tpu_bench")
DS = [int(x) for x in os.environ.get("SC_DS", "8,4").split(",")]


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

    log(f"devices={jax.devices()}")
    c = mf.bgmw_auto_window(N)
    W = -(-mf.SCALAR_BITS // c)
    with np.load(os.path.join(CACHE, f"bgmw_{SCALE}_{c}.npz")) as z:
        packed = jnp.asarray(z["packed"])
    WN = packed.shape[0]
    tab_inf = jnp.zeros((WN,), bool)
    rng = np.random.default_rng(3)
    sc = rng.integers(0, 1 << 16, size=(FR_LIMBS, N), dtype=np.uint32)
    sc[-1] &= 0x7FFF
    scal = jnp.asarray(sc)
    digits_flat, neg_flat = mf.bgmw_digits_for(scal, c, W)
    signed = neg_flat is not None
    digits = digits_flat.reshape(W, N)
    Bpow = 1 << (c - 1) if signed else 1 << c
    h_bits = c // 2
    H = 1 << h_bits

    def combine(buckets, D):
        Bl = Bpow // D
        recv = G1Jac(
            buckets.x[..., :Bpow].reshape(FP_LIMBS, D, Bl),
            buckets.y[..., :Bpow].reshape(FP_LIMBS, D, Bl),
            buckets.z[..., :Bpow].reshape(FP_LIMBS, D, Bl),
        )
        return cv.tree_reduce_axis(recv, -2)

    def reduction(buckets, weights, local, D):
        Bl = Bpow // D
        Gl = Bl // H
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

    def timeit(name, fn, iters=3, K=3):
        out = fn()
        sync(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(iters):
            t = time.perf_counter()
            for _k in range(K):
                out = fn()
            sync(jax.tree_util.tree_leaves(out)[0])
            ts.append((time.perf_counter() - t) / K)
        med = float(np.median(ts))
        log(f"{name}: {med*1000:8.1f} ms")
        return med

    results = {}
    for D in DS:
        wd = W // D
        pk = packed[: wd * N]
        inf_d = tab_inf[: wd * N]
        dg = digits[:wd].reshape(-1)
        ng = (neg_flat.reshape(W, N)[:wd].reshape(-1) if signed else None)

        @jax.jit
        def stage_a(pk, inf_d, dg):
            b, w = mf.bgmw_buckets_from_digits(pk, inf_d, dg, c, ng)
            return b.x, b.y, b.z, w

        @jax.jit
        def stage_b(pk, inf_d, dg):
            b, w = mf.bgmw_buckets_from_digits(pk, inf_d, dg, c, ng)
            loc = combine(b, D)
            return loc.x, loc.y, loc.z

        @jax.jit
        def stage_c(pk, inf_d, dg):
            b, w = mf.bgmw_buckets_from_digits(pk, inf_d, dg, c, ng)
            loc = combine(b, D)
            out = reduction(b, w, loc, D)
            return out.x, out.y, out.z

        results[f"A_buckets_D{D}"] = round(
            timeit(f"D={D} A buckets", lambda: stage_a(pk, inf_d, dg)) * 1e3, 1)
        results[f"B_comb_D{D}"] = round(
            timeit(f"D={D} B +combine", lambda: stage_b(pk, inf_d, dg)) * 1e3, 1)
        results[f"C_full_D{D}"] = round(
            timeit(f"D={D} C full", lambda: stage_c(pk, inf_d, dg)) * 1e3, 1)

    line = {"metric": f"chip_shard_stage_budget_2^{SCALE}_c{c}",
            **results, "unit": "ms"}
    print(json.dumps(line))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PROFILE_MSM.log"), "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
