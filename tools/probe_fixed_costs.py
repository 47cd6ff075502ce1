"""Micro-timing of the MSM's Theta(B)/Theta(B log WN) bookkeeping stages
— the per-chip fixed costs that cap sharding efficiency (round-5 stage
budget: per-chip C_full at D=8 is ~162 ms vs ~91 ms ideal).

Times, with K-amortized syncs (25 ms tunnel latency per readback):
  sort1m      digit sort_key_val over the D=8 shard's 1.05M rows
  edges       searchsorted(sd, arange(B+1)) — binary search, 17 rounds
  slotsort    count-descending argsort + inverse argsort over BT lanes
  split       _split_heavy_slots at B=65536
  sparetree   dynamic-weight masked reduction [c=16, spare] -> 32 lanes
  combine8    tree-add of 8 exchanged bucket sets over B/8 lanes
Appends to tools/PROFILE_MSM.log.
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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["FOURIER_XLA_CACHE"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from fourier_tpu.constants import FP_LIMBS
    from fourier_tpu.ops import curve as cv
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.curve import G1Jac

    log(f"devices={jax.devices()}")
    c, B = 16, 1 << 16
    WN = (16 << 19) // 8          # D=8 shard rows
    BT = 70656                    # n_tiles*BTILE at Bp=69632
    spare = 4096
    rng = np.random.default_rng(0)

    digits = jnp.asarray(rng.integers(0, B, WN, dtype=np.int32))
    meta = jnp.asarray(rng.integers(0, 1 << 30, WN, dtype=np.uint32))
    counts_bt = jnp.asarray(rng.integers(0, 32, BT, dtype=np.int32))
    weights = jnp.asarray(rng.integers(0, B, spare, dtype=np.int32))
    bl = B // 8

    def pts(n_lanes):
        return G1Jac(
            jnp.asarray(rng.integers(0, 1 << 16, (FP_LIMBS, n_lanes),
                                     dtype=np.uint32)),
            jnp.asarray(rng.integers(0, 1 << 16, (FP_LIMBS, n_lanes),
                                     dtype=np.uint32)),
            jnp.asarray(rng.integers(0, 1 << 16, (FP_LIMBS, n_lanes),
                                     dtype=np.uint32)),
        )

    sp_pts = pts(spare)
    comb_pts = pts(B)

    progs = {}

    @jax.jit
    def p_sort(d, m):
        return jax.lax.sort_key_val(d, m)

    progs["sort1m"] = (p_sort, (digits, meta))

    sd = jnp.sort(digits)

    @jax.jit
    def p_edges(s):
        return jnp.searchsorted(
            s, jnp.arange(B + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)

    progs["edges"] = (p_edges, (sd,))

    @jax.jit
    def p_slotsort(cnt):
        cs = jnp.argsort(-cnt).astype(jnp.int32)
        inv = jnp.argsort(cs).astype(jnp.int32)
        return cs, inv

    progs["slotsort"] = (p_slotsort, (counts_bt,))

    cnt_b = jnp.asarray(rng.integers(0, 256, B, dtype=np.int32))
    st_b = jnp.cumsum(cnt_b).astype(jnp.int32)

    @jax.jit
    def p_split(cnt, st):
        return mf._split_heavy_slots(cnt, st, 256, spare)

    progs["split"] = (p_split, (cnt_b, st_b))

    @jax.jit
    def p_spare(x, y, z, w):
        out = mf._weighted_partial_sums(G1Jac(x, y, z), w, c)
        return out.x

    progs["sparetree"] = (p_spare, (sp_pts.x, sp_pts.y, sp_pts.z, weights))

    @jax.jit
    def p_comb(x, y, z):
        r = G1Jac(x.reshape(FP_LIMBS, 8, bl), y.reshape(FP_LIMBS, 8, bl),
                  z.reshape(FP_LIMBS, 8, bl))
        out = cv.tree_reduce_last(
            G1Jac(jnp.moveaxis(r.x, -2, -1), jnp.moveaxis(r.y, -2, -1),
                  jnp.moveaxis(r.z, -2, -1)), to=1)
        return out.x

    progs["combine8"] = (p_comb, (comb_pts.x, comb_pts.y, comb_pts.z))

    def sync(o):
        return np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])

    results = {}
    for name, (fn, args) in progs.items():
        out = fn(*args)
        sync(out)
        K = 10
        ts = []
        for _ in range(3):
            t = time.perf_counter()
            for _k in range(K):
                out = fn(*args)
            sync(out)
            ts.append((time.perf_counter() - t) / K)
        med = float(np.median(ts))
        results[name] = round(med * 1e3, 2)
        log(f"{name}: {med*1e3:8.2f} ms")

    line = {"metric": "msm_fixed_cost_probe_D8", **results, "unit": "ms"}
    print(json.dumps(line))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PROFILE_MSM.log"), "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
