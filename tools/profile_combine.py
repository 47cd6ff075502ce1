"""Sub-stage timing of the bgmw combine (unpermute + factorized
weighted reduction + horner) at the production 2^19/c=16 shape.

The round-4 phase budget puts combine at ~164 ms while its point-add
count says ~20 ms — this pins down where the rest lives (sequential
scan_sum tails, lane-axis gathers, launch overheads).  Appends to
tools/PROFILE_MSM.log.
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
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops import curve as cv
    from fourier_tpu.ops.curve import G1Jac

    log(f"devices={jax.devices()}")
    c = 16
    B = 1 << c
    WN = 16 << 19
    cap = mf._split_cap(WN, B, factor=64)
    spare = max(mf.BTILE // 8, -(-WN // cap))
    Bp = B + spare
    BT = -(-Bp // mf.BTILE) * mf.BTILE
    log(f"c={c} B={B} spare={spare} Bp={Bp} BT={BT}")

    rng = np.random.default_rng(3)

    def rnd(shape):
        return jnp.asarray(
            rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))

    acc = G1Jac(rnd((FP_LIMBS, BT)), rnd((FP_LIMBS, BT)),
                rnd((FP_LIMBS, BT)))
    canon = jnp.asarray(rng.permutation(BT)[:Bp].astype(np.int32))
    weights = jnp.asarray(
        np.concatenate([np.arange(B, dtype=np.int32),
                        rng.integers(0, B, spare, dtype=np.int32)]))

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    def timeit(name, fn, *args, iters=5):
        out = fn(*args)
        sync(out)
        ts = []
        for _ in range(iters):
            t = time.perf_counter()
            out = fn(*args)
            sync(out)
            ts.append(time.perf_counter() - t)
        med = float(np.median(ts))
        log(f"{name}: {med*1000:8.1f} ms (min {min(ts)*1000:.1f})")
        return med, out

    results = {}

    # a) unpermute: lane-axis take of Bp columns
    def unpermute(ax, ay, az):
        return (jnp.take(ax, canon, axis=-1), jnp.take(ay, canon, axis=-1),
                jnp.take(az, canon, axis=-1))

    results["unpermute"], bx = timeit("unpermute", jax.jit(unpermute),
                                      acc.x, acc.y, acc.z)
    buckets = G1Jac(*bx)

    # a2) fat-row unpermute (round-5 production path): one 288 B-row
    # gather of the xyz-stacked accumulator (ops.msm_fused._unpermute_rows)
    def unpermute_rows(ax, ay, az):
        out = mf._unpermute_rows(G1Jac(ax, ay, az), canon)
        return out.x, out.y, out.z

    results["unpermute-fatrow"], _ = timeit(
        "unpermute-fatrow", jax.jit(unpermute_rows), acc.x, acc.y, acc.z)

    # b) rows+cols sums of the main region
    h_bits = c // 2
    H = 1 << h_bits
    Gg = B >> h_bits

    def rowcol(bx, by, bz):
        main = G1Jac(bx[..., :B].reshape(FP_LIMBS, Gg, H),
                     by[..., :B].reshape(FP_LIMBS, Gg, H),
                     bz[..., :B].reshape(FP_LIMBS, Gg, H))
        rows = mf._reduce_axis(main, -1)
        cols = mf._reduce_axis(main, -2)
        return rows.x, rows.y, rows.z, cols.x, cols.y, cols.z

    results["rows+cols"], rc = timeit("rows+cols", jax.jit(rowcol),
                                      buckets.x, buckets.y, buckets.z)
    rows = G1Jac(*rc[:3])
    cols = G1Jac(*rc[3:])

    # c) bit partial sums of the small row/col vectors
    def bitps(rx, ry, rz, cx, cy, cz):
        low = msm_mod._bit_partial_sums(G1Jac(cx, cy, cz), h_bits)
        high = msm_mod._bit_partial_sums(G1Jac(rx, ry, rz), c - h_bits)
        return low.x, low.y, low.z, high.x, high.y, high.z

    results["bit-ps"], _ = timeit("bit-ps", jax.jit(bitps),
                                  rows.x, rows.y, rows.z,
                                  cols.x, cols.y, cols.z)

    # d) spare-slot weighted partial sums
    def spares(bx, by, bz, w):
        sp = G1Jac(bx[..., B:], by[..., B:], bz[..., B:])
        out = mf._weighted_partial_sums(sp, w[B:], c)
        return out.x, out.y, out.z

    results["spare-wps"], _ = timeit("spare-wps", jax.jit(spares),
                                     buckets.x, buckets.y, buckets.z,
                                     weights)

    # e) horner on the assembled terms
    terms = G1Jac(rnd((FP_LIMBS, c, 64)), rnd((FP_LIMBS, c, 64)),
                  rnd((FP_LIMBS, c, 64)))

    def horner(tx, ty, tz):
        out = msm_mod._horner_2k(G1Jac(tx, ty, tz))
        return out.x, out.y, out.z

    results["horner"], _ = timeit("horner", jax.jit(horner),
                                  terms.x, terms.y, terms.z)

    # f) the whole combine as one jitted program
    def whole(ax, ay, az, w):
        b = G1Jac(jnp.take(ax, canon, axis=-1),
                  jnp.take(ay, canon, axis=-1),
                  jnp.take(az, canon, axis=-1))
        s = mf._weighted_sums_factored(b, w, c, B)
        out = msm_mod._horner_2k(s)
        return out.x, out.y, out.z

    results["whole-combine"], _ = timeit("whole-combine", jax.jit(whole),
                                         acc.x, acc.y, acc.z, weights)

    line = {"metric": f"combine_budget_c{c}",
            **{k: round(v * 1000, 1) for k, v in results.items()},
            "unit": "ms"}
    print(json.dumps(line))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PROFILE_MSM.log"), "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
