"""Stage-split timing of msm_fused_bgmw at the production size.

Runs each pipeline stage as its own jitted program on the chip:
  digits    c-bit window extraction
  sort      sort_key_val + searchsorted + split (slot bookkeeping)
  meta      the per-round meta element gather (meta_sorted[src_pos])
  slab      the per-round QUAD gather (round 1 shape)
  kernel    one accumulation round (the Pallas madd grid)
  combine   unpermute + weighted partial sums + horner

Stage sums exceed the fused end-to-end time (XLA overlaps stages), but
the RATIOS say where optimization effort pays.  Appends to
tools/PROFILE_MSM.log.

Run:  python tools/profile_msm.py     (2^19, bgmw c=16)
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


SCALE = int(os.environ.get("P_SCALE", "19"))
N = 1 << SCALE
ITERS = int(os.environ.get("P_ITERS", "5"))
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
    from fourier_tpu.ops.curve import G1Jac
    from fourier_tpu.ops.field import FP

    log(f"devices={jax.devices()}")
    c = mf.bgmw_auto_window(N)
    W = -(-mf.SCALAR_BITS // c)
    with np.load(os.path.join(CACHE, f"bgmw_{SCALE}_{c}.npz")) as z:
        packed = jnp.asarray(z["packed"])
    WN = packed.shape[0]
    tab_inf = jnp.zeros((WN,), bool)
    rng = np.random.default_rng(5)
    sc = rng.integers(0, 1 << 16, size=(FR_LIMBS, N), dtype=np.uint32)
    sc[-1] &= 0x7FFF
    scal = jnp.asarray(sc)

    B = 1 << c
    cap = mf._split_cap(WN, B, factor=64)
    spare = max(mf.BTILE // 8, -(-WN // cap))
    Bp = B + spare
    n_tiles = -(-Bp // mf.BTILE)
    G = mf._grid_size(WN, n_tiles, table_rows=WN)
    BT = n_tiles * mf.BTILE
    log(f"c={c} W={W} WN={WN} B={B} Bp={Bp} n_tiles={n_tiles} G={G}")

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(out)
        ts = []
        for _ in range(ITERS):
            t = time.perf_counter()
            out = fn(*args)
            sync(out)
            ts.append(time.perf_counter() - t)
        med = float(np.median(ts))
        log(f"{name}: {med*1000:8.1f} ms (min {min(ts)*1000:.1f})")
        return med, out

    results = {}

    # digits
    dig_fn = jax.jit(lambda s: msm_mod._all_window_digits(s, c, W).reshape(-1))
    results["digits"], digits_flat = timeit("digits", dig_fn, scal)

    # sort + split bookkeeping (meta rides the sort — ops.msm_fused)
    def sort_split(dflat):
        meta = mf._row_meta(WN, jnp.zeros((WN,), jnp.uint32))
        sd, meta_sorted = jax.lax.sort_key_val(dflat, meta)
        edges = jnp.searchsorted(
            sd, jnp.arange(B + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        counts = edges[1:] - edges[:-1]
        counts = counts.at[0].set(0)
        starts = edges[:-1]
        cs, ss, w = mf._split_heavy_slots(counts, starts, cap, spare)
        pad = BT - cs.shape[0]
        csf = jnp.concatenate([cs, jnp.zeros((pad,), jnp.int32)])
        ssf = jnp.concatenate([ss, jnp.zeros((pad,), jnp.int32)])
        csort = jnp.argsort(-csf).astype(jnp.int32)
        return meta_sorted, csf[csort], ssf[csort], csort, w

    results["sort+split"], (meta_sorted, counts_slot, starts_slot, csort,
                            weights) = \
        timeit("sort+split", jax.jit(sort_split), digits_flat)

    # round-1 slab indices, computed HOST-SIDE (the jitted slab-build
    # program has crashed the tunnel's remote-compile service twice; the
    # on-device cost of this stage is ~the gathers plus ~50 ms indexing)
    meta_np = np.asarray(meta_sorted)
    counts_np = np.asarray(counts_slot)
    starts_np = np.asarray(starts_slot)
    r_tile = counts_np.reshape(n_tiles, mf.BTILE).max(axis=1)
    extra_req = np.maximum(r_tile - 1, 0)
    cum = np.concatenate([[0], np.cumsum(extra_req)[:-1]])
    r_alloc = 1 + np.clip((G - n_tiles) - cum, 0, extra_req)
    off = np.concatenate([[0], np.cumsum(r_alloc)[:-1]])
    gs = np.arange(G)
    live = gs < off[-1] + r_alloc[-1]
    tile_id_np = np.clip(np.searchsorted(off, gs, side="right") - 1,
                         0, n_tiles - 1)
    tile_id_np = np.where(live, tile_id_np, n_tiles - 1).astype(np.int32)
    row_id = np.where(live, gs - off[tile_id_np], -1)
    rank = row_id[:, None]
    valid = (rank >= 0) & (
        rank < counts_np.reshape(n_tiles, mf.BTILE)[tile_id_np])
    src_pos = np.clip(starts_np.reshape(n_tiles, mf.BTILE)[tile_id_np]
                      + rank, 0, WN - 1).reshape(-1)
    valid_f = valid.reshape(-1)
    vk = jnp.asarray(np.where(row_id == 0, 2, 0).astype(np.int32))
    tile_id = jnp.asarray(tile_id_np)

    # the meta lookup with the REAL positions, as production does it:
    # width-8 row gathers + a select tree (ops.msm_fused round_body)
    mpad = (-meta_np.shape[0]) % 8
    meta_padded = np.concatenate([meta_np, np.zeros(mpad, meta_np.dtype)])
    meta_oct_np = meta_padded.reshape(-1, 8)

    def meta_fn(m8, s):
        octs = jnp.take(m8, s >> 3, axis=0)
        sel = s & 7
        cols = [octs[:, k] for k in range(8)]
        for bit in range(3):
            pick = ((sel >> bit) & 1).astype(bool)
            cols = [jnp.where(pick, cols[2 * i + 1], cols[2 * i])
                    for i in range(len(cols) // 2)]
        return cols[0]

    results["meta-gather"], meta_lanes = timeit(
        "meta-gather (oct, real src_pos)", jax.jit(meta_fn),
        jnp.asarray(meta_oct_np), jnp.asarray(src_pos.astype(np.int32)))
    meta_lanes = np.asarray(meta_lanes)
    qsrc_np = np.where(valid_f, meta_lanes >> 4, 0).astype(np.int32)
    slab_inf = jnp.asarray(
        np.where(valid_f, meta_lanes & 15, 1).astype(np.uint32)[None])

    # the slab QUAD gather with the REAL quad indices
    # NOTE: the table must be an ARGUMENT — a closed-over array becomes
    # an HLO constant and the tunnel's remote_compile rejects the
    # multi-hundred-MB program (HTTP 413).
    packed_q = jnp.asarray(np.asarray(packed).reshape(-1, 4 * 24))
    # gather layout [GB, 4L] — the kernel transposes the selected
    # quarter in VMEM (no whole-slab transpose since round 4)
    src_only = jax.jit(lambda p, s: jnp.take(p, s, axis=0))
    results["gather-only"], slab_pw = timeit(
        "gather-only (quad)", src_only, packed_q, jnp.asarray(qsrc_np))

    # one accumulation round (the Pallas kernel)
    acc0 = G1Jac(
        jnp.zeros((24, BT), jnp.uint32),
        jnp.zeros((24, BT), jnp.uint32),
        jnp.zeros((24, BT), jnp.uint32),
    )

    def kern(vk, tile_id, slab_pw, slab_inf, ax, ay, az):
        out, fl = mf._run_accum_kernel(vk, tile_id, slab_pw, slab_inf,
                                       G1Jac(ax, ay, az))
        return out.x, out.y, out.z, fl

    results["kernel-round"], _ = timeit(
        "kernel (1 round, G grid)", jax.jit(kern),
        vk, tile_id, slab_pw, slab_inf, acc0.x, acc0.y, acc0.z)

    # combine: unpermute + weighted partial sums + horner
    inv_csort = jnp.argsort(csort).astype(jnp.int32)

    def combine(ax, ay, az, weights):
        canon = inv_csort[:Bp]
        buckets = G1Jac(
            jnp.take(ax, canon, axis=-1),
            jnp.take(ay, canon, axis=-1),
            jnp.take(az, canon, axis=-1),
        )
        s = mf._weighted_partial_sums(buckets, weights, c)
        r = msm_mod._horner_2k(s)
        return r.x, r.y, r.z

    results["combine"], _ = timeit(
        "combine (wps+horner)", jax.jit(combine),
        acc0.x, acc0.y, acc0.z, weights)

    # end-to-end for reference
    e2e = jax.jit(lambda p, i, s: mf.msm_fused_bgmw(p, i, s, c).x)
    results["end-to-end"], _ = timeit("end-to-end msm_fused_bgmw", e2e,
                                      packed, tab_inf, scal)

    line = {"metric": f"msm_bgmw_phase_budget_2^{SCALE}_c{c}",
            **{k: round(v * 1000, 1) for k, v in results.items()},
            "unit": "ms"}
    print(json.dumps(line))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PROFILE_MSM.log"), "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
