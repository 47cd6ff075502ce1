"""Cross-match fused-MSM accumulator slots against analytic expectations.

Follow-up to bisect_skew E6: every active slot is wrong in value; this
tool checks whether the slot values are a PERMUTATION of the expected
ones (wrong slot assignment) or genuinely corrupted sums (wrong math),
by matching each got value against the set of all expected slot values.

Run on the TPU host:  python tools/bisect_slot.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-t0:7.1f}s] {m}", file=sys.stderr, flush=True)


SCALE = int(os.environ.get("V_SCALE", "12"))
N = 1 << SCALE
CACHE = os.path.expanduser("~/.cache/fourier_tpu_bench")

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fourier_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from fourier_tpu.constants import FP_LIMBS, FR_LIMBS, R
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.curve import G1Aff, G1Jac, to_affine
    from fourier_tpu.ops.field import FP
    from fourier_tpu.ops.limbs import int_to_limbs
    from fourier_tpu.refimpl import curve as rc

    with np.load(f"{CACHE}/points_host_{SCALE}.npz") as z:
        xs, ys = z["x"], z["y"]  # canonical limbs (host convention)
    rng = np.random.default_rng(7)
    uniform = rng.integers(0, 1 << 16, size=(FR_LIMBS, N), dtype=np.uint32)
    uniform[-1] &= 0x7FFF
    skew = np.repeat(uniform[:, :1], N, axis=1)
    points = G1Aff(FP.to_mont(jnp.asarray(xs)), FP.to_mont(jnp.asarray(ys)),
                   jnp.zeros((N,), bool))
    scal = jnp.asarray(skew)

    c = 9
    B = 1 << c
    W = -(-mf.SCALAR_BITS // c)
    cap = mf._split_cap(N, B)
    spare = max(mf.BTILE // 8, -(-N // cap))
    Bp = B + spare
    n_tiles = -(-(W * Bp) // mf.BTILE)
    G = mf._grid_size(N * W, n_tiles)

    digits = np.asarray(msm_mod._all_window_digits(scal, c, W))
    order = np.argsort(digits, axis=-1, kind="stable").astype(np.int32)
    edges = np.stack([
        np.searchsorted(np.take_along_axis(digits, order, axis=-1)[w],
                        np.arange(B + 1), side="left")
        for w in range(W)
    ]).astype(np.int32)
    cnt = edges[:, 1:] - edges[:, :-1]
    cnt[:, 0] = 0
    starts = edges[:, :-1] + (np.arange(W, dtype=np.int32) * N)[:, None]
    counts_s, starts_s, weights = map(np.asarray, mf._split_heavy_slots(
        jnp.asarray(cnt), jnp.asarray(starts), cap, spare))

    counts_flat = counts_s.reshape(-1)
    starts_flat = starts_s.reshape(-1)
    BT = n_tiles * mf.BTILE
    pad = BT - counts_flat.shape[0]
    counts_flat = np.concatenate([counts_flat, np.zeros(pad, np.int32)])
    starts_flat = np.concatenate([starts_flat, np.zeros(pad, np.int32)])
    csort = np.argsort(-counts_flat, kind="stable").astype(np.int32)
    counts_slot = counts_flat[csort]
    starts_slot = starts_flat[csort]
    order_flat = order.reshape(-1)
    packed = np.asarray(mf.pack_points(points))
    inf = np.zeros((N,), bool)
    tile_of_slot = np.arange(BT) // mf.BTILE
    avail = G - n_tiles

    def excl(x):
        cc = np.cumsum(x)
        return np.concatenate([[0], cc[:-1]])

    acc = tuple(np.zeros((FP_LIMBS, BT), np.uint32) for _ in range(3))
    done = np.zeros(BT, np.int64)
    first = True
    while np.any(done < counts_slot):
        rem = counts_slot - done
        r_tile = rem.reshape(n_tiles, mf.BTILE).max(axis=1)
        extra_req = np.maximum(r_tile - 1, 0)
        extra_alloc = np.clip(avail - excl(extra_req), 0, extra_req)
        r_alloc = 1 + extra_alloc
        off = excl(r_alloc)
        g_used = off[-1] + r_alloc[-1]
        gs = np.arange(G)
        live = gs < g_used
        tile_id = np.clip(np.searchsorted(off, gs, side="right") - 1,
                          0, n_tiles - 1)
        tile_id = np.where(live, tile_id, n_tiles - 1).astype(np.int32)
        row_id = np.where(live, gs - off[tile_id], -1)
        vk = np.where(row_id == 0, 2 if first else 1, 0).astype(np.int32)
        rank = done.reshape(n_tiles, mf.BTILE)[tile_id] + row_id[:, None]
        valid = (row_id[:, None] >= 0) & (
            rank < counts_slot.reshape(n_tiles, mf.BTILE)[tile_id])
        src_pos = np.clip(
            starts_slot.reshape(n_tiles, mf.BTILE)[tile_id] + rank, 0,
            order_flat.shape[0] - 1)
        src = np.where(valid, order_flat[src_pos], 0).reshape(-1)
        slab_pw = packed[src].T
        slab_inf = ((~valid.reshape(-1)) | inf[src])[None].astype(np.uint32)
        new_acc, fl = mf._run_accum_kernel(
            jnp.asarray(vk), jnp.asarray(tile_id), jnp.asarray(slab_pw),
            jnp.asarray(slab_inf), G1Jac(*[jnp.asarray(a) for a in acc]))
        acc = (np.asarray(FP.canonicalize(new_acc.x)),
               np.asarray(FP.canonicalize(new_acc.y)),
               np.asarray(FP.canonicalize(new_acc.z)))
        done = done + np.clip(rem, 0, r_alloc[tile_of_slot])
        first = False
    log("rounds done")

    # analytic expected values for every contiguous range [a*cap, b)
    pow5 = [0] * (N + 1)
    a5, p5 = 0, 5
    for j in range(N):
        a5 = (a5 + p5) % R
        p5 = p5 * 5 % R
        pow5[j + 1] = a5

    def range_xy(a, b):
        d = (pow5[b] - pow5[a]) % R
        return rc.g1_mul_fast(rc.G1_GEN, d)

    nextra = (N - 1) // cap
    exp_by_chunk = {}
    for p in range(nextra + 1):
        a = p * cap
        b = min(N, a + cap)
        x, y = range_xy(a, b)
        exp_by_chunk[bytes(int_to_limbs(x, FP_LIMBS))] = ("chunk", p)
    # also prefix sums [0, k*cap) in case slots hold running prefixes
    for k in range(1, nextra + 2):
        x, y = range_xy(0, min(N, k * cap))
        exp_by_chunk.setdefault(
            bytes(int_to_limbs(x, FP_LIMBS)), ("prefix", k))

    aff = to_affine(G1Jac(*[jnp.asarray(a) for a in acc]))
    ax = np.asarray(FP.from_mont(aff.x))
    ainf = np.asarray(aff.inf)

    # examine window 0's slots: main (d_w) and spares
    d0 = int(digits[0, 0])
    inv_csort = np.argsort(csort, kind="stable").astype(np.int32)

    def got_of_flat(flat):
        pos = inv_csort[flat]
        if ainf[pos]:
            return "INF"
        key = bytes(ax[:, pos])
        return exp_by_chunk.get(key, "UNKNOWN")

    log(f"window 0: d_w={d0}")
    log(f"  main slot (flat {0*Bp + d0}): {got_of_flat(0 * Bp + d0)} "
        f"(expected ('chunk', 0))")
    for e in range(min(8, nextra)):
        flat = 0 * Bp + B + e
        log(f"  spare {e} (flat {flat}): {got_of_flat(flat)} "
            f"(expected ('chunk', {e+1}))")
    # a couple from the last window too
    dl = int(digits[W - 1, 0])
    log(f"window {W-1}: d_w={dl}")
    log(f"  main slot: {got_of_flat((W-1) * Bp + dl)} (expected chunk 0)")
    for e in range(3):
        log(f"  spare {e}: {got_of_flat((W-1) * Bp + B + e)} "
            f"(expected chunk {e+1})")


if __name__ == "__main__":
    main()
