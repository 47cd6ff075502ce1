"""Bisect the on-chip fused-MSM skew mismatch (round-2 VERDICT headline).

Repro: all-equal scalars at n=2^12 give wrong commitments from the
compiled (Mosaic) msm_fused / msm_fused_bgmw while the interpreter path
passes.  This tool localizes the divergence:

  E1  confirm the mismatch at several window sizes
  E2  force a single slab round (SLACK bump) -> isolates the multi-round
      machinery if it passes
  E3  hand-step the round loop, running each round under BOTH the Mosaic
      kernel and the interpreted kernel on the same inputs; report the
      first divergent (round, tile, lane)

Run on the TPU host:  python tools/bisect_skew.py
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
os.makedirs(CACHE, exist_ok=True)

import numpy as np  # noqa: E402


def host_points():
    """P_j = 5^(j+1) * G as CANONICAL limb arrays, generated host-side.

    NOTE: device G1Aff coordinates are MONTGOMERY-form limbs; callers
    must FP.to_mont these before building points.  (The bench tools'
    points_{scale}.npz files store Montgomery arrays — different
    convention, hence the _host_ filename.)"""
    path = f"{CACHE}/points_host_{SCALE}.npz"
    if os.path.exists(path):
        with np.load(path) as z:
            return z["x"], z["y"]
    from fourier_tpu.constants import FP_LIMBS
    from fourier_tpu.ops.limbs import int_to_limbs
    from fourier_tpu.refimpl import curve as rc

    xs = np.zeros((FP_LIMBS, N), np.uint32)
    ys = np.zeros((FP_LIMBS, N), np.uint32)
    p = rc.g1_mul_fast(rc.G1_GEN, 5)
    for j in range(N):
        xs[:, j] = int_to_limbs(p[0], FP_LIMBS)
        ys[:, j] = int_to_limbs(p[1], FP_LIMBS)
        if j + 1 < N:
            p = rc.g1_mul_fast(p, 5)
    np.savez(path, x=xs, y=ys)
    return xs, ys


def expected_skew(skew_limbs):
    from fourier_tpu.constants import FP_LIMBS, R
    from fourier_tpu.ops.limbs import int_to_limbs, limbs_to_int
    from fourier_tpu.refimpl import curve as rc

    s = limbs_to_int(skew_limbs[:, 0])
    dlog_sum = sum(pow(5, j + 1, R) for j in range(N)) % R
    ex, ey = rc.g1_mul_fast(rc.G1_GEN, s * dlog_sum % R)
    return (np.asarray(int_to_limbs(ex, FP_LIMBS), np.uint32),
            np.asarray(int_to_limbs(ey, FP_LIMBS), np.uint32))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fourier_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from fourier_tpu.constants import FR_LIMBS
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.curve import G1Aff, to_affine

    from fourier_tpu.ops.field import FP as _FPm

    log(f"devices={jax.devices()}")
    xs, ys = host_points()
    log("points ready")
    rng = np.random.default_rng(7)
    uniform = rng.integers(0, 1 << 16, size=(FR_LIMBS, N), dtype=np.uint32)
    uniform[-1] &= 0x7FFF
    skew = np.repeat(uniform[:, :1], N, axis=1)
    exp_x, exp_y = expected_skew(skew)
    log("expected (analytic) ready")

    # device coordinates are Montgomery-form limbs
    points = G1Aff(_FPm.to_mont(jnp.asarray(xs)),
                   _FPm.to_mont(jnp.asarray(ys)),
                   jnp.zeros((N,), bool))
    scal = jnp.asarray(skew)

    from fourier_tpu.ops.field import FP as FPf
    from fourier_tpu.ops.limbs import limbs_to_ints

    def analytic(scalar_limbs):
        """Expected MSM result via known dlogs: sum_j s_j * 5^(j+1) * G."""
        from fourier_tpu.ops.limbs import int_to_limbs
        from fourier_tpu.refimpl import curve as rc

        svals = limbs_to_ints(np.asarray(scalar_limbs).T)
        total = 0
        p5 = 5
        for s in svals:
            total = (total + s * p5) % R_CONST
            p5 = p5 * 5 % R_CONST
        ex, ey = rc.g1_mul_fast(rc.G1_GEN, total)
        return (np.asarray(int_to_limbs(ex, FP_LIMBS_C), np.uint32),
                np.asarray(int_to_limbs(ey, FP_LIMBS_C), np.uint32))

    from fourier_tpu.constants import FP_LIMBS as FP_LIMBS_C
    from fourier_tpu.constants import R as R_CONST

    def check(tag, jac, ex=None, ey=None):
        if ex is None:
            ex, ey = exp_x, exp_y
        aff = to_affine(jac)
        # canonical compare: device affine coords are Montgomery
        gx = np.asarray(FPf.from_mont(aff.x)).ravel()
        gy = np.asarray(FPf.from_mont(aff.y)).ravel()
        ok = np.array_equal(gx, ex.ravel()) and np.array_equal(gy, ey.ravel())
        log(f"{tag}: {'OK' if ok else 'MISMATCH'}")
        return ok

    run_e12 = os.environ.get("BISECT_E12", "1") == "1"
    uni_x, uni_y = analytic(uniform)
    # --- E1: confirm repro across window sizes -------------------------
    for c in (8, 9) if run_e12 else ():
        W = -(-mf.SCALAR_BITS // c)
        B = 1 << c
        cap = mf._split_cap(N, B)
        spare = max(mf.BTILE // 8, -(-N // cap))
        Bp = B + spare
        n_tiles = -(-(W * Bp) // mf.BTILE)
        G = mf._grid_size(N * W, n_tiles)
        log(f"c={c}: W={W} B={B} cap={cap} spare={spare} "
            f"n_tiles={n_tiles} G={G} avail={G-n_tiles}")
        check(f"E1 fused c={c} uniform",
              mf.msm_fused(points, jnp.asarray(uniform), c), uni_x, uni_y)
        check(f"E1 fused c={c} skew", mf.msm_fused(points, scal, c))

    # --- E2: force single round ----------------------------------------
    if run_e12:
        old_slack = mf.SLACK
        mf.SLACK = 4.0
        mf.msm_fused_packed.clear_cache()
        mf.msm_fused.clear_cache()
        try:
            check("E2 fused c=9 SLACK=4 (single-round)",
                  mf.msm_fused(points, scal, 9))
        finally:
            mf.SLACK = old_slack
            mf.msm_fused_packed.clear_cache()
            mf.msm_fused.clear_cache()

    # --- E3: hand-stepped rounds, Mosaic vs interpreter ------------------
    import fourier_tpu.ops.pallas_curve as pc
    from fourier_tpu.ops.curve import G1Jac
    from fourier_tpu.ops.field import FP

    c = 9
    B = 1 << c
    W = -(-mf.SCALAR_BITS // c)
    cap = mf._split_cap(N, B)
    spare = max(mf.BTILE // 8, -(-N // cap))
    Bp = B + spare
    n_tiles = -(-(W * Bp) // mf.BTILE)
    G = mf._grid_size(N * W, n_tiles)

    # --- E4: device slab construction vs host mirror ---------------------
    dig_dev = msm_mod._all_window_digits(scal, c, W)
    order_dev = jnp.argsort(dig_dev, axis=-1).astype(jnp.int32)
    sd_dev = jnp.take_along_axis(dig_dev, order_dev, axis=-1)
    edges_dev = jax.vmap(
        lambda row: jnp.searchsorted(
            row, jnp.arange((1 << c) + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    )(sd_dev)
    cnt_dev = edges_dev[:, 1:] - edges_dev[:, :-1]
    cnt_dev = cnt_dev.at[:, 0].set(0)
    starts_dev = (edges_dev[:, :-1]
                  + (jnp.arange(W, dtype=jnp.int32) * N)[:, None])
    cs_dev, ss_dev, w_dev = mf._split_heavy_slots(
        cnt_dev, starts_dev, cap, spare)

    digits = np.asarray(dig_dev)
    order = np.argsort(digits, axis=-1, kind="stable").astype(np.int32)
    sd = np.take_along_axis(digits, order, axis=-1)
    edges = np.stack([np.searchsorted(row, np.arange(B + 1), side="left")
                      for row in sd]).astype(np.int32)
    cnt = edges[:, 1:] - edges[:, :-1]
    cnt[:, 0] = 0
    starts = edges[:, :-1] + (np.arange(W, dtype=np.int32) * N)[:, None]

    counts_s, starts_s, weights = map(np.asarray, mf._split_heavy_slots(
        jnp.asarray(cnt), jnp.asarray(starts), cap, spare))
    for nm, dv, hv in (("counts", cs_dev, counts_s),
                       ("starts", ss_dev, starts_s),
                       ("weights", w_dev, weights),
                       ("order", order_dev, order)):
        same = np.array_equal(np.asarray(dv), hv)
        log(f"E4 device-vs-host {nm}: {'same' if same else 'DIFFERENT'}")
    log(f"E3: split done; total load={counts_s.sum()} "
        f"max slot={counts_s.max()}")
    rounds_pred = mf.simulate_rounds(counts_s.reshape(-1), n_tiles, G)
    log(f"E3: predicted rounds = {rounds_pred}")

    # flatten + pad + count-descending pack (host mirror of _slab_rounds)
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
        c_ = np.cumsum(x)
        return np.concatenate([[0], c_[:-1]])

    from functools import partial

    def run_kernel(interp, vk, tile_id, slab_pw, slab_inf, acc):
        old = pc.interpret
        pc.interpret = lambda: interp
        try:
            fn = partial(mf._run_accum_kernel)
            out = fn(jnp.asarray(vk), jnp.asarray(tile_id),
                     jnp.asarray(slab_pw), jnp.asarray(slab_inf),
                     G1Jac(*[jnp.asarray(a) for a in acc]))
            new_acc, fl = out
            return (np.asarray(FP.canonicalize(new_acc.x)),
                    np.asarray(FP.canonicalize(new_acc.y)),
                    np.asarray(FP.canonicalize(new_acc.z)),
                    np.asarray(fl))
        finally:
            pc.interpret = old

    from fourier_tpu.constants import FP_LIMBS
    acc_m = tuple(np.zeros((FP_LIMBS, BT), np.uint32) for _ in range(3))
    acc_i = tuple(np.zeros((FP_LIMBS, BT), np.uint32) for _ in range(3))
    done = np.zeros(BT, np.int64)
    first = True
    rnd = 0
    while np.any(done < counts_slot):
        rnd += 1
        rem = counts_slot - done
        r_tile = rem.reshape(n_tiles, mf.BTILE).max(axis=1)
        extra_req = np.maximum(r_tile - 1, 0)
        cum = excl(extra_req)
        extra_alloc = np.clip(avail - cum, 0, extra_req)
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
        done_rows = done.reshape(n_tiles, mf.BTILE)
        counts_rows = counts_slot.reshape(n_tiles, mf.BTILE)
        starts_rows = starts_slot.reshape(n_tiles, mf.BTILE)
        rank = done_rows[tile_id] + row_id[:, None]
        valid = (row_id[:, None] >= 0) & (rank < counts_rows[tile_id])
        src_pos = np.clip(starts_rows[tile_id] + rank, 0,
                          order_flat.shape[0] - 1)
        src = np.where(valid, order_flat[src_pos], 0).reshape(-1)
        slab_pw = packed[src].T
        slab_inf = ((~valid.reshape(-1)) | inf[src])[None].astype(np.uint32)

        rm = run_kernel(False, vk, tile_id, slab_pw, slab_inf, acc_m)
        ri = run_kernel(True, vk, tile_id, slab_pw, slab_inf, acc_i)
        log(f"round {rnd}: mosaic flags={rm[3].sum()} "
            f"interp flags={ri[3].sum()}")
        for name, a, b in zip("xyz", rm[:3], ri[:3]):
            if not np.array_equal(a, b):
                bad = np.argwhere((a != b).any(axis=0)).ravel()
                log(f"round {rnd}: DIVERGED on {name} at {len(bad)} lanes; "
                    f"first lanes {bad[:12].tolist()}")
                bt = sorted(set((bad // mf.BTILE).tolist()))
                log(f"  tiles affected: {bt}")
                lane = int(bad[0])
                log(f"  lane {lane}: tile {lane // mf.BTILE} "
                    f"slotpos {lane % mf.BTILE} count={counts_slot[lane]} "
                    f"done_before={done[lane]} vk_rows this round: "
                    f"r_alloc[tile]={r_alloc[lane // mf.BTILE]}")
                log(f"  mosaic {name}[:, lane]={a[:, lane].tolist()}")
                log(f"  interp {name}[:, lane]={b[:, lane].tolist()}")
                return
        acc_m, acc_i = rm[:3], ri[:3]
        done = done + np.clip(rem, 0, r_alloc[tile_of_slot])
        first = False
    log(f"E3: all {rnd} rounds bit-identical between Mosaic and interpreter")

    # --- E5: the combine path, stage by stage ----------------------------
    inv_csort = np.argsort(csort, kind="stable").astype(np.int32)
    canon = inv_csort[: W * Bp]
    w_dev_arr = jnp.asarray(weights)

    def stage_ps(interp, acc):
        old = pc.interpret
        pc.interpret = lambda: interp
        try:
            def f(ax, ay, az):
                buckets = G1Jac(
                    jnp.take(ax, canon, axis=-1).reshape(FP_LIMBS, W, Bp),
                    jnp.take(ay, canon, axis=-1).reshape(FP_LIMBS, W, Bp),
                    jnp.take(az, canon, axis=-1).reshape(FP_LIMBS, W, Bp),
                )
                ps = mf._weighted_partial_sums(buckets, w_dev_arr, c)
                return ps.x, ps.y, ps.z
            out = jax.jit(f)(*[jnp.asarray(a) for a in acc])
            return tuple(np.asarray(o) for o in out)
        finally:
            pc.interpret = old

    def stage_horner(interp, ps):
        old = pc.interpret
        pc.interpret = lambda: interp
        try:
            def f(px, py, pz):
                r = px.shape[-1]
                res = msm_mod._horner_2k(G1Jac(
                    px.reshape(FP_LIMBS, W * c, r),
                    py.reshape(FP_LIMBS, W * c, r),
                    pz.reshape(FP_LIMBS, W * c, r),
                ))
                return res.x, res.y, res.z
            out = jax.jit(f)(*[jnp.asarray(a) for a in ps])
            return tuple(np.asarray(o) for o in out)
        finally:
            pc.interpret = old

    ps_m = stage_ps(False, acc_m)
    ps_i = stage_ps(True, acc_m)
    same_ps = all(np.array_equal(a, b) for a, b in zip(ps_m, ps_i))
    log(f"E5 weighted-partial-sums mosaic-vs-interp: "
        f"{'same' if same_ps else 'DIFFERENT'}")
    if not same_ps:
        bad = np.argwhere((ps_m[0] != ps_i[0]).any(axis=0))
        log(f"  first differing ps lanes (w, c, r): {bad[:8].tolist()}")

    h_m = stage_horner(False, ps_i)
    h_i = stage_horner(True, ps_i)
    same_h = all(np.array_equal(a, b) for a, b in zip(h_m, h_i))
    log(f"E5 horner mosaic-vs-interp: {'same' if same_h else 'DIFFERENT'}")

    # golden: fully interpreted combine from the validated accumulator
    from fourier_tpu.ops.curve import to_affine as _to_aff
    for tag, h in (("mosaic", h_m), ("interp", h_i)):
        aff = _to_aff(G1Jac(*[jnp.asarray(a) for a in h]))
        gx = np.asarray(FPf.from_mont(aff.x)).ravel()
        gy = np.asarray(FPf.from_mont(aff.y)).ravel()
        ok = np.array_equal(gx, exp_x) and np.array_equal(gy, exp_y)
        log(f"E5 final ({tag} horner on interp ps): "
            f"{'OK' if ok else 'MISMATCH'}")

    # --- E6: accumulator slots vs analytic ground truth ------------------
    # Skew + identity order: window w's bucket d_w sorted run is points
    # 0..n-1 in order; slot chunks are contiguous ranges with known dlogs.
    from fourier_tpu.constants import R
    from fourier_tpu.ops.limbs import int_to_limbs
    from fourier_tpu.refimpl import curve as rc

    pow5 = [0] * (N + 1)  # prefix dlog sums: sum_{j<i} 5^(j+1) mod R
    acc5 = 0
    p5 = 5
    for j in range(N):
        acc5 = (acc5 + p5) % R
        p5 = p5 * 5 % R
        pow5[j + 1] = acc5

    def range_point(a, b):
        if a >= b:
            return None
        d = (pow5[b] - pow5[a]) % R
        if d == 0:
            return None
        return rc.g1_mul_fast(rc.G1_GEN, d)

    # expected value per flat slot (w, k) in [W, Bp]
    exp_slot = {}
    for w in range(W):
        d_w = int(digits[w, 0])
        if d_w == 0:
            continue
        # main slot
        exp_slot[(w, d_w)] = range_point(0, min(N, cap))
        # spare slots
        nextra = (N - 1) // cap
        for e in range(nextra):
            pnum = e + 1
            a = pnum * cap
            b = min(N, a + cap)
            exp_slot[(w, (1 << c) + e)] = range_point(a, b)

    from fourier_tpu.ops.field import FP as _FP

    aff_acc = _to_aff(G1Jac(*[jnp.asarray(a) for a in acc_m]))
    ax_np = np.asarray(_FP.from_mont(aff_acc.x))
    ay_np = np.asarray(_FP.from_mont(aff_acc.y))
    ainf_np = np.asarray(aff_acc.inf)
    n_bad = 0
    for pos in range(BT):
        flat = csort[pos]
        wk = (flat // Bp, flat % Bp) if flat < W * Bp else None
        expv = exp_slot.get(wk)
        got_inf = bool(ainf_np[pos])
        if expv is None:
            ok = got_inf
        else:
            ex = int_to_limbs(expv[0], FP_LIMBS)
            ey = int_to_limbs(expv[1], FP_LIMBS)
            ok = (not got_inf and np.array_equal(ax_np[:, pos], ex)
                  and np.array_equal(ay_np[:, pos], ey))
        if not ok:
            n_bad += 1
            if n_bad <= 8:
                log(f"E6 BAD slot pos={pos} flat={flat} wk={wk} "
                    f"exp_none={expv is None} got_inf={got_inf} "
                    f"count={counts_slot[pos]}")
    log(f"E6: {n_bad}/{BT} accumulator slots wrong")

    # --- E7: expected weighted partial sums ------------------------------
    # ps[w, j] should be B_w (the full bucket sum) iff bit j of d_w is set.
    from fourier_tpu.ops.curve import fold_small as cv_fold

    full = range_point(0, N)
    folded = jax.jit(
        lambda px, py, pz: cv_fold(G1Jac(px, py, pz))
    )(*[jnp.asarray(a) for a in ps_i])
    aff_ps = _to_aff(G1Jac(folded.x[..., 0], folded.y[..., 0],
                           folded.z[..., 0]))
    px_can = np.asarray(_FP.from_mont(aff_ps.x))
    py_can = np.asarray(_FP.from_mont(aff_ps.y))
    pinf_np = np.asarray(aff_ps.inf)
    ex_full = int_to_limbs(full[0], FP_LIMBS)
    ey_full = int_to_limbs(full[1], FP_LIMBS)
    n_bad = 0
    for w in range(W):
        d_w = int(digits[w, 0])
        for j in range(c):
            want = (d_w >> j) & 1
            got_inf = bool(pinf_np[w, j])
            if want == 0:
                ok = got_inf
            else:
                ok = (not got_inf
                      and np.array_equal(px_can[:, w, j], ex_full)
                      and np.array_equal(py_can[:, w, j], ey_full))
            if not ok:
                n_bad += 1
                if n_bad <= 8:
                    log(f"E7 BAD ps w={w} j={j} d_w={d_w} want={want} "
                        f"got_inf={got_inf}")
    log(f"E7: {n_bad}/{W*c} partial sums wrong")


if __name__ == "__main__":
    main()
