"""Fused-slab Pippenger MSM: the TPU fast path for bucket accumulation.

TPU-native replacement for the hot kernel of rust-kzg-blst's
``g1_linear_combination`` (behind every commit/open in the reference,
src/engine/piano.rs:150,167,228,259,287,327).  The round-1 formulation
(ops/msm.py `_bucket_accumulate`) paid for a random HBM gather plus a
kernel dispatch on every `while_loop` step — ~60% of MSM wall time went
to ~2000 per-row gathers — and padded every bucket to the global max
count (~1.6x slack).  This module restructures the whole accumulation:

1. **Digits** for all windows at once (vector bit ops).
2. **Sub-bucket splitting**: a window whose top bit exceeds the scalar
   width has few effective buckets carrying huge loads (c=13 leaves the
   top window 9 effective bits: 512 buckets x ~2k points at 2^19 —
   which forced a serial tail through one accumulator tile).  Every
   window is therefore laid out over the same 2^c slots, with window w
   split s_w = 2^(c - eff_bits_w) ways: bucket d's points are dealt
   round-robin over s_w adjacent slots (a strided gather), equalizing
   slot loads across ALL W*2^c slots.  The combine re-weights split
   windows by dropping their low log2(s_w) bit-partial-sums — exact,
   zero extra cost.
3. **Batched per-window sort** of digits (one XLA sort over [W, n]).
4. **Count-descending slot packing**: all W*2^c slots (every window at
   once) are ordered by descending load and packed into tiles of BTILE
   slots.  Because tile-mates have near-equal counts, padding a tile to
   its own max count costs ~2% (vs ~60% for a global max).
5. **One packed slab gather** builds a contiguous stream of point
   tiles: lane (tile t, row r, slot j) holds the r-th point of the j-th
   slot of tile t.  Points travel as 24 u32 words (two 16-bit limbs per
   word, x and y together, 96 contiguous bytes per point), halving the
   gather traffic; the kernel unpacks with one mask+shift.
6. **One Pallas kernel** walks the slab: grid step g mixed-adds one
   [BTILE]-wide row of points into a VMEM-resident accumulator tile,
   revisited across that tile's rows (scalar-prefetched tile ids drive
   the output index map).  The accumulator touches HBM once per tile,
   not once per row.  The point add is the *incomplete* (collision
   flagged) formula from ops/pallas_curve; any flagged lane triggers an
   exact re-run of the round under the complete formulas (`lax.cond`).
7. **Bounded slab + multi-round**: the slab has a static capacity of
   ~1.06x the mean load; adversarially skewed digit distributions (a
   client-controlled input via workerCommit) spill into further rounds
   of the same program under a `while_loop` — worst case O(n*W) total
   work, same as uniform.

The jnp path in ops/msm.py remains the CPU/test reference; this module
is exercised under the Pallas interpreter in the suite and dispatched on
real TPU backends by ops.msm.msm.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import FP_LIMBS
from . import curve as cv
from . import pallas_curve as pc
from .curve import FP_COMPACT, G1Aff, G1Jac
from .field import FP, with_consts

# Buckets per accumulator tile (the kernel's batch width).  Tests shrink
# this to exercise multi-tile grids at small n.
BTILE = 1024

# Slab capacity as a multiple of the ideal (sum of slot loads).  With
# sub-bucket splitting the slot loads are near-uniform, so the ~2%
# tile-packing slack fits comfortably; skew spills to further rounds.
SLACK = 1.06

# Scalars are treated as SCALAR_BITS-bit integers when deriving each
# window's effective bucket count.  256 (not the 255 bits of Fr) keeps
# the generic API safe for any uint256 input; for canonical Fr scalars
# the top effective bucket range is simply half-empty.
SCALAR_BITS = 256

_HALF = FP_LIMBS // 2


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return jnp.concatenate([jnp.zeros((1,), x.dtype), c[:-1]])


def _window_plan(c: int):
    """Per-window effective bits and split factors (static)."""
    n_windows = -(-SCALAR_BITS // c)
    eff = [min(c, SCALAR_BITS - c * w) for w in range(n_windows)]
    splits = [1 << (c - e) for e in eff]
    return n_windows, eff, splits


def pack_points(points: G1Aff):
    """[n, FP_LIMBS] u32 table: word j < L/2 holds x limbs (j, j+L/2),
    word L/2+j holds y limbs (j, j+L/2) — 96 contiguous bytes/point."""
    xw = points.x[:_HALF] | (points.x[_HALF:] << 16)
    yw = points.y[:_HALF] | (points.y[_HALF:] << 16)
    return jnp.concatenate([xw, yw], axis=0).T


def _unpack_words(pw):
    """Inverse of pack_points on a [FP_LIMBS, ...] word block."""
    lo = pw & jnp.uint32(0xFFFF)
    hi = pw >> 16
    x = jnp.concatenate([lo[:_HALF], hi[:_HALF]], axis=0)
    y = jnp.concatenate([lo[_HALF:], hi[_HALF:]], axis=0)
    return x, y


# ---------------------------------------------------------------------------
# The accumulation kernel
# ---------------------------------------------------------------------------

def _accum_kernel(vk_ref, ti_ref, consts, spw, sinf, ax_in, ay_in, az_in,
                  ox, oy, oz, ofl):
    """Grid step g: acc[tile] = madd(acc[tile], slab_row_g).

    vk (visit kind) per g: 0 = continue within the tile (accumulator
    lives in the revisited output block), 1 = first row of the tile this
    round (seed from the carried-in accumulator), 2 = first row ever
    (seed with the identity).
    """
    g = pl.program_id(0)
    vk = vk_ref[g]
    f = with_consts(FP, consts[...], rolled=pc.interpret())

    @pl.when(vk == 2)
    def _init_identity():
        ox[...] = jnp.zeros_like(ox)
        oy[...] = jnp.zeros_like(oy)
        oz[...] = jnp.zeros_like(oz)
        ofl[...] = jnp.zeros_like(ofl)

    @pl.when(vk == 1)
    def _init_carry():
        ox[...] = ax_in[...]
        oy[...] = ay_in[...]
        oz[...] = az_in[...]
        ofl[...] = jnp.zeros_like(ofl)

    sx, sy = _unpack_words(spw[...])
    inf_lane = jnp.squeeze(sinf[...], axis=0).astype(bool)
    rx, ry, rz, col = pc._madd_values_incomplete_lazy(
        f, ox[...], oy[...], oz[...], sx, sy, inf_lane
    )
    ox[...] = rx
    oy[...] = ry
    oz[...] = rz
    ofl[...] = ofl[...] | col[None].astype(jnp.uint32)


def _run_accum_kernel(vk, tile_id, slab_pw, slab_inf, acc: G1Jac):
    """One round of slab accumulation on the Pallas fast path."""
    n_tiles = acc.x.shape[-1] // BTILE
    G = vk.shape[0]

    def slab_map(g, vk_ref, ti_ref):
        return (0, g)

    def acc_map(g, vk_ref, ti_ref):
        return (0, ti_ref[g])

    word_in = pl.BlockSpec((FP_LIMBS, BTILE), slab_map,
                           memory_space=pltpu.VMEM)
    inf_in = pl.BlockSpec((1, BTILE), slab_map, memory_space=pltpu.VMEM)
    acc_in = pl.BlockSpec((FP_LIMBS, BTILE), acc_map,
                          memory_space=pltpu.VMEM)
    acc_out = pl.BlockSpec((FP_LIMBS, BTILE), acc_map,
                           memory_space=pltpu.VMEM)
    flag_out = pl.BlockSpec((1, BTILE), acc_map, memory_space=pltpu.VMEM)
    consts_spec = pl.BlockSpec(
        pc._FP_CONSTS.shape, lambda g, vk_ref, ti_ref: (0, 0),
        memory_space=pltpu.VMEM,
    )

    coord_shape = jax.ShapeDtypeStruct((FP_LIMBS, n_tiles * BTILE), jnp.uint32)
    flag_shape = jax.ShapeDtypeStruct((1, n_tiles * BTILE), jnp.uint32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[consts_spec, word_in, inf_in, acc_in, acc_in, acc_in],
        out_specs=(acc_out, acc_out, acc_out, flag_out),
    )
    ox, oy, oz, fl = pl.pallas_call(
        _accum_kernel,
        grid_spec=grid_spec,
        out_shape=(coord_shape, coord_shape, coord_shape, flag_shape),
        interpret=pc.interpret(),
    )(vk, tile_id, jnp.asarray(pc._FP_CONSTS), slab_pw, slab_inf,
      acc.x, acc.y, acc.z)
    return G1Jac(ox, oy, oz), fl


def _run_accum_fallback(vk, tile_id, slab_pw, slab_inf, acc: G1Jac):
    """Exact re-run of a round with the complete (rolled) formulas.

    Reached only when the incomplete kernel flags a same-point collision
    — possible for duplicated input points sharing a digit (legal in the
    generic MSM API), never for honest SRS rows.  A sequential scan over
    the slab rows with dynamic slices: compiles small, runs slow, exact.
    """
    G = vk.shape[0]

    def body(carry, g):
        ax, ay, az = carry
        t = tile_id[g] * BTILE
        cur = G1Jac(
            jax.lax.dynamic_slice_in_dim(ax, t, BTILE, axis=1),
            jax.lax.dynamic_slice_in_dim(ay, t, BTILE, axis=1),
            jax.lax.dynamic_slice_in_dim(az, t, BTILE, axis=1),
        )
        fresh = cv.jac_identity((BTILE,))
        is_init = vk[g] == 2
        cur = G1Jac(
            jnp.where(is_init, fresh.x, cur.x),
            jnp.where(is_init, fresh.y, cur.y),
            jnp.where(is_init, fresh.z, cur.z),
        )
        s = g * BTILE
        pw = jax.lax.dynamic_slice_in_dim(slab_pw, s, BTILE, axis=1)
        qx, qy = _unpack_words(pw)
        q = G1Aff(
            qx, qy,
            jax.lax.dynamic_slice_in_dim(slab_inf[0], s, BTILE) > 0,
        )
        new = cv._madd_impl(FP_COMPACT, cur, q)
        ax = jax.lax.dynamic_update_slice_in_dim(ax, new.x, t, axis=1)
        ay = jax.lax.dynamic_update_slice_in_dim(ay, new.y, t, axis=1)
        az = jax.lax.dynamic_update_slice_in_dim(az, new.z, t, axis=1)
        return (ax, ay, az), None

    (ax, ay, az), _ = jax.lax.scan(
        body, (acc.x, acc.y, acc.z), jnp.arange(G, dtype=jnp.int32)
    )
    return G1Jac(ax, ay, az)


# ---------------------------------------------------------------------------
# Slab construction + round loop
# ---------------------------------------------------------------------------

def _grid_size(total_adds: int, n_tiles: int) -> int:
    """Static grid: one mandatory block per tile (accumulator carry) plus
    SLACK x the mean load in extra rows."""
    return n_tiles + int(np.ceil(SLACK * total_adds / BTILE))


@partial(jax.jit, static_argnums=(2,))
def msm_fused(points: G1Aff, scalars, c: int) -> G1Jac:
    """Pippenger MSM via slab-packed fused bucket accumulation.

    points: G1Aff [L, n]; scalars: uint32[FR_LIMBS, n] canonical.
    Returns the single Jacobian result.
    """
    return msm_fused_packed(pack_points(points), points.inf, scalars, c)


@partial(jax.jit, static_argnums=(3,))
def msm_fused_packed(packed, inf, scalars, c: int) -> G1Jac:
    """MSM over a pre-packed point table (see pack_points).

    The packed table is the natural device-resident form for fixed bases
    (the Piano SRS rows): pack once at setup, skip the per-call
    interleave."""
    from . import msm as msm_mod

    n = packed.shape[0]
    B = 1 << c
    n_windows, eff_bits, splits = _window_plan(c)
    n_tiles = -(-(n_windows * B) // BTILE)
    BT = n_tiles * BTILE
    G = _grid_size(n * n_windows, n_tiles)

    digits = msm_mod._all_window_digits(scalars, c, n_windows)  # [W, n]
    # Points at infinity contribute nothing: fold them into the excluded
    # digit-0 class (digit-0 slots are weighted by zero in the reduction).
    digits = jnp.where(inf[None], 0, digits)

    order = jnp.argsort(digits, axis=-1).astype(jnp.int32)      # [W, n]
    sd = jnp.take_along_axis(digits, order, axis=-1)

    # Per-window bucket starts in sorted space; counts by differencing.
    edges = jax.vmap(
        lambda row: jnp.searchsorted(
            row, jnp.arange(B + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    )(sd)                                                        # [W, B+1]
    cnt = edges[:, 1:] - edges[:, :-1]                           # [W, B]

    # Sub-bucket layout: window w's bucket d is dealt over s_w adjacent
    # slots (d*s_w + j), one point every s_w-th sorted position.
    log_s = jnp.asarray([c - e for e in eff_bits], jnp.int32)[:, None]
    s_arr = jnp.asarray(splits, jnp.int32)[:, None]              # [W, 1]
    slot_i = jnp.arange(B, dtype=jnp.int32)[None, :]             # [1, B]
    d_idx = slot_i >> log_s                                      # [W, B]
    j_idx = slot_i & (s_arr - 1)
    cnt_d = jnp.take_along_axis(cnt, d_idx, axis=-1)
    counts = (cnt_d + s_arr - 1 - j_idx) // s_arr                # [W, B]
    counts = jnp.where(d_idx == 0, 0, counts)                    # drop digit 0
    starts = (
        jnp.take_along_axis(edges[:, :-1], d_idx, axis=-1) + j_idx
        + (jnp.arange(n_windows, dtype=jnp.int32) * n)[:, None]
    )                                                            # into order_flat
    strides = jnp.broadcast_to(s_arr, (n_windows, B))

    acc, inv_csort = _slab_rounds(
        packed, inf, order.reshape(-1),
        counts.reshape(-1), starts.reshape(-1), strides.reshape(-1),
        n_tiles, G,
    )

    # Un-permute slots back to canonical (window, slot) order.
    canon = inv_csort[: n_windows * B]
    buckets = G1Jac(
        jnp.take(acc.x, canon, axis=-1).reshape(FP_LIMBS, n_windows, B),
        jnp.take(acc.y, canon, axis=-1).reshape(FP_LIMBS, n_windows, B),
        jnp.take(acc.z, canon, axis=-1).reshape(FP_LIMBS, n_windows, B),
    )

    # Weighted bucket reduction, all windows batched along a W axis (a
    # per-window scan would serialize W short tree reductions).
    idx = np.arange(B)
    masks = np.stack([(idx >> j) & 1 for j in range(c)]).astype(bool)  # [c,B]
    shape = (FP_LIMBS, n_windows, c, B)
    ps = cv.tree_sum_fast(
        G1Jac(
            jnp.broadcast_to(buckets.x[:, :, None, :], shape),
            jnp.broadcast_to(buckets.y[:, :, None, :], shape),
            jnp.where(masks[None, None], buckets.z[:, :, None, :], 0),
        ),
        stop=32,
    )  # [L, W, c, R]
    sx = jnp.moveaxis(ps.x, 0, 1)  # [W, L, c, R]
    sy = jnp.moveaxis(ps.y, 0, 1)
    sz = jnp.moveaxis(ps.z, 0, 1)
    r = sx.shape[-1]

    # A split window's slot index is d*s_w + j: its weighted sum over
    # slot-index bits equals s_w * (sum over d) + (parts mixture), so
    # the true per-bucket weight d is recovered by DROPPING the low
    # log2(s_w) bit-partial-sums and shifting the rest down — exact,
    # because sum_slots (slot>>k)*acc == sum_{b>=k} 2^(b-k) P_b.
    def shift_terms(a):
        # a: [W, L, c, R]; per window w roll its c bit-terms down by
        # (c - eff_bits[w]) and zero the vacated top terms (jac zeros
        # are the identity convention).
        rows = []
        for w in range(n_windows):
            k = c - eff_bits[w]
            if k == 0:
                rows.append(a[w])
            else:
                zero = jnp.zeros_like(a[w, :, :k])
                rows.append(jnp.concatenate([a[w, :, k:], zero], axis=1))
        return jnp.stack(rows)

    if any(k != 1 for k in splits):
        sx, sy, sz = shift_terms(sx), shift_terms(sy), shift_terms(sz)

    def to_terms(a):
        return jnp.moveaxis(a, 0, 1).reshape(FP_LIMBS, n_windows * c, r)

    return msm_mod._horner_2k(G1Jac(to_terms(sx), to_terms(sy), to_terms(sz)))


def bgmw_auto_window(n: int) -> int:
    """Window size for the shared-bucket (BGMW-table) MSM: balance the
    accumulation adds ceil(256/c)*n against the bucket-reduction work
    ~c*2^(c-1); at the production per-worker size (2^19) this lands on
    c=16 (16 windows, 2^16 shared buckets)."""
    best, best_cost = 8, None
    for c in range(8, 19):
        cost = -(-256 // c) * n + (c << (c - 1))
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


@partial(jax.jit, static_argnums=(3,))
def msm_fused_bgmw(packed_table, table_inf, scalars, c: int) -> G1Jac:
    """Shared-bucket MSM over a BGMW-expanded fixed-base table.

    packed_table: [W*n, FP_LIMBS] packed words of T[w*n + i] =
    (2^(c*w)) * P_i (pack_points over ops.msm.bgmw_expand output).  All
    W*n (window, point) pairs accumulate into ONE set of 2^c buckets —
    no per-window bucket spaces, one bucket reduction, zero doublings in
    the combine beyond the c-bit Horner.  The TPU analog of the
    reference's BGMW precompute path (kzg::msm::precompute behind
    src/engine/piano.rs:150 via PrecomputationTable,
    piano.rs:469-515).
    """
    from . import msm as msm_mod

    WN = packed_table.shape[0]
    n = scalars.shape[-1]
    n_windows = WN // n
    B = 1 << c
    n_tiles = -(-B // BTILE)
    BT = n_tiles * BTILE
    G = _grid_size(WN, n_tiles)

    digits = msm_mod._all_window_digits(scalars, c, n_windows)  # [W, n]
    digits_flat = jnp.where(table_inf, 0, digits.reshape(-1))   # [W*n]

    order = jnp.argsort(digits_flat).astype(jnp.int32)
    sd = digits_flat[order]
    edges = jnp.searchsorted(
        sd, jnp.arange(B + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = edges[1:] - edges[:-1]
    counts = counts.at[0].set(0)                                 # drop digit 0
    starts = edges[:-1]
    strides = jnp.ones((B,), jnp.int32)

    acc, inv_csort = _slab_rounds(
        packed_table, table_inf, order, counts, starts, strides,
        n_tiles, G,
    )
    canon = inv_csort[:B]
    buckets = G1Jac(
        jnp.take(acc.x, canon, axis=-1),
        jnp.take(acc.y, canon, axis=-1),
        jnp.take(acc.z, canon, axis=-1),
    )
    s = msm_mod._bit_partial_sums(buckets, c)  # [L, c, R]
    return msm_mod._horner_2k(s)


def _slab_rounds(packed, inf, order_flat, counts_flat, starts_flat,
                 strides_flat, n_tiles: int, G: int):
    """Count-descending slot packing + the multi-round slab loop.

    counts/starts/strides are per-slot (flat, any window structure);
    returns the accumulator [L, n_tiles*BTILE] in packed-slot order and
    the inverse permutation back to flat slot order."""
    BT = n_tiles * BTILE
    pad = BT - counts_flat.shape[0]
    if pad:
        counts_flat = jnp.concatenate(
            [counts_flat, jnp.zeros((pad,), jnp.int32)])
        starts_flat = jnp.concatenate(
            [starts_flat, jnp.zeros((pad,), jnp.int32)])
        strides_flat = jnp.concatenate(
            [strides_flat, jnp.ones((pad,), jnp.int32)])

    # Count-descending slot packing.
    csort = jnp.argsort(-counts_flat).astype(jnp.int32)          # [BT]
    inv_csort = jnp.argsort(csort).astype(jnp.int32)
    counts_slot = counts_flat[csort]
    starts_slot = starts_flat[csort]
    strides_slot = strides_flat[csort]

    tile_of_slot = (
        jnp.arange(BT, dtype=jnp.int32) // BTILE
    )

    avail = G - n_tiles  # extra rows beyond the mandatory one per tile

    def round_body(state):
        acc_x, acc_y, acc_z, done, first_round, _ = state
        rem = counts_slot - done                                 # [BT]
        r_tile = jnp.max(rem.reshape(n_tiles, BTILE), axis=1)    # [T]
        extra_req = jnp.maximum(r_tile - 1, 0)
        # First round must visit every tile once regardless of load;
        # later rounds also revisit every tile (the accumulator is
        # copied through the kernel, so unvisited tiles would be lost).
        cum = _exclusive_cumsum(extra_req)
        extra_alloc = jnp.clip(avail - cum, 0, extra_req)
        r_alloc = 1 + extra_alloc                                # [T] >= 1
        off = _exclusive_cumsum(r_alloc)                         # [T]
        g_used = off[-1] + r_alloc[-1]

        gs = jnp.arange(G, dtype=jnp.int32)
        live = gs < g_used
        tile_id = jnp.clip(
            jnp.searchsorted(off, gs, side="right").astype(jnp.int32) - 1,
            0, n_tiles - 1,
        )
        tile_id = jnp.where(live, tile_id, n_tiles - 1)
        row_id = jnp.where(live, gs - off[tile_id], jnp.int32(-1))
        vk = jnp.where(
            row_id == 0,
            jnp.where(first_round, jnp.int32(2), jnp.int32(1)),
            jnp.int32(0),
        )

        # Slab lane (g, j): row row_id[g] of slot tile_id[g]*BTILE + j.
        slot = tile_id[:, None] * BTILE + jnp.arange(BTILE, dtype=jnp.int32)
        rank = done[slot] + row_id[:, None]                      # [G, BTILE]
        valid = (row_id[:, None] >= 0) & (rank < counts_slot[slot])
        src_pos = jnp.clip(
            starts_slot[slot] + rank * strides_slot[slot],
            0, order_flat.shape[0] - 1,
        )
        src = jnp.where(valid, order_flat[src_pos], 0).reshape(-1)

        slab_pw = jnp.take(packed, src, axis=0).T  # [FP_LIMBS, G*BTILE]
        slab_inf = (
            (~valid.reshape(-1)) | inf[src]
        )[None].astype(jnp.uint32)

        acc = G1Jac(acc_x, acc_y, acc_z)
        new_acc, flags = _run_accum_kernel(
            vk, tile_id, slab_pw, slab_inf, acc
        )
        # The kernel works on lazy [0, 2N) representatives; canonicalize
        # per round (3 conditional subtracts over [L, BT] — microseconds)
        # so the complete-formula fallback and the combine always see
        # canonical coordinates.
        new_acc = G1Jac(
            FP.canonicalize(new_acc.x),
            FP.canonicalize(new_acc.y),
            FP.canonicalize(new_acc.z),
        )
        new_acc = jax.lax.cond(
            jnp.any(flags > 0),
            lambda _: _run_accum_fallback(
                vk, tile_id, slab_pw, slab_inf, acc
            ),
            lambda _: new_acc,
            operand=None,
        )
        done = done + jnp.clip(rem, 0, r_alloc[tile_of_slot])
        return (new_acc.x, new_acc.y, new_acc.z, done,
                jnp.bool_(False), jnp.any(done < counts_slot))

    init = (
        jnp.zeros((FP_LIMBS, BT), jnp.uint32),
        jnp.zeros((FP_LIMBS, BT), jnp.uint32),
        jnp.zeros((FP_LIMBS, BT), jnp.uint32),
        jnp.zeros((BT,), jnp.int32),
        jnp.bool_(True),
        jnp.bool_(True),
    )
    state = jax.lax.while_loop(lambda s: s[-1], round_body, init)
    return G1Jac(state[0], state[1], state[2]), inv_csort
