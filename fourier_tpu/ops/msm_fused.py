"""Fused-slab Pippenger MSM: the TPU fast path for bucket accumulation.

TPU-native replacement for the hot kernel of rust-kzg-blst's
``g1_linear_combination`` (behind every commit/open in the reference,
src/engine/piano.rs:150,167,228,259,287,327).  The round-1 formulation
(ops/msm.py `_bucket_accumulate`) paid for a random HBM gather plus a
kernel dispatch on every `while_loop` step — ~60% of MSM wall time went
to ~2000 per-row gathers — and padded every bucket to the global max
count (~1.6x slack).  This module restructures the whole accumulation:

1. **Digits** for all windows at once (vector bit ops).
2. **Batched per-window sort** of digits (one XLA sort over [W, n]).
3. **Heavy-bucket splitting** (_split_heavy_slots): per-slot loads are
   capped at 8x the mean; cap-sized chunks of heavy buckets fan out
   over a spare slot region, carrying their source bucket index as a
   dynamic combine weight.  This makes slot loads near-uniform for ANY
   digit distribution — both the structural skew of the top window
   (c=13 leaves it 9 effective bits: ~512 buckets x ~2k points at 2^19)
   and adversarial concentration (all-equal scalars, a client-
   controlled input via workerCommit).
4. **Count-descending slot packing**: all slots (every window at once)
   are ordered by descending load and packed into tiles of BTILE slots.
   Because tile-mates have near-equal counts, padding a tile to its own
   max count costs ~2% (vs ~60% for a global max).
5. **One packed slab QUAD gather** builds a contiguous stream of point
   tiles: lane (tile t, row r, slot j) holds the r-th point of the j-th
   slot of tile t.  Points travel as 24 u32 words (two 16-bit limbs per
   word, x and y together, 96 contiguous bytes per point); the kernel
   unpacks with one mask+shift.  The gather itself moves QUADS of four
   adjacent table rows (384 B) and the kernel selects the wanted
   sub-row per lane: XLA's row gather is descriptor-bound (~30 Mrows/s
   at 96 B rows but ~59 Mrows/s at 384 B rows — tools/PROBE_GATHER2.log),
   so 4x the bytes at 2x the row rate is a ~2x wall-time win.  The
   slot bookkeeping rides the digit sort as one packed META word per
   table row ((row>>2)<<4 | (row&3)<<2 | neg<<1 | inf via
   jax.lax.sort_key_val), so each round pays ONE element gather
   (meta_sorted[src_pos]) instead of two (order + flags).
6. **One Pallas kernel** walks the slab: grid step g mixed-adds one
   [BTILE]-wide row of points into a VMEM-resident accumulator tile,
   revisited across that tile's rows (scalar-prefetched tile ids drive
   the output index map).  The accumulator touches HBM once per tile,
   not once per row.  The point add is the *incomplete* (collision
   flagged) formula from ops/pallas_curve in the lazy [0, 2N) Montgomery
   domain; any flagged lane triggers an exact re-run of the round under
   the complete formulas (`lax.cond`).
7. **Bounded slab + multi-round**: the slab has a static capacity of
   ~1.06x the mean load; loads beyond it spill into further rounds of
   the same program under a `while_loop`.  With splitting the round
   count is ~ceil(total/capacity) for ANY input (simulate_rounds is the
   tested guard).

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


# Table rows are gathered in groups of _QUAD adjacent rows (one fat
# descriptor), and the kernel selects the wanted member per lane from
# flag bits 2..3.
_QUAD = 4


def _quadify(packed):
    """[rows, FP_LIMBS] packed table -> [ceil(rows/4), 4*FP_LIMBS].

    A free reshape when rows % 4 == 0 (always true in production: rows
    are n or W*n with n a power of two >= 4); tiny test tables pad."""
    rows = packed.shape[0]
    pad = (-rows) % _QUAD
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((pad, packed.shape[1]), packed.dtype)])
    return packed.reshape(-1, _QUAD * packed.shape[1])


def _row_meta(rows: int, flags_row):
    """Per-table-row packed meta word: (row>>2)<<4 | (row&3)<<2 | flags.

    flags_row: uint32 [rows] with bit 0 = infinity, bit 1 = negate.
    The meta rides the digit sort (sort_key_val), so slab rounds read
    quad index, sub-row, and flags with ONE element gather."""
    r = jnp.arange(rows, dtype=jnp.uint32)
    return ((r >> 2) << 4) | ((r & 3) << 2) | flags_row


def _select_quad(pw, flags):
    """Select each lane's sub-row from a [..., 4*FP_LIMBS] quad block
    (lanes on the leading axis, as gathered — no transpose upstream).

    flags bits 2..3 give the quad member; returns [FP_LIMBS, ...] in the
    kernel's limbs-major layout (one small [.., FP_LIMBS] -> [FP_LIMBS,
    ..] transpose AFTER selection, a quarter of the data)."""
    L = FP_LIMBS
    # reshape the 32-bit word BEFORE comparing: Mosaic cannot insert a
    # minor dim on an i1 vector
    sub = (flags >> 2)[..., None]
    b0 = (sub & 1) > 0
    b1 = (sub & 2) > 0
    a = jnp.where(b0, pw[..., L:2 * L], pw[..., :L])
    b = jnp.where(b0, pw[..., 3 * L:4 * L], pw[..., 2 * L:3 * L])
    sel = jnp.where(b1, b, a)
    return jnp.swapaxes(sel, -1, -2)


# ---------------------------------------------------------------------------
# The accumulation kernel
# ---------------------------------------------------------------------------

def _accum_kernel(vk_ref, ti_ref, consts, spw, sflags, ax_in, ay_in, az_in,
                  ox, oy, oz, ofl, *, signed: bool = False):
    """Grid step g: acc[tile] = madd(acc[tile], slab_row_g).

    vk (visit kind) per g: 0 = continue within the tile (accumulator
    lives in the revisited output block), 1 = first row of the tile this
    round (seed from the carried-in accumulator), 2 = first row ever
    (seed with the identity).

    sflags bit 0 = lane is infinity / invalid; bit 1 (signed variants
    only) = negate the incoming point (balanced signed digits): -P has
    the 2N-y lazy representative, one deferred-carry subtract per lane;
    bits 2..3 = quad member: spw rows are [4*FP_LIMBS]-word QUADS of
    adjacent table rows and each lane selects its member (two masked
    selects — the price of the 2x-faster fat-row gather).
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

    flags = jnp.squeeze(sflags[...], axis=0)
    sx, sy = _unpack_words(_select_quad(spw[...], flags))
    inf_lane = (flags & 1).astype(bool)
    if signed:
        neg_lane = ((flags >> 1) & 1).astype(bool)
        sy = jnp.where(neg_lane[None],
                       f.sub_lazy(jnp.zeros_like(sy), sy), sy)
    rx, ry, rz, col = pc._madd_values_incomplete_lazy(
        f, ox[...], oy[...], oz[...], sx, sy, inf_lane
    )
    ox[...] = rx
    oy[...] = ry
    oz[...] = rz
    ofl[...] = ofl[...] | col[None].astype(jnp.uint32)


def _run_accum_kernel(vk, tile_id, slab_pw, slab_inf, acc: G1Jac,
                      signed: bool = False):
    """One round of slab accumulation on the Pallas fast path."""
    n_tiles = acc.x.shape[-1] // BTILE
    G = vk.shape[0]

    def slab_map(g, vk_ref, ti_ref):
        return (0, g)

    def acc_map(g, vk_ref, ti_ref):
        return (0, ti_ref[g])

    def slab_row_map(g, vk_ref, ti_ref):
        return (g, 0)

    word_in = pl.BlockSpec((BTILE, _QUAD * FP_LIMBS), slab_row_map,
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
        partial(_accum_kernel, signed=signed),
        grid_spec=grid_spec,
        out_shape=(coord_shape, coord_shape, coord_shape, flag_shape),
        interpret=pc.interpret(),
    )(vk, tile_id, jnp.asarray(pc._FP_CONSTS), slab_pw, slab_inf,
      acc.x, acc.y, acc.z)
    return G1Jac(ox, oy, oz), fl


def _run_accum_fallback(vk, tile_id, slab_pw, slab_inf, acc: G1Jac,
                        signed: bool = False):
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
        pw = jax.lax.dynamic_slice_in_dim(slab_pw, s, BTILE, axis=0)
        flags = jax.lax.dynamic_slice_in_dim(slab_inf[0], s, BTILE)
        qx, qy = _unpack_words(_select_quad(pw, flags))
        if signed:
            neg = ((flags >> 1) & 1) > 0
            qy = jnp.where(neg[None],
                           FP_COMPACT.sub(jnp.zeros_like(qy), qy), qy)
        q = G1Aff(qx, qy, (flags & 1) > 0)
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

# One round's gathered quad slab is G*BTILE*4L*4 bytes.  Past this cap
# the load spills into further while_loop rounds of the SAME buffers
# (the allocator is built for it — simulate_rounds), costing only the
# extra mandatory one-row-per-tile visits (~0.8%/round): peak HBM stays
# flat for any T.  Without the cap a T=2^20 single-worker commit slab
# is 6.4 GB and the compiled program exceeds single-chip HBM.
#
# Headroom derivation (v5e, 16 GiB HBM; measured at T=2^20, M=1 —
# docs/ROUND4_NOTES.md): the budget must cover the slab PLUS its
# pipeline copy (XLA double-buffers the while_loop carry: ~2x the slab
# while a round hands off), the meta/index transients (~0.2 GiB/round),
# and the live backend state outside this program (SRS row + packed
# table, subtracted explicitly via table_rows below).  4.3 GiB * 2 +
# 0.2 + table (1.6 GiB at 2^19/c=16) + SRS (~0.2) ~= 10.6 GiB, leaving
# ~5 GiB for the accumulator, XLA workspace, and fragmentation — the
# measured ceiling before the T=2^20 compile OOMed was ~4.8 GiB/round.
# If BTILE/_QUAD/FP_LIMBS change, _grid_size's bytes-per-row term
# tracks them automatically; only a new HBM size needs retuning here.
SLAB_MAX_BYTES = (43 << 30) // 10  # 4.3 GiB


def _grid_size(total_adds: int, n_tiles: int, table_rows: int = 0) -> int:
    """Static grid: one mandatory block per tile (accumulator carry) plus
    SLACK x the mean load in extra rows, capped by the slab budget.

    The budget is TABLE-AWARE (SLAB_MAX_BYTES minus the packed table's
    footprint): the resident table, the slab, and its pipeline copy all
    share single-chip HBM with the live backend state, and a T=2^20
    single-worker commit program exceeded the chip without the cap."""
    g = n_tiles + int(np.ceil(SLACK * total_adds / BTILE))
    budget = SLAB_MAX_BYTES - table_rows * FP_LIMBS * 4
    g_cap = max(n_tiles + 8, budget // (BTILE * _QUAD * FP_LIMBS * 4))
    return min(g, g_cap)


@partial(jax.jit, static_argnums=(2,))
def msm_fused(points: G1Aff, scalars, c: int) -> G1Jac:
    """Pippenger MSM via slab-packed fused bucket accumulation.

    points: G1Aff [L, n]; scalars: uint32[FR_LIMBS, n] canonical.
    Returns the single Jacobian result.
    """
    return msm_fused_packed(pack_points(points), points.inf, scalars, c)


def _split_heavy_slots(counts, starts, cap: int, spare: int):
    """Per-row heavy-bucket splitting: loads capped at `cap`.

    counts/starts: [..., B] per-bucket loads and sorted-space starts.
    A bucket with count > cap keeps its first `cap` points in its main
    slot; each further cap-sized chunk is assigned to a slot of the
    per-row spare region.  Returns (counts', starts', weights') shaped
    [..., B + spare], where weights' is the originating bucket index of
    every slot (the combine weight; 0 = contributes nothing).

    This is what makes the slab's round count insensitive to the digit
    distribution: adversarially concentrated loads (all-equal scalars, a
    client-controlled input via workerCommit) fan out over spare slots
    and pack into full tiles, so total work stays ~ceil(total/capacity)
    rounds.  Callers size `spare >= total/cap` (the worst case)."""
    B = counts.shape[-1]
    extra = jnp.maximum((counts - 1) // cap, 0)            # chunks beyond main
    cum_incl = jnp.cumsum(extra, axis=-1)                  # [..., B]
    total_extra = cum_incl[..., -1:]

    e = jnp.arange(spare, dtype=jnp.int32)
    bshape = counts.shape[:-1]
    e_b = jnp.broadcast_to(e, bshape + (spare,))

    def find(row_cum, row_e):
        return jnp.searchsorted(row_cum, row_e, side="right").astype(jnp.int32)

    for _ in bshape:
        find = jax.vmap(find)
    j = find(cum_incl, e_b)                                # [..., spare]
    j = jnp.clip(j, 0, B - 1)
    cum_excl_j = jnp.take_along_axis(cum_incl - extra, j, axis=-1)
    p = (e_b - cum_excl_j + 1).astype(jnp.int32)           # part index >= 1
    valid = e_b < total_extra
    cnt_j = jnp.take_along_axis(counts, j, axis=-1)
    sp_counts = jnp.where(
        valid, jnp.clip(cnt_j - p * cap, 0, cap), 0
    ).astype(jnp.int32)
    sp_starts = (jnp.take_along_axis(starts, j, axis=-1)
                 + p * cap).astype(jnp.int32)
    sp_weights = jnp.where(valid & (sp_counts > 0), j, 0)

    idx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32), bshape + (B,)
    )
    return (
        jnp.concatenate([jnp.minimum(counts, cap), sp_counts], axis=-1),
        jnp.concatenate([starts, sp_starts], axis=-1),
        jnp.concatenate([idx, sp_weights], axis=-1),
    )


def _reduce_axis(p: G1Jac, axis: int) -> G1Jac:
    """Sum a Jacobian batch over one axis (slicing tree — no transpose)."""
    return cv.tree_reduce_axis(p, axis)


def _pad_lanes(p: G1Jac, width: int) -> G1Jac:
    pad = width - p.x.shape[-1]
    if pad == 0:
        return p
    z = jnp.zeros(p.x.shape[:-1] + (pad,), jnp.uint32)
    return G1Jac(
        jnp.concatenate([p.x, z], -1),
        jnp.concatenate([p.y, z], -1),
        jnp.concatenate([p.z, z], -1),
    )


def _weighted_sums_factored(buckets: G1Jac, weights, c: int, B: int) -> G1Jac:
    """Shared-bucket weighted reduction, factorized: [L, Bp] buckets ->
    [L, c, R] bit partial sums, exploiting that the first B slots have
    weight == index.

    The direct bit-decomposition costs c*Bp point adds (c masked copies
    of every bucket).  Factorizing the index b = g*H + h over a
    2^(c-ceil(c/2)) x 2^(c//2) grid, the main region needs only the
    unweighted row/column sums (2*B adds) plus bit masks on the SMALL
    R/C vectors:

        sum_b b*B_b = H * sum_g g*R_g + sum_h h*C_h

    so bit j < log2(H) reduces over C and bit j >= log2(H) over R.
    Spare slots (dynamic weights from heavy-bucket splitting) keep the
    masked form; their residual lanes concatenate onto the same [c, R]
    terms.  ~2B + c*spare adds instead of c*(B + spare)."""
    h_bits = c // 2
    H = 1 << h_bits
    Gg = B >> h_bits
    main = G1Jac(
        buckets.x[..., :B].reshape(FP_LIMBS, Gg, H),
        buckets.y[..., :B].reshape(FP_LIMBS, Gg, H),
        buckets.z[..., :B].reshape(FP_LIMBS, Gg, H),
    )
    rows = _reduce_axis(main, -1)        # [L, Gg]  R_g = sum_h
    cols = _reduce_axis(main, -2)        # [L, H]   C_h = sum_g
    from . import msm as msm_mod

    low = msm_mod._bit_partial_sums(cols, h_bits)        # [L, h_bits, R]
    high = msm_mod._bit_partial_sums(rows, c - h_bits)   # [L, c-h_bits, R]
    r_main = max(low.x.shape[-1], high.x.shape[-1])
    low = _pad_lanes(low, r_main)
    high = _pad_lanes(high, r_main)
    main_terms = G1Jac(
        jnp.concatenate([low.x, high.x], axis=-2),
        jnp.concatenate([low.y, high.y], axis=-2),
        jnp.concatenate([low.z, high.z], axis=-2),
    )                                                    # [L, c, r_main]

    spare = G1Jac(buckets.x[..., B:], buckets.y[..., B:], buckets.z[..., B:])
    if spare.x.shape[-1] == 0:
        return main_terms
    sp_terms = _weighted_partial_sums(spare, weights[..., B:], c)
    return G1Jac(
        jnp.concatenate([main_terms.x, sp_terms.x], axis=-1),
        jnp.concatenate([main_terms.y, sp_terms.y], axis=-1),
        jnp.concatenate([main_terms.z, sp_terms.z], axis=-1),
    )                                                    # [L, c, r]


def _weighted_partial_sums(buckets: G1Jac, weights, c: int) -> G1Jac:
    """[..., B'] buckets with dynamic per-slot weights -> [L, ..., c, R]
    bit partial sums: generalizes msm._bit_partial_sums to runtime
    weights (the split-slot combine: a spare slot carries its source
    bucket's index as weight)."""
    lead = buckets.x.shape[:-1]  # (L, ...) leading dims
    Bp = buckets.x.shape[-1]
    bits = jnp.arange(c, dtype=jnp.int32).reshape((1,) * (weights.ndim - 1)
                                                  + (c, 1))
    masks = ((weights[..., None, :] >> bits) & 1).astype(bool)
    shape = lead + (c, Bp)
    return cv.tree_reduce_last(
        G1Jac(
            jnp.broadcast_to(buckets.x[..., None, :], shape),
            jnp.broadcast_to(buckets.y[..., None, :], shape),
            jnp.where(masks[None], buckets.z[..., None, :], 0),
        ),
        to=32,
    )


def _split_cap(total: int, n_buckets: int, factor: int = 16) -> int:
    """Per-slot load cap: `factor` x the mean keeps random inputs
    split-free (typical max ~ mean + 5*sqrt(mean)) while bounding the
    spare region at ~n_buckets/factor slots.

    factor=16 for the tableless per-window path: its TOP window has few
    effective bits and structurally concentrates ~2k points per bucket,
    which must keep splitting finely (a 64x cap measured 1.32 -> 2.05 s
    at 2^19/c=13: the unsplit heavy slots forced a second slab round
    plus tile padding).  factor=64 for the shared-bucket BGMW path,
    whose digit distribution is flat: nothing splits for honest inputs
    either way, and the 4x-smaller spare region shrinks the
    dynamic-weight reduction that is FIXED per chip in the sharded MSM
    (~10 ms of the D=8 per-chip budget at 16x —
    tools/PROFILE_MSM.log `msm_fixed_cost_probe_D8`).  Adversarial
    concentration still fans out over the spares and stays
    ~ceil(total/capacity) rounds (simulate_rounds is the tested
    guard)."""
    return factor * max(1, -(-total // n_buckets))


@partial(jax.jit, static_argnums=(3,))
def msm_fused_packed(packed, inf, scalars, c: int) -> G1Jac:
    """MSM over a pre-packed point table (see pack_points).

    The packed table is the natural device-resident form for fixed bases
    (the Piano SRS rows): pack once at setup, skip the per-call
    interleave."""
    from . import msm as msm_mod

    n = packed.shape[0]
    B = 1 << c
    n_windows = -(-SCALAR_BITS // c)
    cap = _split_cap(n, B)
    spare = max(BTILE // 8, -(-n // cap))
    Bp = B + spare
    n_tiles = -(-(n_windows * Bp) // BTILE)
    G = _grid_size(n * n_windows, n_tiles, table_rows=n)

    digits = msm_mod._all_window_digits(scalars, c, n_windows)  # [W, n]
    # Points at infinity contribute nothing: fold them into the excluded
    # digit-0 class (weight-0 slots drop out of the reduction).
    digits = jnp.where(inf[None], 0, digits)

    # Per-window digit sort carrying the packed row meta (quad index /
    # member / flags), with bucket counts/starts via the sentinel trick
    # (_sort_with_edges) — each window's sorted block is n + B + 1 long.
    meta_row = _row_meta(n, inf.astype(jnp.uint32))             # [n]
    sd, meta_sorted, cnt, starts = _sort_with_edges(
        digits, meta_row[None], B)
    cnt = cnt.at[:, 0].set(0)                                    # drop digit 0
    block = sd.shape[-1]     # n, or n + B + 1 when sentinel-padded
    starts = (
        starts
        + (jnp.arange(n_windows, dtype=jnp.int32) * block)[:, None]
    )                                                            # into flat order

    counts_s, starts_s, weights = _split_heavy_slots(cnt, starts, cap, spare)

    acc, inv_csort = _slab_rounds(
        _quadify(packed), meta_sorted.reshape(-1),
        counts_s.reshape(-1), starts_s.reshape(-1),
        n_tiles, G,
    )

    # Un-permute slots back to canonical (window, slot) order.
    canon = inv_csort[: n_windows * Bp]
    buckets = G1Jac(
        jnp.take(acc.x, canon, axis=-1).reshape(FP_LIMBS, n_windows, Bp),
        jnp.take(acc.y, canon, axis=-1).reshape(FP_LIMBS, n_windows, Bp),
        jnp.take(acc.z, canon, axis=-1).reshape(FP_LIMBS, n_windows, Bp),
    )

    # Weighted bucket reduction, all windows batched along a W axis (a
    # per-window scan would serialize W short tree reductions).
    ps = _weighted_partial_sums(buckets, weights, c)  # [L, W, c, R]
    r = ps.x.shape[-1]

    def to_terms(a):
        return a.reshape(FP_LIMBS, n_windows * c, r)

    return msm_mod._horner_2k(G1Jac(to_terms(ps.x), to_terms(ps.y),
                                    to_terms(ps.z)))


def signed_window_count(c: int) -> int:
    """Windows needed for SCALAR_BITS-bit scalars under balanced signed
    digits: the carry chain adds one bit, and the top window must absorb
    its incoming carry without emitting one (c*W >= SCALAR_BITS + 1)."""
    return -(-(SCALAR_BITS + 1) // c)


def _signed_digits(scalars, c: int, n_windows: int):
    """Balanced signed digit decomposition: returns (mag, neg) [W, n].

    d ∈ [0, 2^c) window digits become e ∈ [-(2^(c-1)-1), 2^(c-1)] with a
    carry into the next window; scalar value = sum_w sign*mag*2^(cw)
    exactly.  Halves the bucket range (magnitudes <= 2^(c-1)), which the
    BGMW shared-bucket MSM trades for a larger window c (fewer windows =
    fewer point adds AND fewer slab gathers)."""
    from . import msm as msm_mod

    raw = msm_mod._all_window_digits(scalars, c, n_windows)  # [W, n]
    half = 1 << (c - 1)
    full = 1 << c
    mags, negs = [], []
    carry = jnp.zeros_like(raw[0])
    for w in range(n_windows):
        d = raw[w] + carry                       # [n], <= 2^c
        neg = d > half
        mags.append(jnp.where(neg, full - d, d))
        negs.append(neg)
        carry = neg.astype(raw.dtype)
    # the top window absorbs its carry without emitting one: its raw
    # value is < 2^(SCALAR_BITS - c(W-1)) <= 2^(c-1)
    assert SCALAR_BITS - c * (n_windows - 1) <= c - 1, (
        "top window cannot absorb the signed-digit carry")
    return jnp.stack(mags), jnp.stack(negs)


def bgmw_digits_for(scalars, c: int, n_windows: int):
    """(digits_flat, neg_flat|None) for a W-window BGMW table.

    Signed digits are used whenever the table's window count covers the
    signed decomposition (true for every c that does not divide
    SCALAR_BITS — ceil(256/c) == ceil(257/c) then); otherwise plain
    unsigned digits."""
    from . import msm as msm_mod

    if n_windows == signed_window_count(c):
        mag, neg = _signed_digits(scalars, c, n_windows)
        return mag.reshape(-1), neg.reshape(-1)
    return msm_mod._all_window_digits(scalars, c, n_windows).reshape(-1), None


def bgmw_auto_window(n: int, shards: int = 1) -> int:
    """Window size for the shared-bucket (BGMW-table) MSM.

    shards > 1: the table will serve the mesh-sharded MSM
    (parallel.msm_fused_sharded), whose per-chip cost trades the row
    count (W*n/D) against per-chip Theta(B) bucket bookkeeping that the
    bucket-exchange reduction does NOT shard away (digit-sort edges,
    slot packing, the spare region).  Measured at 2^19 on v5e
    (tools/SCALING.log round 5): D=4 is fastest at c=13 (239 ms/chip vs
    267 at c=16 — 16x fewer buckets beats +25% rows), D=2 and D=8 stay
    at c=16 (at D=8 the row share already dominates; at D=2 the bucket
    costs amortize).  The analytic model below does not capture the
    bookkeeping constants, so the shards=4 case uses the measured
    point; other shard counts fall through to the single-chip model.

    Cost model fit to the 2^19 on-chip sweep (tools/sweep_bgmw_c.py,
    PROFILE_MSM.log): each (window, point) row costs one slab gather +
    one mixed add (the unit), and each bucket costs ~9 units across the
    factorized reduction, the spare-slot masked reduction, and the
    mandatory accumulator-tile rows.  Signed digits halve the bucket
    range where available (c not dividing SCALAR_BITS).

    Windows whose TOP window has no effective scalar bits are excluded:
    there the signed-digit carries concentrate ~n/2 entries into ONE
    bucket (magnitude 1), whose split slots exceed the slab's one-round
    capacity and force whole extra gather+kernel rounds (measured 2.2x
    at c=17/2^19)."""
    if shards == 4 and n >= (1 << 16):
        return 13  # measured crossover at 2^19; see docstring
    best, best_cost = 8, None
    for c in range(8, 23):
        w = signed_window_count(c)
        if w == -(-SCALAR_BITS // c):  # signed digits available
            buckets = 1 << (c - 1)
            if (SCALAR_BITS - 1) - c * (w - 1) < 1:
                continue  # degenerate top window (see docstring)
        else:
            w = -(-SCALAR_BITS // c)
            buckets = 1 << c
        cost = w * n + 9 * buckets
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
    WN = packed_table.shape[0]
    n = scalars.shape[-1]
    digits_flat, neg_flat = bgmw_digits_for(scalars, c, WN // n)
    return bgmw_from_digits(packed_table, table_inf, digits_flat, c,
                            neg_flat)


# Above this many rows per sort block, the sentinel double-sort loses to
# binary search: the second sort scales with WN while searchsorted is
# Theta(B log WN) ~ 30 ms flat, and the crossover measured between 4M
# and 8M rows (tools/PROFILE_MSM.log `edges_probe`: 1M rows 7 vs 39 ms
# in dsort's favor; 8.4M rows a wash in isolation and a small in-program
# LOSS — bench regressed 751 -> 765 ms before this gate).  Mesh shards
# (the case the sentinel path exists for) are always below it.
DSORT_MAX_ROWS = 6 << 20


def _sort_with_edges(digits_flat, meta_row, B: int):
    """Digit sort + per-bucket (counts, starts).

    Two strategies with one contract — returns (sd, meta_sorted,
    counts[..., B], starts[..., B]) with starts indexing the returned
    (possibly sentinel-padded) sorted arrays:

    - large blocks: plain sort + `searchsorted(sd, arange(B+1))`;
    - blocks <= DSORT_MAX_ROWS: SENTINEL keys — B+1
    sentinel entries (key b, meta bit31|b) ride the main sort; a second
    sort extracts their positions p_b, from which

        counts[b] = p_b - p_{b-1} - 1        (p_{-1} := -1)
        starts[b] = p_{b-1} + 1              (into the padded array)

    since the stable sort places bucket b's real entries directly before
    sentinel b.  Replaces `searchsorted(sd, arange(B+1))` — B+1 binary
    searches = 17 rounds of element gathers, measured 28-34 ms at EVERY
    shard size (tools/PROFILE_MSM.log `edges_probe`); the double sort is
    7 ms at a 1M-row shard and ~52 ms total (vs 64) at the full 8.4M.

    Returns (sd, meta_sorted, counts[..., B], starts[..., B]) where
    sd/meta_sorted are the sentinel-PADDED sorted arrays ([..., n+B+1]);
    starts index into the last axis of them, and sentinel positions are
    never inside a (start, count) run.  Works batched over leading axes
    (the tableless per-window case).  Sentinel metas have bit 31 set;
    real metas must stay below 2^31 (true: (row >> 2) << 4 < 2^31 for
    any row count < 2^27)."""
    if digits_flat.shape[-1] > DSORT_MAX_ROWS:
        sd, meta_sorted = jax.lax.sort_key_val(
            digits_flat,
            jnp.broadcast_to(meta_row, digits_flat.shape))
        qs = jnp.arange(B + 1, dtype=jnp.int32)

        def edges_of(row):
            return jnp.searchsorted(row, qs, side="left").astype(jnp.int32)

        for _ in digits_flat.shape[:-1]:
            edges_of = jax.vmap(edges_of)
        edges = edges_of(sd)
        counts = edges[..., 1:] - edges[..., :-1]
        starts = edges[..., :-1]
        return sd, meta_sorted, counts, starts

    S = B + 1
    lead = digits_flat.shape[:-1]
    sent_keys = jnp.broadcast_to(
        jnp.arange(S, dtype=digits_flat.dtype), lead + (S,))
    sent_meta = jnp.broadcast_to(
        jnp.uint32(1 << 31) | jnp.arange(S, dtype=jnp.uint32), lead + (S,))
    keys = jnp.concatenate([digits_flat, sent_keys], axis=-1)
    metas = jnp.concatenate(
        [jnp.broadcast_to(meta_row, digits_flat.shape), sent_meta], axis=-1)
    sd, meta_sorted = jax.lax.sort_key_val(keys, metas)
    is_sent = meta_sorted >> 31
    key2 = jnp.where(is_sent == 1,
                     (meta_sorted & 0x7FFFFFFF).astype(jnp.int32),
                     jnp.int32(S + 1))
    pos = jnp.broadcast_to(
        jnp.arange(keys.shape[-1], dtype=jnp.int32), keys.shape)
    _, p = jax.lax.sort_key_val(key2, pos)
    p_ext = jnp.concatenate(
        [jnp.full(lead + (1,), -1, jnp.int32), p[..., :S]], axis=-1)
    counts = (p_ext[..., 1:] - p_ext[..., :-1] - 1)[..., :B]
    starts = (p_ext[..., :-1] + 1)[..., :B]
    return sd, meta_sorted, counts, starts


def _unpermute_rows(acc: G1Jac, canon) -> G1Jac:
    """Gather accumulator slots back to canonical order as ONE fat-row
    gather: xyz stacked to [BT, 3L] 288-byte rows.  XLA's gather is
    descriptor-bound, not byte-bound (tools/PROBE_GATHER2.log), so one
    gather of 288B rows beats three lane gathers of 96B columns ~4x."""
    stacked = jnp.concatenate([acc.x, acc.y, acc.z], axis=0)     # [3L, BT]
    rows = jnp.take(stacked.T, canon, axis=0).T                  # [3L, Bp]
    L = FP_LIMBS
    return G1Jac(rows[:L], rows[L:2 * L], rows[2 * L:])


@partial(jax.jit, static_argnums=(3,))
def bgmw_buckets_from_digits(packed_table, table_inf, digits_flat, c: int,
                             neg_flat=None):
    """The slab-accumulation HALF of bgmw_from_digits: digit sort,
    heavy-slot split, multi-round slab accumulation, canonical-order
    unpermute — WITHOUT the weighted bucket reduction.

    Returns (buckets, weights): buckets is the [L, Bp] Jacobian bucket
    set in canonical slot order (main region [0, Bpow) has weight ==
    index; from Bpow on: the signed +1 bucket and the split-spare slots
    with dynamic weights), weights the [Bp] combine weights.  Split out
    so the mesh-sharded caller (parallel.msm_fused_sharded) can exchange
    per-chip bucket sets over ICI and pay the reduction ONCE, sharded
    over the bucket axis — the per-shard full reduction was the
    fixed cost that capped scaling efficiency at ~50% on 8 chips
    (tools/SCALING.log, rounds 3-4)."""
    signed = neg_flat is not None
    WN = packed_table.shape[0]
    Bpow = 1 << (c - 1) if signed else 1 << c     # power-of-2 main region
    B = Bpow + 1 if signed else Bpow              # magnitudes reach 2^(c-1)
    cap = _split_cap(WN, Bpow, factor=64)
    spare = max(BTILE // 8, -(-WN // cap))
    Bp = B + spare
    n_tiles = -(-Bp // BTILE)
    G = _grid_size(WN, n_tiles, table_rows=WN)

    digits_flat = jnp.where(table_inf, 0, digits_flat)          # [W*n]

    flags_row = table_inf.astype(jnp.uint32)
    if signed:
        flags_row = flags_row | (neg_flat.astype(jnp.uint32) << 1)
    sd, meta_sorted, counts, starts = _sort_with_edges(
        digits_flat, _row_meta(WN, flags_row), B)
    counts = counts.at[0].set(0)                                 # drop digit 0

    counts_s, starts_s, weights = _split_heavy_slots(counts, starts,
                                                     cap, spare)

    acc, inv_csort = _slab_rounds(
        _quadify(packed_table), meta_sorted, counts_s, starts_s,
        n_tiles, G, signed=signed,
    )
    return _unpermute_rows(acc, inv_csort[:Bp]), weights


@partial(jax.jit, static_argnums=(2, 3))
def bgmw_reduce(buckets: G1Jac, weights, c: int, signed: bool) -> G1Jac:
    """Weighted bucket reduction + Horner over a canonical bucket set
    (the second half of bgmw_from_digits)."""
    from . import msm as msm_mod

    Bpow = 1 << (c - 1) if signed else 1 << c
    s = _weighted_sums_factored(buckets, weights, c, Bpow)  # [L, c, R]
    return msm_mod._horner_2k(s)


@partial(jax.jit, static_argnums=(3,))
def bgmw_from_digits(packed_table, table_inf, digits_flat, c: int,
                     neg_flat=None) -> G1Jac:
    """msm_fused_bgmw body over pre-extracted digits.

    digits_flat: int32 [W*n] digits aligned with the table rows —
    unsigned c-bit digits, or balanced-signed magnitudes when neg_flat
    (the per-row negate mask) is given, which HALVES the bucket range.
    Any CONTIGUOUS slice of table rows plus its matching digit slice is
    itself a valid shared-bucket MSM whose result is the partial sum of
    those rows (window weights are baked into the table entries) — the
    mesh-sharded caller exploits this via bgmw_buckets_from_digits."""
    buckets, weights = bgmw_buckets_from_digits(
        packed_table, table_inf, digits_flat, c, neg_flat)
    return bgmw_reduce(buckets, weights, c, neg_flat is not None)


def simulate_rounds(counts, n_tiles: int, G: int) -> int:
    """Host-side mirror of the round allocator: how many slab rounds the
    while_loop will run for the given per-slot loads.

    The guard against the round-1 skew cliff (an all-equal-scalar input
    used to degrade the kernel to O(n) serial batched adds): every round
    allocates `G - n_tiles` point-rows greedily across tiles, so the
    round count is ~ceil(total_load / capacity) even for adversarial
    digit distributions.  Tested in tests/test_msm.py."""
    counts = np.asarray(counts, dtype=np.int64)
    pad = n_tiles * BTILE - counts.shape[0]
    if pad:
        counts = np.concatenate([counts, np.zeros(pad, np.int64)])
    counts = np.sort(counts)[::-1]  # count-descending slot packing
    done = np.zeros_like(counts)
    avail = G - n_tiles
    rounds = 0
    while np.any(done < counts):
        rem = (counts - done).reshape(n_tiles, BTILE)
        r_tile = rem.max(axis=1)
        extra_req = np.maximum(r_tile - 1, 0)
        cum = np.concatenate([[0], np.cumsum(extra_req)[:-1]])
        r_alloc = 1 + np.clip(avail - cum, 0, extra_req)
        done = done + np.clip(
            (counts - done),
            0,
            np.repeat(r_alloc, BTILE),
        )
        rounds += 1
        if rounds > 10_000:  # allocator bug guard
            raise RuntimeError("slab allocator failed to converge")
    return rounds


def _slab_rounds(packed_q, meta_sorted, counts_flat, starts_flat,
                 n_tiles: int, G: int, signed: bool = False):
    """Count-descending slot packing + the multi-round slab loop.

    counts/starts are per-slot (flat, any window structure: slot loads
    are pre-capped by _split_heavy_slots, so sorted-space runs are
    contiguous); packed_q is the quadified table (_quadify);
    meta_sorted is the digit-sorted per-row meta (_row_meta carried
    through sort_key_val): bits 4.. quad index, bits 2..3 quad member,
    bit 1 negate (signed), bit 0 infinity.
    Returns the accumulator [L, n_tiles*BTILE] in packed-slot order and
    the inverse permutation back to flat slot order."""
    BT = n_tiles * BTILE
    pad = BT - counts_flat.shape[0]
    if pad:
        counts_flat = jnp.concatenate(
            [counts_flat, jnp.zeros((pad,), jnp.int32)])
        starts_flat = jnp.concatenate(
            [starts_flat, jnp.zeros((pad,), jnp.int32)])

    # Meta as width-8 rows for the per-round lookup (see round_body).
    mpad = (-meta_sorted.shape[0]) % 8
    if mpad:
        meta_sorted = jnp.concatenate(
            [meta_sorted, jnp.zeros((mpad,), meta_sorted.dtype)])
    meta_oct = meta_sorted.reshape(-1, 8)

    # Count-descending slot packing.
    csort = jnp.argsort(-counts_flat).astype(jnp.int32)          # [BT]
    inv_csort = jnp.argsort(csort).astype(jnp.int32)
    counts_slot = counts_flat[csort]
    starts_slot = starts_flat[csort]

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
        # Per-slot tables are read as 4KB tile ROWS (one take of G rows
        # beats G*BTILE scattered element gathers).
        done_rows = done.reshape(n_tiles, BTILE)
        counts_rows = counts_slot.reshape(n_tiles, BTILE)
        starts_rows = starts_slot.reshape(n_tiles, BTILE)
        rank = (jnp.take(done_rows, tile_id, axis=0)
                + row_id[:, None])                               # [G, BTILE]
        valid = (row_id[:, None] >= 0) & (
            rank < jnp.take(counts_rows, tile_id, axis=0))
        src_pos = jnp.clip(
            jnp.take(starts_rows, tile_id, axis=0) + rank,
            0, meta_sorted.shape[0] - 1,
        ).reshape(-1)
        valid_f = valid.reshape(-1)
        # Meta lookup as width-8 row gathers + a select tree: 1/8th the
        # gather descriptors of an element gather at a comparable row
        # rate (tools/PROBE_GATHER2.log), ~3x cheaper end to end.
        octs = jnp.take(meta_oct, src_pos >> 3, axis=0)          # [GB, 8]
        sel = src_pos & 7
        cols = [octs[:, k] for k in range(8)]
        for bit in range(3):
            pick = ((sel >> bit) & 1).astype(bool)
            cols = [jnp.where(pick, cols[2 * i + 1], cols[2 * i])
                    for i in range(len(cols) // 2)]
        meta = cols[0]
        qsrc = jnp.where(valid_f, (meta >> 4).astype(jnp.int32), 0)

        # Slab stays in gather layout [G*BTILE, 4L]: no transposed copy
        # (at T=2^20 the transpose pass doubled a ~7 GB transient); the
        # kernel selects the quad member per lane and transposes only
        # the selected quarter in VMEM.
        slab_pw = jnp.take(packed_q, qsrc, axis=0)    # [G*BTILE, 4L]
        slab_flags = jnp.where(valid_f, meta & 15, jnp.uint32(1))[None]

        acc = G1Jac(acc_x, acc_y, acc_z)
        new_acc, flags = _run_accum_kernel(
            vk, tile_id, slab_pw, slab_flags, acc, signed=signed
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
                vk, tile_id, slab_pw, slab_flags, acc, signed=signed
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
