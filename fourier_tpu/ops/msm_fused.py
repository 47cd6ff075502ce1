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
3. **Count-descending bucket packing**: all W*2^c buckets (every window
   at once) are ordered by descending load and packed into tiles of
   BTILE buckets.  Because tile-mates have near-equal counts, padding a
   tile to its own max count costs ~2% (vs ~60% for a global max).
4. **One slab gather** builds a contiguous stream of point tiles: lane
   (tile t, row r, slot j) holds the r-th point of the j-th bucket of
   tile t.  This converts the per-row random gathers into a single
   large gather (XLA lowers it as a streaming DMA) + purely sequential
   kernel reads.
5. **One Pallas kernel** walks the slab: grid step g mixed-adds one
   [BTILE]-wide row of points into a VMEM-resident accumulator tile,
   revisited across that tile's rows (scalar-prefetched tile ids drive
   the output index map).  The accumulator touches HBM once per tile,
   not once per row.  The point add is the *incomplete* (collision
   flagged) formula from ops/pallas_curve; any flagged lane triggers an
   exact re-run of the round under the complete formulas (`lax.cond`).
6. **Bounded slab + multi-round**: the slab has a static capacity of
   ~1.1x the mean load; adversarially skewed digit distributions (the
   O(n)-serial cliff of the round-1 kernel, a client-controlled input)
   simply spill into further rounds of the same program under a
   `while_loop` — worst case O(n*W) total work, same as uniform.

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

from ..constants import FP_LIMBS, LIMB_BITS
from . import curve as cv
from . import pallas_curve as pc
from .curve import FP_COMPACT, G1Aff, G1Jac
from .field import FP, with_consts

# Buckets per accumulator tile (the kernel's batch width).  Tests shrink
# this to exercise multi-tile grids at small n.
BTILE = 1024

# Slab capacity as a multiple of the ideal (sum of bucket loads).  The
# ~2% tile-packing slack plus sort-tie jitter fits comfortably in 10%;
# anything beyond spills to a second round.
SLACK = 1.10


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return jnp.concatenate([jnp.zeros((1,), x.dtype), c[:-1]])


# ---------------------------------------------------------------------------
# The accumulation kernel
# ---------------------------------------------------------------------------

def _accum_kernel(vk_ref, ti_ref, consts, sx, sy, sinf, ax_in, ay_in, az_in,
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

    inf_lane = jnp.squeeze(sinf[...], axis=0).astype(bool)
    rx, ry, rz, col = pc._madd_values_incomplete(
        f, ox[...], oy[...], oz[...], sx[...], sy[...], inf_lane
    )
    ox[...] = rx
    oy[...] = ry
    oz[...] = rz
    ofl[...] = ofl[...] | col[None].astype(jnp.uint32)


def _run_accum_kernel(vk, tile_id, slab_x, slab_y, slab_inf, acc: G1Jac):
    """One round of slab accumulation on the Pallas fast path."""
    n_tiles = acc.x.shape[-1] // BTILE
    G = vk.shape[0]

    def slab_map(g, vk_ref, ti_ref):
        return (0, g)

    def acc_map(g, vk_ref, ti_ref):
        return (0, ti_ref[g])

    coord_in = pl.BlockSpec((FP_LIMBS, BTILE), slab_map,
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
        in_specs=[consts_spec, coord_in, coord_in, inf_in,
                  acc_in, acc_in, acc_in],
        out_specs=(acc_out, acc_out, acc_out, flag_out),
    )
    ox, oy, oz, fl = pl.pallas_call(
        _accum_kernel,
        grid_spec=grid_spec,
        out_shape=(coord_shape, coord_shape, coord_shape, flag_shape),
        interpret=pc.interpret(),
    )(vk, tile_id, jnp.asarray(pc._FP_CONSTS), slab_x, slab_y, slab_inf,
      acc.x, acc.y, acc.z)
    return G1Jac(ox, oy, oz), fl


def _run_accum_fallback(vk, tile_id, slab_x, slab_y, slab_inf, acc: G1Jac):
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
        q = G1Aff(
            jax.lax.dynamic_slice_in_dim(slab_x, s, BTILE, axis=1),
            jax.lax.dynamic_slice_in_dim(slab_y, s, BTILE, axis=1),
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

def _grid_size(n: int, w: int, n_tiles: int) -> int:
    """Static grid: one mandatory block per tile (accumulator carry) plus
    SLACK x the mean load in extra rows."""
    return n_tiles + int(np.ceil(SLACK * w * n / BTILE))


@partial(jax.jit, static_argnums=(2,))
def msm_fused(points: G1Aff, scalars, c: int) -> G1Jac:
    """Pippenger MSM via slab-packed fused bucket accumulation.

    points: G1Aff [L, n]; scalars: uint32[FR_LIMBS, n] canonical.
    Returns the single Jacobian result.
    """
    from . import msm as msm_mod

    n = points.x.shape[-1]
    B = 1 << c
    n_windows = -(-256 // c)
    n_tiles = -(-(n_windows * B) // BTILE)
    BT = n_tiles * BTILE
    G = _grid_size(n, n_windows, n_tiles)

    digits = msm_mod._all_window_digits(scalars, c, n_windows)  # [W, n]
    # Points at infinity contribute nothing: fold them into the excluded
    # digit-0 class (bucket 0 is weighted by zero in the reduction).
    digits = jnp.where(points.inf[None], 0, digits)

    # Point-interleaved layout for the slab gather: one row = one point's
    # 48 limbs, so the gather reads contiguous 192-byte rows instead of
    # 2x24 strided words per point (~15x faster on HBM).
    interleaved = jnp.concatenate([points.x.T, points.y.T], axis=1)  # [n, 48]

    order = jnp.argsort(digits, axis=-1).astype(jnp.int32)      # [W, n]
    sd = jnp.take_along_axis(digits, order, axis=-1)

    # Per-window bucket starts in sorted space; counts by differencing.
    edges = jax.vmap(
        lambda row: jnp.searchsorted(
            row, jnp.arange(B + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    )(sd)                                                        # [W, B+1]
    counts = edges[:, 1:] - edges[:, :-1]                        # [W, B]
    counts = counts.at[:, 0].set(0)                              # drop digit 0
    starts = edges[:, :-1] + (
        jnp.arange(n_windows, dtype=jnp.int32) * n
    )[:, None]                                                   # into order_flat

    counts_flat = jnp.concatenate(
        [counts.reshape(-1), jnp.zeros((BT - n_windows * B,), jnp.int32)]
    )
    starts_flat = jnp.concatenate(
        [starts.reshape(-1), jnp.zeros((BT - n_windows * B,), jnp.int32)]
    )

    # Count-descending bucket -> slot packing.
    csort = jnp.argsort(-counts_flat).astype(jnp.int32)          # [BT]
    inv_csort = jnp.argsort(csort).astype(jnp.int32)
    counts_slot = counts_flat[csort]
    starts_slot = starts_flat[csort]
    order_flat = order.reshape(-1)

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
        src_pos = jnp.clip(starts_slot[slot] + rank, 0, order_flat.shape[0] - 1)
        src = jnp.where(valid, order_flat[src_pos], 0).reshape(-1)

        slab = jnp.take(interleaved, src, axis=0).T  # [48, G*BTILE]
        slab_x = slab[:FP_LIMBS]
        slab_y = slab[FP_LIMBS:]
        slab_inf = (
            (~valid.reshape(-1)) | points.inf[src]
        )[None].astype(jnp.uint32)

        acc = G1Jac(acc_x, acc_y, acc_z)
        new_acc, flags = _run_accum_kernel(
            vk, tile_id, slab_x, slab_y, slab_inf, acc
        )
        new_acc = jax.lax.cond(
            jnp.any(flags > 0),
            lambda _: _run_accum_fallback(
                vk, tile_id, slab_x, slab_y, slab_inf, acc
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
    acc = G1Jac(state[0], state[1], state[2])

    # Un-permute slots back to canonical (window, bucket) order.
    canon = inv_csort[: n_windows * B]
    buckets = G1Jac(
        jnp.take(acc.x, canon, axis=-1).reshape(FP_LIMBS, n_windows, B),
        jnp.take(acc.y, canon, axis=-1).reshape(FP_LIMBS, n_windows, B),
        jnp.take(acc.z, canon, axis=-1).reshape(FP_LIMBS, n_windows, B),
    )

    # Weighted bucket reduction + window combine (shared with ops.msm).
    def per_window(_, bw):
        s = msm_mod._bit_partial_sums(G1Jac(*bw), c)  # [L, c, R]
        return None, (s.x, s.y, s.z)

    seq = (
        jnp.moveaxis(buckets.x, 1, 0),
        jnp.moveaxis(buckets.y, 1, 0),
        jnp.moveaxis(buckets.z, 1, 0),
    )
    _, (sx, sy, sz) = jax.lax.scan(per_window, None, seq)  # [W, L, c, R]
    r = sx.shape[-1]

    def to_terms(a):
        return jnp.moveaxis(a, 0, 1).reshape(FP_LIMBS, n_windows * c, r)

    return msm_mod._horner_2k(G1Jac(to_terms(sx), to_terms(sy), to_terms(sz)))
