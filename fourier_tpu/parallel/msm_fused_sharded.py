"""Production MSM sharded across the local device mesh.

The TPU analog of the reference's rayon-parallel MSM *inside one
machine* (`parallel` feature of rust-kzg-blst, reference
Cargo.toml:11-12): one worker's commit/open MSM is split over all local
chips instead of running on one while the others idle.

Sharding scheme (BGMW tables): the expanded table's (window, point) axis
— rows T[w*n + i] = 2^(cw) * P_i — is split contiguously across the mesh
axis.  Window weights are baked into the table entries, so each device's
shard accumulates a COMPLETE bucket space holding the partial sums of
its rows.  Rounds 3-4 finished each shard with its own full weighted
bucket reduction; that fixed ~164 ms tail did not shrink with D and
capped scaling efficiency at 50% on 8 chips (tools/SCALING.log).  Since
round 5 the reduction is paid ONCE, sharded over the bucket axis
(_sharded_bgmw_reduce):

  1. all_to_all the main [0, 2^c) bucket region: chip d keeps bucket
     slice d of every chip's set (~19 MB over ICI at c=16), then
     tree-adds the D received partial sets (log2 D wide adds over B/D
     lanes).
  2. factorized weighted reduction on the LOCAL slice: local rows R_g
     and column partials (column partials point-psum'd across chips:
     H-point gather + tree), bit partial sums of the rows with the
     GLOBAL group index as the dynamic weight.
  3. the dynamic-weight region (signed +1 bucket, split-spare slots) is
     chip-local by construction; its masked partial sums reduce locally
     and the residual lanes all_gather along the Horner lane axis.
  4. one replicated Horner.

Per-chip work beyond the 1/D slab share is O(B/D) adds plus small
replicated tails, versus O(B) per chip before.

Tableless points are sharded along the point axis; each shard runs the
full windowed pipeline (its per-window bucket structure and dynamic slot
weights are chip-local, so bucket exchange does not apply) and the
~300 B Jacobian partials combine over ICI.  The tableless path only
serves rows without precompute tables — not the production config.

Dispatch: models.piano routes through these wrappers when more than one
local device is visible (PianoBackend._msm_dispatch); on one device they
reduce to the single-chip kernels exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import FP_LIMBS
from ..ops import curve as cv
from ..ops import msm as msm_mod
from ..ops.curve import G1Aff, G1Jac


def _combine_partials(part: G1Jac, axis: str) -> tuple:
    """all_gather per-device partial points and tree-combine, replicated."""
    ndev = jax.lax.axis_size(axis)
    gx = jax.lax.all_gather(part.x[:, None], axis, axis=1, tiled=True)
    gy = jax.lax.all_gather(part.y[:, None], axis, axis=1, tiled=True)
    gz = jax.lax.all_gather(part.z[:, None], axis, axis=1, tiled=True)
    pow2 = 1 << (ndev - 1).bit_length() if ndev > 1 else 1
    p = G1Jac(gx, gy, gz)
    if pow2 != ndev:
        pad = cv.jac_identity((pow2 - ndev,))
        p = G1Jac(
            jnp.concatenate([p.x, pad.x], -1),
            jnp.concatenate([p.y, pad.y], -1),
            jnp.concatenate([p.z, pad.z], -1),
        )
    out = cv.tree_sum(p)
    return out.x[..., 0], out.y[..., 0], out.z[..., 0]


def _gather_lanes(p: G1Jac, axis: str) -> G1Jac:
    """all_gather a point batch along its last (lane) axis."""
    a = p.x.ndim - 1
    return G1Jac(
        jax.lax.all_gather(p.x, axis, axis=a, tiled=True),
        jax.lax.all_gather(p.y, axis, axis=a, tiled=True),
        jax.lax.all_gather(p.z, axis, axis=a, tiled=True),
    )


def _exchange_main(main: G1Jac, axis: str, D: int) -> G1Jac:
    """all_to_all the [L, Bpow] main bucket region: returns [L, D, Bl]
    where row j is the local slice received from source chip j."""
    Bl = main.x.shape[-1] // D

    def a2a(a):
        out = jax.lax.all_to_all(a, axis, split_axis=a.ndim - 1,
                                 concat_axis=a.ndim - 1, tiled=True)
        return out.reshape(a.shape[:-1] + (D, Bl))

    return G1Jac(a2a(main.x), a2a(main.y), a2a(main.z))


def sharded_reduce_parts(buckets: G1Jac, weights, c: int, signed: bool,
                         axis: str):
    """Cross-chip bucket combine + bucket-axis-sharded weighted reduction.

    buckets/weights: one chip's canonical bucket set from
    ops.msm_fused.bgmw_buckets_from_digits (or a plain [L, 2^c] bucket
    space with weights == indices).  Returns the [L, c, R] Horner terms,
    replicated (low bits identical on every chip; high/dynamic residual
    lanes all_gathered)."""
    from ..ops import msm_fused as mf

    D = jax.lax.axis_size(axis)
    d = jax.lax.axis_index(axis)
    Bpow = 1 << (c - 1) if signed else 1 << c
    h_bits = c // 2
    H = 1 << h_bits
    Bl = Bpow // D
    if Bl % H:
        raise ValueError(
            f"mesh size {D} too large for c={c}: bucket slice {Bl} must "
            f"hold whole column groups of {H}")
    Gl = Bl // H

    # 1. exchange + combine the main region (axis tree: no transpose)
    main = G1Jac(buckets.x[..., :Bpow], buckets.y[..., :Bpow],
                 buckets.z[..., :Bpow])
    recv = _exchange_main(main, axis, D)                 # [L, D, Bl]
    local = cv.tree_reduce_axis(recv, -2)                # [L, Bl]

    # 2. factorized reduction of the local slice (global b = g*H + h)
    grid = G1Jac(local.x.reshape(FP_LIMBS, Gl, H),
                 local.y.reshape(FP_LIMBS, Gl, H),
                 local.z.reshape(FP_LIMBS, Gl, H))
    rows = mf._reduce_axis(grid, -1)                     # [L, Gl] local g
    colp = mf._reduce_axis(grid, -2)                     # [L, H] partial
    colg = _gather_lanes(G1Jac(colp.x[..., None], colp.y[..., None],
                               colp.z[..., None]), axis)  # [L, H, D]
    cols3 = cv.tree_reduce_last(colg, to=1)
    cols = G1Jac(cols3.x[..., 0], cols3.y[..., 0], cols3.z[..., 0])

    low = msm_mod._bit_partial_sums(cols, h_bits)        # [L, h, R] repl.
    g_idx = d * Gl + jnp.arange(Gl, dtype=jnp.int32)     # global group ids
    high_l = mf._weighted_partial_sums(rows, g_idx, c - h_bits)
    high = _gather_lanes(high_l, axis)                   # [L, c-h, D*R]

    r_main = max(low.x.shape[-1], high.x.shape[-1])
    low = mf._pad_lanes(low, r_main)
    high = mf._pad_lanes(high, r_main)
    terms = G1Jac(
        jnp.concatenate([low.x, high.x], axis=-2),
        jnp.concatenate([low.y, high.y], axis=-2),
        jnp.concatenate([low.z, high.z], axis=-2),
    )                                                    # [L, c, r]

    # 3. chip-local dynamic-weight region (+1 bucket, split spares)
    if buckets.x.shape[-1] > Bpow:
        dyn = G1Jac(buckets.x[..., Bpow:], buckets.y[..., Bpow:],
                    buckets.z[..., Bpow:])
        dyn_l = mf._weighted_partial_sums(dyn, weights[..., Bpow:], c)
        dyn_t = _gather_lanes(dyn_l, axis)               # [L, c, D*Rsp]
        terms = G1Jac(
            jnp.concatenate([terms.x, dyn_t.x], axis=-1),
            jnp.concatenate([terms.y, dyn_t.y], axis=-1),
            jnp.concatenate([terms.z, dyn_t.z], axis=-1),
        )
    return terms


def _sharded_bgmw_reduce(buckets: G1Jac, weights, c: int, signed: bool,
                         axis: str) -> tuple:
    """sharded_reduce_parts + the replicated Horner; returns (x, y, z)."""
    terms = sharded_reduce_parts(buckets, weights, c, signed, axis)
    out = msm_mod._horner_2k(terms)
    return out.x, out.y, out.z


def msm_fused_bgmw_sharded(packed_table, table_inf, scalars, c: int,
                           mesh: Mesh, axis: str = "chips") -> G1Jac:
    """Shared-bucket BGMW MSM with the (window, point) table axis sharded
    and the bucket reduction paid once across the mesh (module docstring).

    packed_table: [W*n, FP_LIMBS] packed words (ops.msm_fused.pack_points
    over a bgmw_expand table); requires W*n divisible by the mesh axis
    size and shards aligned to whole windows (W % D == 0 guarantees it).
    """
    from ..ops import msm_fused as mf

    WN = packed_table.shape[0]
    n = scalars.shape[-1]
    W = WN // n
    D = mesh.shape[axis]
    if D == 1:
        return mf.msm_fused_bgmw(packed_table, table_inf, scalars, c)
    # Shards take contiguous ROW slices of the flat (window, point) axis
    # — window weights are baked into the table entries, so any slice is
    # a valid shared-bucket MSM.  No whole-window alignment needed: the
    # window count is free to be chosen for the per-chip cost model
    # (fewer buckets at more windows — bgmw_auto_window's shards arg).
    if WN % D:
        raise ValueError(f"table rows {WN} not divisible by mesh size {D}")

    digits_flat, neg_flat = mf.bgmw_digits_for(scalars, c, W)  # [W*n]
    signed = neg_flat is not None

    in_specs = [P(axis, None), P(axis), P(axis)]
    args = [packed_table, table_inf, digits_flat]
    if signed:
        in_specs.append(P(axis))
        args.append(neg_flat)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _shard(pk, inf, dg, *rest):
        ng = rest[0] if rest else None
        buckets, weights = mf.bgmw_buckets_from_digits(pk, inf, dg, c, ng)
        return _sharded_bgmw_reduce(buckets, weights, c, signed, axis)

    ox, oy, oz = _shard(*args)
    return G1Jac(ox, oy, oz)


def msm_bgmw_sharded(table: G1Aff, scalars, c: int, mesh: Mesh,
                     axis: str = "chips") -> G1Jac:
    """jnp twin of msm_fused_bgmw_sharded over an affine table (backends
    without Pallas: CPU suite, multi-chip dryrun).  Same structure:
    per-shard bucket accumulation, bucket exchange, one sharded
    reduction."""
    WN = table.x.shape[-1]
    n = scalars.shape[-1]
    W = WN // n
    D = mesh.shape[axis]
    if D == 1:
        return msm_mod.msm_bgmw(table, scalars, c)
    if W % D:
        raise ValueError(f"window count {W} not divisible by mesh size {D}")

    digits = msm_mod._all_window_digits(scalars, c, W)
    B = 1 << c

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis), P(axis, None)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _shard(tx, ty, tinf, dg):
        # bucket 0 may hold real digit-0 content here (the jnp
        # accumulator does not exclude it); its factored weight is 0, so
        # it drops out of the reduction exactly like the fused path's
        # excluded class.
        buckets = msm_mod._bucket_accumulate(
            G1Aff(tx, ty, tinf), dg.reshape(-1), B)
        weights = jnp.arange(B, dtype=jnp.int32)
        return _sharded_bgmw_reduce(buckets, weights, c, False, axis)

    ox, oy, oz = _shard(table.x, table.y, table.inf, digits)
    return G1Jac(ox, oy, oz)


def msm_fused_sharded(points: G1Aff, scalars, c: int, mesh: Mesh,
                      axis: str = "chips") -> G1Jac:
    """Tableless fused MSM with the point axis sharded: each device runs
    the full windowed pipeline on its points; partials combine over ICI."""
    from ..ops import msm_fused as mf

    n = points.x.shape[-1]
    D = mesh.shape[axis]
    if D == 1:
        return mf.msm_fused(points, scalars, c)
    if n % D:
        raise ValueError(f"n={n} not divisible by mesh size {D}")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis), P(None, axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _shard(px, py, pinf, sc):
        part = mf.msm_fused(G1Aff(px, py, pinf), sc, c)
        return _combine_partials(part, axis)

    ox, oy, oz = _shard(points.x, points.y, points.inf, scalars)
    return G1Jac(ox, oy, oz)


def local_mesh(axis: str = "chips") -> Mesh | None:
    """A 1-D mesh over all local devices, or None when only one exists."""
    devs = jax.devices()
    if len(devs) < 2:
        return None
    import numpy as np

    return Mesh(np.array(devs), (axis,))
