"""Production MSM sharded across the local device mesh.

The TPU analog of the reference's rayon-parallel MSM *inside one
machine* (`parallel` feature of rust-kzg-blst, reference
Cargo.toml:11-12): one worker's commit/open MSM is split over all local
chips instead of running on one while the others idle.

Sharding scheme (BGMW tables): the expanded table's (window, point) axis
— rows T[w*n + i] = 2^(cw) * P_i — is split contiguously across the mesh
axis.  Window weights are baked into the table entries, so each device's
shard is itself a complete shared-bucket MSM whose result is the partial
sum of its rows; the per-device Jacobian partials (~300 B each) are
all-gathered over ICI and tree-combined replicated.  Compute is WN/D per
chip, communication O(D) points.

Tableless points are sharded the same way along the point axis (each
shard runs the full windowed Pippenger on its points).

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


def msm_fused_bgmw_sharded(packed_table, table_inf, scalars, c: int,
                           mesh: Mesh, axis: str = "chips") -> G1Jac:
    """Shared-bucket BGMW MSM with the (window, point) table axis sharded.

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
    if W % D:
        raise ValueError(f"window count {W} not divisible by mesh size {D}")

    digits_flat, neg_flat = mf.bgmw_digits_for(scalars, c, W)  # [W*n]
    digits = digits_flat.reshape(W, n)
    negs = neg_flat.reshape(W, n) if neg_flat is not None else None

    in_specs = [P(axis, None), P(axis), P(axis, None)]
    args = [packed_table, table_inf, digits]
    if negs is not None:
        in_specs.append(P(axis, None))
        args.append(negs)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _shard(pk, inf, dg, *rest):
        ng = rest[0].reshape(-1) if rest else None
        part = mf.bgmw_from_digits(pk, inf, dg.reshape(-1), c, ng)
        return _combine_partials(part, axis)

    ox, oy, oz = _shard(*args)
    return G1Jac(ox, oy, oz)


def msm_bgmw_sharded(table: G1Aff, scalars, c: int, mesh: Mesh,
                     axis: str = "chips") -> G1Jac:
    """jnp twin of msm_fused_bgmw_sharded over an affine table (backends
    without Pallas: CPU suite, multi-chip dryrun)."""
    WN = table.x.shape[-1]
    n = scalars.shape[-1]
    W = WN // n
    D = mesh.shape[axis]
    if D == 1:
        return msm_mod.msm_bgmw(table, scalars, c)
    if W % D:
        raise ValueError(f"window count {W} not divisible by mesh size {D}")

    digits = msm_mod._all_window_digits(scalars, c, W)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis), P(axis, None)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _shard(tx, ty, tinf, dg):
        part = msm_mod.bgmw_from_digits(G1Aff(tx, ty, tinf),
                                        dg.reshape(-1), c)
        return _combine_partials(part, axis)

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
