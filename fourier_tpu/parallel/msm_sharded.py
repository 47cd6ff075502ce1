"""MSM sharded across a device mesh.

The points/scalars axis is partitioned over mesh slots (the TPU analog
of the reference's rayon-parallel Pippenger inside one host,
SURVEY.md §2d item 2): each device runs the full vectorized Pippenger on
its shard, then the per-device partial sums — single Jacobian points,
~300 bytes each — are all-gathered over ICI and tree-combined on every
device.  Communication is O(#devices), compute is n/#devices per chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import curve as cv
from ..ops import msm as msm_mod
from ..ops.curve import G1Aff, G1Jac


def msm_sharded(points: G1Aff, scalars, mesh: Mesh, axis: str = "workers",
                window: int = 0) -> G1Jac:
    """sum_i scalars[i] * points[i] with the i axis split across `mesh`.

    points: G1Aff [L, n]; scalars uint32[FR_LIMBS, n] canonical; n must be
    divisible by the mesh axis size.  Returns a replicated single point.
    """
    n = points.x.shape[-1]
    ndev = mesh.shape[axis]
    if n % ndev:
        raise ValueError(f"n={n} not divisible by mesh axis size {ndev}")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, axis), P(None, axis), P(axis),   # points x, y, inf
            P(None, axis),                            # scalars
        ),
        out_specs=P(None, axis),
        check_vma=False,
    )
    def _shard(px, py, pinf, sc):
        local = G1Aff(px, py, pinf)
        part = (
            msm_mod.msm(local, sc, window)
            if px.shape[-1] > 64
            else msm_mod.msm_naive(local, sc)
        )
        # one partial point per device -> [L, 1] laid out on the axis
        return part.x[:, None], part.y[:, None], part.z[:, None]

    gx, gy, gz = _shard(points.x, points.y, points.inf, scalars)
    # gathered [L, ndev]: combine on host-side device (replicated tree add)
    parts = G1Jac(gx, gy, gz)
    if ndev == 1:
        return G1Jac(gx[..., 0], gy[..., 0], gz[..., 0])
    # pad to a power of two and tree-reduce
    pow2 = 1 << (ndev - 1).bit_length()
    if pow2 != ndev:
        pad = cv.jac_identity((pow2 - ndev,))
        parts = G1Jac(
            jnp.concatenate([parts.x, pad.x], -1),
            jnp.concatenate([parts.y, pad.y], -1),
            jnp.concatenate([parts.z, pad.z], -1),
        )
    out = cv.tree_sum(parts)
    return G1Jac(out.x[..., 0], out.y[..., 0], out.z[..., 0])
