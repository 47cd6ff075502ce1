"""Pallas-fused G1 point operations: the speed-of-light TPU path.

Measurement on TPU v5e showed the jnp point ops are HBM-bound: XLA does
not fuse the ~300-op limb-arithmetic chain of a field multiply, so every
intermediate [24, B] array round-trips HBM and a mixed-add runs at ~0.1%
of the VPU's integer throughput.  These kernels fuse an ENTIRE point
operation (up to ~16 field muls, ~80k integer ops per lane) into one
`pallas_call`: coordinates are tiled over the batch axis, all limb
arithmetic happens on VMEM-resident values, and HBM sees only the kernel
inputs and outputs.

The kernel bodies reuse the exact same traceable field/curve formulas as
the jnp path (`ops.field.Field` methods on values, `ops.curve` algebra),
so bit-exactness with the tested path is structural.  Dispatch: curve.py
routes through these kernels on TPU backends (FOURIER_PALLAS=0 opts out);
the jnp path remains the CPU/test reference.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import FP_LIMBS
from .field import FP, packed_consts, with_consts

_FP_CONSTS = packed_consts(FP)  # [6, L] kernel operand (Mosaic rejects
                                # captured array constants)

# batch lanes per grid step; [24, TILE] uint32 = 96KB per operand; the fused kernel live-set peaks ~8.5MB
TILE = 1024


def interpret() -> bool:
    """Run kernels through the Pallas interpreter (jax-op emulation).

    The CI/test path: Mosaic cannot lower on CPU, but the interpreter
    executes the identical kernel bodies with plain jax ops, so the
    fused kernels (including the collision-flag contract) are testable
    in the CPU suite.  Enabled with FOURIER_PALLAS_INTERPRET=1 together
    with FOURIER_PALLAS=1; never used on real TPU runs.
    """
    return os.environ.get("FOURIER_PALLAS_INTERPRET", "0") == "1"


def _pad_to_tile(arrs, batch: int):
    pad = (-batch) % TILE
    if pad == 0:
        return arrs, batch
    out = []
    for a in arrs:
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        out.append(jnp.pad(a, cfg))
    return out, batch + pad


def _grid_call(kernel, n_out: int, *arrs):
    """Run `kernel` over TILE-wide batch slices of [.., B] arrays; the
    packed field constants ride along as a replicated first operand."""
    batch = arrs[0].shape[-1]
    arrs, padded = _pad_to_tile(list(arrs), batch)
    grid = padded // TILE

    def spec(a):
        block = a.shape[:-1] + (TILE,)
        nlead = len(block) - 1
        return pl.BlockSpec(
            block, lambda i, _n=nlead: (0,) * _n + (i,), memory_space=pltpu.VMEM
        )

    consts_spec = pl.BlockSpec(
        _FP_CONSTS.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct((FP_LIMBS, padded), jnp.uint32) for _ in range(n_out)
    )
    out_specs = tuple(
        pl.BlockSpec((FP_LIMBS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in range(n_out)
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[consts_spec] + [spec(a) for a in arrs],
        out_specs=out_specs if n_out > 1 else out_specs[0],
        out_shape=out_shapes if n_out > 1 else out_shapes[0],
        interpret=interpret(),
    )(jnp.asarray(_FP_CONSTS), *arrs)
    if n_out == 1:
        outs = (outs,)
    return tuple(o[..., :batch] for o in outs)


# -- kernel bodies (operate on values, reuse the Field formulas) ------------

_f_mul = FP.mul.__wrapped__
_f_sq = lambda f, a: FP.square.__wrapped__(f, a)
_f_add = FP.add.__wrapped__
_f_sub = FP.sub.__wrapped__


def _dbl_values(f, x, y, z):
    a = _f_mul(f, x, x)
    b = _f_mul(f, y, y)
    c = _f_mul(f, b, b)
    d0 = _f_sq(f, _f_add(f, x, b))
    t = _f_sub(f, _f_sub(f, d0, a), c)
    d = _f_add(f, t, t)
    e = _f_add(f, _f_add(f, a, a), a)
    ff = _f_sq(f, e)
    x3 = _f_sub(f, ff, _f_add(f, d, d))
    c2 = _f_add(f, c, c)
    c4 = _f_add(f, c2, c2)
    c8 = _f_add(f, c4, c4)
    y3 = _f_sub(f, _f_mul(f, e, _f_sub(f, d, x3)), c8)
    z3 = _f_mul(f, _f_add(f, y, y), z)
    return x3, y3, z3


def _select(mask, a, b):
    return jnp.where(mask[None], a, b)


def _madd_values(f, x1, y1, z1, x2, y2, inf2):
    """Mixed add (q affine); identical algebra to curve.madd."""
    z1z1 = _f_sq(f, z1)
    u2 = _f_mul(f, x2, z1z1)
    s2 = _f_mul(f, _f_mul(f, y2, z1), z1z1)
    h = _f_sub(f, u2, x1)
    hh = _f_sq(f, h)
    i = _f_add(f, hh, hh)
    i = _f_add(f, i, i)
    j = _f_mul(f, h, i)
    rr = _f_sub(f, s2, y1)
    rr = _f_add(f, rr, rr)
    v = _f_mul(f, x1, i)
    x3 = _f_sub(f, _f_sub(f, _f_sq(f, rr), j), _f_add(f, v, v))
    yj = _f_mul(f, y1, j)
    y3 = _f_sub(f, _f_mul(f, rr, _f_sub(f, v, x3)), _f_add(f, yj, yj))
    z3 = _f_sub(f, _f_sub(f, _f_sq(f, _f_add(f, z1, h)), z1z1), hh)

    same = jnp.all(h == 0, axis=0) & jnp.all(rr == 0, axis=0)
    dx, dy, dz = _dbl_values(f, x1, y1, z1)
    x3 = _select(same, dx, x3)
    y3 = _select(same, dy, y3)
    z3 = _select(same, dz, z3)

    p_inf = jnp.all(z1 == 0, axis=0)
    one = jnp.broadcast_to(f.one_mont[:, None], z1.shape).astype(jnp.uint32)
    x3 = _select(p_inf, x2, x3)
    y3 = _select(p_inf, y2, y3)
    z3 = _select(p_inf, one, z3)
    x3 = _select(inf2, x1, x3)
    y3 = _select(inf2, y1, y3)
    z3 = _select(inf2, z1, z3)
    return x3, y3, z3


def _add_values(f, x1, y1, z1, x2, y2, z2):
    """Full Jacobian add; identical algebra to curve.add."""
    z1z1 = _f_sq(f, z1)
    z2z2 = _f_sq(f, z2)
    u1 = _f_mul(f, x1, z2z2)
    u2 = _f_mul(f, x2, z1z1)
    s1 = _f_mul(f, _f_mul(f, y1, z2), z2z2)
    s2 = _f_mul(f, _f_mul(f, y2, z1), z1z1)
    h = _f_sub(f, u2, u1)
    i = _f_sq(f, _f_add(f, h, h))
    j = _f_mul(f, h, i)
    rr = _f_sub(f, s2, s1)
    rr = _f_add(f, rr, rr)
    v = _f_mul(f, u1, i)
    x3 = _f_sub(f, _f_sub(f, _f_sq(f, rr), j), _f_add(f, v, v))
    s1j = _f_mul(f, s1, j)
    y3 = _f_sub(f, _f_mul(f, rr, _f_sub(f, v, x3)), _f_add(f, s1j, s1j))
    z3 = _f_mul(
        f, _f_sub(f, _f_sub(f, _f_sq(f, _f_add(f, z1, z2)), z1z1), z2z2), h
    )
    same = jnp.all(h == 0, axis=0) & jnp.all(rr == 0, axis=0)
    dx, dy, dz = _dbl_values(f, x1, y1, z1)
    x3 = _select(same, dx, x3)
    y3 = _select(same, dy, y3)
    z3 = _select(same, dz, z3)
    p_inf = jnp.all(z1 == 0, axis=0)
    q_inf = jnp.all(z2 == 0, axis=0)
    x3 = _select(p_inf, x2, _select(q_inf, x1, x3))
    y3 = _select(p_inf, y2, _select(q_inf, y1, y3))
    z3 = _select(p_inf, z2, _select(q_inf, z1, z3))
    return x3, y3, z3


def _madd_kernel(consts, x1, y1, z1, x2, y2, inf2, ox, oy, oz):
    f = with_consts(FP, consts[...], rolled=interpret())
    rx, ry, rz = _madd_values(
        f,
        x1[...],
        y1[...],
        z1[...],
        x2[...],
        y2[...],
        jnp.squeeze(inf2[...], axis=0).astype(bool),
    )
    ox[...] = rx
    oy[...] = ry
    oz[...] = rz


def _add_kernel(consts, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    f = with_consts(FP, consts[...], rolled=interpret())
    rx, ry, rz = _add_values(
        f, x1[...], y1[...], z1[...], x2[...], y2[...], z2[...]
    )
    ox[...] = rx
    oy[...] = ry
    oz[...] = rz


def _dbl_kernel(consts, x1, y1, z1, ox, oy, oz):
    f = with_consts(FP, consts[...], rolled=interpret())
    rx, ry, rz = _dbl_values(f, x1[...], y1[...], z1[...])
    ox[...] = rx
    oy[...] = ry
    oz[...] = rz


# -- public entry points ----------------------------------------------------

@jax.jit
def madd(p_x, p_y, p_z, q_x, q_y, q_inf):
    """Fused mixed add on [L, B] batches; q_inf is bool [B]."""
    inf_row = q_inf[None].astype(jnp.uint32)  # [1, B] for tiling
    ox, oy, oz = _grid_call(_madd_kernel, 3, p_x, p_y, p_z, q_x, q_y, inf_row)
    return ox, oy, oz


@jax.jit
def add(p_x, p_y, p_z, q_x, q_y, q_z):
    ox, oy, oz = _grid_call(_add_kernel, 3, p_x, p_y, p_z, q_x, q_y, q_z)
    return ox, oy, oz


@jax.jit
def dbl(p_x, p_y, p_z):
    ox, oy, oz = _grid_call(_dbl_kernel, 3, p_x, p_y, p_z)
    return ox, oy, oz


@functools.partial(jax.jit, static_argnames=("width",))
def horner_2k(tx, ty, tz, width: int = 1):
    """sum_k 2^k * T_k over Jacobian terms T, as ONE kernel.

    Inputs are [L, K*width]: K terms laid out contiguously along the
    last axis, each `width` lanes wide (independent residual lanes that
    the caller folds afterwards — see msm._horner_2k).  Grid step i
    processes term k = K-1-i with acc = 2*acc + T_k, the accumulator
    living in the revisited [L, width] output block (VMEM-resident).

    The combine chain is inherently sequential (one accumulator), so as
    individual Pallas launches it costs ~2K dispatches and two kernel
    instantiations; as a single grid it is one instantiation and one
    dispatch.  Uses the *complete* addition formulas — bucket partial
    sums are arbitrary group elements, so same-point/identity cases are
    legal here (unlike the DLOG-guarded accumulation fast path).
    """
    L, KW = tx.shape
    K = KW // width

    def kernel(consts, bx, by, bz, ox, oy, oz):
        f = with_consts(FP, consts[...], rolled=interpret())
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            ox[...] = bx[...]
            oy[...] = by[...]
            oz[...] = bz[...]

        @pl.when(i > 0)
        def _step():
            ax = jnp.squeeze(ox[...], axis=0)
            ay = jnp.squeeze(oy[...], axis=0)
            az = jnp.squeeze(oz[...], axis=0)
            dx, dy, dz = _dbl_values(f, ax, ay, az)
            rx, ry, rz = _add_values(
                f, dx, dy, dz,
                jnp.squeeze(bx[...], axis=0),
                jnp.squeeze(by[...], axis=0),
                jnp.squeeze(bz[...], axis=0),
            )
            ox[...] = rx[None]
            oy[...] = ry[None]
            oz[...] = rz[None]

    # [K, L, width] layout: block (1, L, width) — the trailing block dims
    # equal the array dims exactly, satisfying Mosaic's (8, 128) tiling
    # rule for any width (32-lane residuals included).
    def to_klw(a):
        return jnp.moveaxis(a.reshape(L, K, width), 0, 1)

    t_spec = pl.BlockSpec(
        (1, L, width), lambda i: (K - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (1, L, width), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    consts_spec = pl.BlockSpec(
        _FP_CONSTS.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = jax.ShapeDtypeStruct((1, L, width), jnp.uint32)
    ox, oy, oz = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[consts_spec, t_spec, t_spec, t_spec],
        out_specs=(o_spec, o_spec, o_spec),
        out_shape=(out, out, out),
        interpret=interpret(),
    )(jnp.asarray(_FP_CONSTS), to_klw(tx), to_klw(ty), to_klw(tz))
    return ox[0], oy[0], oz[0]


def enabled() -> bool:
    """Use Pallas kernels on TPU backends unless explicitly disabled."""
    flag = os.environ.get("FOURIER_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# -- incomplete (collision-flagged) variants --------------------------------
#
# In the MSM inner loops the same-point case (which forces the expensive
# doubling path, ~35% of the complete kernel's work) can only occur if a
# partial bucket sum collides with the next base point — which requires
# knowing discrete logs of the SRS points.  The fast kernels below omit
# the doubling path entirely and instead emit a per-lane collision flag;
# the wrapper re-runs the complete kernel under `lax.cond` if any lane
# flagged, preserving exact semantics.

def _madd_values_incomplete(f, x1, y1, z1, x2, y2, inf2):
    z1z1 = _f_sq(f, z1)
    u2 = _f_mul(f, x2, z1z1)
    s2 = _f_mul(f, _f_mul(f, y2, z1), z1z1)
    h = _f_sub(f, u2, x1)
    hh = _f_sq(f, h)
    i = _f_add(f, hh, hh)
    i = _f_add(f, i, i)
    j = _f_mul(f, h, i)
    rr = _f_sub(f, s2, y1)
    rr = _f_add(f, rr, rr)
    v = _f_mul(f, x1, i)
    x3 = _f_sub(f, _f_sub(f, _f_sq(f, rr), j), _f_add(f, v, v))
    yj = _f_mul(f, y1, j)
    y3 = _f_sub(f, _f_mul(f, rr, _f_sub(f, v, x3)), _f_add(f, yj, yj))
    z3 = _f_sub(f, _f_sub(f, _f_sq(f, _f_add(f, z1, h)), z1z1), hh)

    p_inf = jnp.all(z1 == 0, axis=0)
    collision = (
        jnp.all(h == 0, axis=0) & jnp.all(rr == 0, axis=0) & ~p_inf & ~inf2
    )
    one = jnp.broadcast_to(f.one_mont[:, None], z1.shape).astype(jnp.uint32)
    x3 = _select(p_inf, x2, x3)
    y3 = _select(p_inf, y2, y3)
    z3 = _select(p_inf, one, z3)
    x3 = _select(inf2, x1, x3)
    y3 = _select(inf2, y1, y3)
    z3 = _select(inf2, z1, z3)
    return x3, y3, z3, collision


def _madd_values_incomplete_lazy(f, x1, y1, z1, x2, y2, inf2):
    """_madd_values_incomplete over padded-lazy representatives.

    The accumulator (x1, y1, z1) may hold lazy representatives from the
    previous grid step; the affine operand is canonical.  Every mul
    skips its trailing conditional subtract and half its first carry
    (field.mul_lazy), and every add/sub folds its conditional reduction
    into the single carry resolution (field.add_lazy top-column test) —
    together the deferred reductions are ~25% of the madd.  (Fusing
    whole add/sub CHAINS into one carry was measured slightly slower:
    the per-lane reduction-count multiply outweighs the saved carries.)
    Equality branches use the three-representative zero test; callers
    canonicalize kernel outputs once on exit."""
    ml = f.mul_lazy
    sq = f.square_lazy
    ad = f.add_lazy
    sb = f.sub_lazy
    z1z1 = sq(z1)
    u2 = ml(x2, z1z1)
    s2 = ml(ml(y2, z1), z1z1)
    h = sb(u2, x1)
    hh = sq(h)
    i = ad(hh, hh)
    i = ad(i, i)
    j = ml(h, i)
    rr = sb(s2, y1)
    rr = ad(rr, rr)
    v = ml(x1, i)
    x3 = sb(sb(sq(rr), j), ad(v, v))
    yj = ml(y1, j)
    y3 = sb(ml(rr, sb(v, x3)), ad(yj, yj))
    z3 = sb(sb(sq(ad(z1, h)), z1z1), hh)

    p_inf = f.is_zero_lazy(z1)
    collision = (
        f.is_zero_lazy(h) & f.is_zero_lazy(rr) & ~p_inf & ~inf2
    )
    one = jnp.broadcast_to(f.one_mont[:, None], z1.shape).astype(jnp.uint32)
    x3 = _select(p_inf, x2, x3)
    y3 = _select(p_inf, y2, y3)
    z3 = _select(p_inf, one, z3)
    x3 = _select(inf2, x1, x3)
    y3 = _select(inf2, y1, y3)
    z3 = _select(inf2, z1, z3)
    return x3, y3, z3, collision


def _madd_inc_kernel(consts, x1, y1, z1, x2, y2, inf2, ox, oy, oz, oflag):
    f = with_consts(FP, consts[...], rolled=interpret())
    rx, ry, rz, col = _madd_values_incomplete(
        f, x1[...], y1[...], z1[...], x2[...], y2[...],
        jnp.squeeze(inf2[...], axis=0).astype(bool),
    )
    ox[...] = rx
    oy[...] = ry
    oz[...] = rz
    oflag[...] = col[None].astype(jnp.uint32)


def _add_values_incomplete(f, x1, y1, z1, x2, y2, z2):
    z1z1 = _f_sq(f, z1)
    z2z2 = _f_sq(f, z2)
    u1 = _f_mul(f, x1, z2z2)
    u2 = _f_mul(f, x2, z1z1)
    s1 = _f_mul(f, _f_mul(f, y1, z2), z2z2)
    s2 = _f_mul(f, _f_mul(f, y2, z1), z1z1)
    h = _f_sub(f, u2, u1)
    i = _f_sq(f, _f_add(f, h, h))
    j = _f_mul(f, h, i)
    rr = _f_sub(f, s2, s1)
    rr = _f_add(f, rr, rr)
    v = _f_mul(f, u1, i)
    x3 = _f_sub(f, _f_sub(f, _f_sq(f, rr), j), _f_add(f, v, v))
    s1j = _f_mul(f, s1, j)
    y3 = _f_sub(f, _f_mul(f, rr, _f_sub(f, v, x3)), _f_add(f, s1j, s1j))
    z3 = _f_mul(
        f, _f_sub(f, _f_sub(f, _f_sq(f, _f_add(f, z1, z2)), z1z1), z2z2), h
    )
    p_inf = jnp.all(z1 == 0, axis=0)
    q_inf = jnp.all(z2 == 0, axis=0)
    collision = (
        jnp.all(h == 0, axis=0) & jnp.all(rr == 0, axis=0) & ~p_inf & ~q_inf
    )
    x3 = _select(p_inf, x2, _select(q_inf, x1, x3))
    y3 = _select(p_inf, y2, _select(q_inf, y1, y3))
    z3 = _select(p_inf, z2, _select(q_inf, z1, z3))
    return x3, y3, z3, collision


def _add_inc_kernel(consts, x1, y1, z1, x2, y2, z2, ox, oy, oz, oflag):
    f = with_consts(FP, consts[...], rolled=interpret())
    rx, ry, rz, col = _add_values_incomplete(
        f, x1[...], y1[...], z1[...], x2[...], y2[...], z2[...]
    )
    ox[...] = rx
    oy[...] = ry
    oz[...] = rz
    oflag[...] = col[None].astype(jnp.uint32)


def _grid_call_flagged(kernel, *arrs):
    """_grid_call variant with a 4th [1, B] uint32 flag output."""
    batch = arrs[0].shape[-1]
    arrs, padded = _pad_to_tile(list(arrs), batch)
    grid = padded // TILE

    def spec(a):
        block = a.shape[:-1] + (TILE,)
        nlead = len(block) - 1
        return pl.BlockSpec(
            block, lambda i, _n=nlead: (0,) * _n + (i,), memory_space=pltpu.VMEM
        )

    consts_spec = pl.BlockSpec(
        _FP_CONSTS.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    coord = jax.ShapeDtypeStruct((FP_LIMBS, padded), jnp.uint32)
    flag = jax.ShapeDtypeStruct((1, padded), jnp.uint32)
    coord_spec = pl.BlockSpec(
        (FP_LIMBS, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    flag_spec = pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    ox, oy, oz, fl = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[consts_spec] + [spec(a) for a in arrs],
        out_specs=(coord_spec, coord_spec, coord_spec, flag_spec),
        out_shape=(coord, coord, coord, flag),
        interpret=interpret(),
    )(jnp.asarray(_FP_CONSTS), *arrs)
    return (
        ox[..., :batch], oy[..., :batch], oz[..., :batch], fl[..., :batch]
    )


def madd_inc(p_x, p_y, p_z, q_x, q_y, q_inf):
    """Incomplete fast madd on [L, B]: returns (x, y, z, flag[1, B]).

    flag lanes are nonzero where the omitted doubling path would have been
    needed; callers must fall back to a complete formula when any flag is
    set (curve.madd_fast does this under `lax.cond`)."""
    inf_row = q_inf[None].astype(jnp.uint32)
    return _grid_call_flagged(_madd_inc_kernel, p_x, p_y, p_z, q_x, q_y, inf_row)


def add_inc(p_x, p_y, p_z, q_x, q_y, q_z):
    """Incomplete fast Jacobian add; same flag contract as madd_inc."""
    return _grid_call_flagged(_add_inc_kernel, p_x, p_y, p_z, q_x, q_y, q_z)


@jax.jit
def madd_checked(p_x, p_y, p_z, q_x, q_y, q_inf):
    """Incomplete fast madd with exact-fallback on collision lanes."""
    ox, oy, oz, fl = madd_inc(p_x, p_y, p_z, q_x, q_y, q_inf)

    def slow(_):
        return madd(p_x, p_y, p_z, q_x, q_y, q_inf)

    return jax.lax.cond(
        jnp.any(fl > 0), slow, lambda _: (ox, oy, oz), operand=None
    )


@jax.jit
def add_checked(p_x, p_y, p_z, q_x, q_y, q_z):
    ox, oy, oz, fl = _grid_call_flagged(
        _add_inc_kernel, p_x, p_y, p_z, q_x, q_y, q_z
    )

    def slow(_):
        return add(p_x, p_y, p_z, q_x, q_y, q_z)

    return jax.lax.cond(
        jnp.any(fl > 0), slow, lambda _: (ox, oy, oz), operand=None
    )
