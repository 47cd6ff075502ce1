"""Multi-scalar multiplication (MSM) on TPU: vectorized Pippenger.

TPU-native replacement for rust-kzg-blst's ``g1_linear_combination``
(the hot kernel behind every commit/open in the reference,
src/engine/piano.rs:150,167,228,259,287,327).  The CPU reference uses
Pippenger with rayon threads and optional BGMW tables; a literal port
would serialize on data-dependent bucket scatter, so the kernel is
re-formulated for SIMD:

1. **Digits**: c-bit windows extracted from canonical (non-Montgomery)
   scalar limbs — pure vector bit ops, all windows at once.
2. **Bucket accumulation**: per window, points are sorted by digit
   (one XLA sort), so bucket b's points occupy a contiguous run; a
   `while_loop` over the maximum bucket load performs one *batched*
   mixed-add per row across all 2^c buckets simultaneously (invalid
   lanes masked as affine infinity).  Work ~= n + slack per window,
   all in wide vector ops.
3. **Bucket reduction**: the weighted sum  sum_b b*B_b  is computed with
   a sqrt-decomposition — suffix scans batched across bucket groups —
   instead of the CPU-style serial running sum (~2*sqrt(#buckets)
   batched adds rather than #buckets serial adds).
4. **Window combine**: a scan over windows with c doublings per step.

Windows are processed under `lax.scan` so the traced graph stays small.
Scalars are plain canonical integers (digit decomposition needs the
standard representation, not Montgomery).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FP_LIMBS, FR_LIMBS, LIMB_BITS
from . import curve as cv
from .curve import G1Aff, G1Jac
from .field import FP


def _all_window_digits(scalars, c: int, n_windows: int):
    """[FR_LIMBS, n] canonical limbs -> [n_windows, n] int32 c-bit digits."""
    out = []
    for w in range(n_windows):
        lo = w * c
        limb = lo // LIMB_BITS
        off = lo % LIMB_BITS
        d = scalars[limb] >> off
        if off + c > LIMB_BITS and limb + 1 < scalars.shape[0]:
            d = d | (scalars[limb + 1] << (LIMB_BITS - off))
        out.append((d & ((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(out)


def _bucket_accumulate(points: G1Aff, digits, n_buckets: int) -> G1Jac:
    """Sum points into their digit buckets; returns [L, n_buckets] Jacobians."""
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sorted_digits = digits[order]
    del sorted_digits  # runs are implied by counts/starts
    sx = jnp.take(points.x, order, axis=-1)
    sy = jnp.take(points.y, order, axis=-1)
    sinf = points.inf[order]

    counts = jnp.zeros((n_buckets,), jnp.int32).at[digits].add(1, mode="drop")
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    max_count = jnp.max(counts)

    def cond(state):
        r, _ = state
        return r < max_count

    def body(state):
        r, acc = state
        idx = jnp.clip(starts + r, 0, n - 1)
        valid = r < counts
        q = G1Aff(
            jnp.take(sx, idx, axis=-1),
            jnp.take(sy, idx, axis=-1),
            sinf[idx] | ~valid,
        )
        return r + 1, cv.madd_fast(acc, q)

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cv.jac_identity((n_buckets,)))
    )
    return acc


def _bit_partial_sums(buckets: G1Jac, c: int) -> G1Jac:
    """[L, B] buckets -> [L, c, R] bit partial sums with R <= 32 residual
    lanes per bit: summing lanes over R gives S_j = sum_{b: bit j set} B_b.

    Based on the bucket-index bit decomposition

        sum_b b*B_b = sum_j 2^j * S_j

    — the weighted bucket sum becomes c masked reductions (masked-out
    lanes become the identity by zeroing z), all batched along a `c`
    axis and folded with fixed-shape scans (cv.scan_sum) so the fused
    Pallas add is instantiated at only two shapes regardless of B.  The
    last R lanes are deliberately NOT reduced here: that stage has no
    batch parallelism left, so it rides along the Horner combine
    (_horner_2k runs R independent chains) and is folded once at the
    very end."""
    n_buckets = buckets.x.shape[-1]
    c_eff = max(c, 1)
    idx = np.arange(n_buckets)
    masks = np.stack([(idx >> j) & 1 for j in range(c_eff)]).astype(bool)

    bx = jnp.broadcast_to(buckets.x[:, None, :], (FP_LIMBS, c_eff, n_buckets))
    by = jnp.broadcast_to(buckets.y[:, None, :], (FP_LIMBS, c_eff, n_buckets))
    bz = jnp.where(masks[None], buckets.z[:, None, :], 0)  # z=0 -> identity
    return cv.tree_reduce_last(G1Jac(bx, by, bz), to=32)   # [L, c, R]


def _horner_2k(terms: G1Jac) -> G1Jac:
    """sum over k and r of 2^k * terms[:, k, r] for [L, K, R] Jacobian
    terms (R independent residual lanes per term); returns the scalar
    point ([L] coordinates).

    acc = 2*acc + T_k, high k to low — but the accumulator keeps R lanes
    (sum swap: sum_k 2^k sum_r T_kr == sum_r sum_k 2^k T_kr), so the
    sequential chain still fills R vector lanes.  On TPU the whole chain
    runs as ONE fused Pallas grid with the accumulator resident in VMEM
    (pallas_curve.horner_2k); on CPU it is a lax.scan of jnp point ops.
    The final R-lane fold uses the compact complete-add tree."""
    from . import pallas_curve as pc

    L, K, R = terms.x.shape
    if pc.enabled():
        ox, oy, oz = pc.horner_2k(
            terms.x.reshape(L, K * R),
            terms.y.reshape(L, K * R),
            terms.z.reshape(L, K * R),
            width=R,
        )
        res = G1Jac(ox, oy, oz)  # [L, R]
    else:
        seq = (
            jnp.moveaxis(terms.x, -2, 0)[::-1],
            jnp.moveaxis(terms.y, -2, 0)[::-1],
            jnp.moveaxis(terms.z, -2, 0)[::-1],
        )

        def step(acc, t_k):
            return cv.add_fast(cv.dbl_fast(acc), G1Jac(*t_k)), None

        res, _ = jax.lax.scan(step, cv.jac_identity((R,)), seq)
    out = cv.fold_small(res)
    return G1Jac(out.x[..., 0], out.y[..., 0], out.z[..., 0])


def _auto_window(n: int) -> int:
    """Window size tuned for the TPU schedule: more buckets = fewer, fatter
    bucket-accumulation rows (mean load ~16), which matters far more on a
    vector machine than the bucket-reduction work it adds."""
    return max(6, min(13, n.bit_length() - 4))


@partial(jax.jit, static_argnums=(2,))
def msm(points: G1Aff, scalars, c: int = 0) -> G1Jac:
    """Pippenger MSM: sum_i scalars[i] * points[i].

    points: G1Aff batch [L, n]; scalars: uint32[FR_LIMBS, n] canonical.
    Returns a single Jacobian point (batch shape ()).
    """
    n = points.x.shape[-1]
    if c == 0:
        c = _auto_window(n)

    from . import pallas_curve as pc

    if pc.enabled():
        # TPU fast path: slab-packed fused bucket accumulation.  The jnp
        # formulation below remains the CPU/test reference.
        from . import msm_fused

        return msm_fused.msm_fused(points, scalars, c)

    n_buckets = 1 << c
    n_windows = -(-256 // c)

    digits_all = _all_window_digits(scalars, c, n_windows)  # [W, n]

    def per_window(_, digits):
        buckets = _bucket_accumulate(points, digits, n_buckets)
        s = _bit_partial_sums(buckets, c)  # [L, c, R]
        return None, (s.x, s.y, s.z)

    _, (sx, sy, sz) = jax.lax.scan(per_window, None, digits_all)  # [W, L, c, R]

    # Every (window w, bit j) partial carries weight 2^(c*w + j), and the
    # exponents c*w + j are pairwise distinct — so the whole combine is a
    # single binary Horner over K = W*c terms ordered by k.
    r = sx.shape[-1]

    def to_terms(a):  # [W, L, c, R] -> [L, K, R], term k = c*w + j
        return jnp.moveaxis(a, 0, 1).reshape(FP_LIMBS, n_windows * c, r)

    return _horner_2k(G1Jac(to_terms(sx), to_terms(sy), to_terms(sz)))


@jax.jit
def msm_naive(points: G1Aff, scalars) -> G1Jac:
    """Reference-shaped fallback for tiny n: batched double-and-add over all
    256 scalar bits, then a tree reduction.  O(256) batched point ops.

    Mirrors the semantics checked by manual_commit_test (reference
    src/engine/piano.rs:1415-1459)."""
    n = points.x.shape[-1]
    base = cv.from_affine(points)
    acc = cv.jac_identity((n,))

    def body(i, state):
        acc, base = state
        limb = i // LIMB_BITS
        off = i % LIMB_BITS
        bit = ((scalars[limb] >> off) & 1).astype(bool)
        added = cv.add_fast(acc, base)
        acc = G1Jac(
            FP.select(bit, added.x, acc.x),
            FP.select(bit, added.y, acc.y),
            FP.select(bit, added.z, acc.z),
        )
        return acc, cv.dbl_fast(base)

    acc, _ = jax.lax.fori_loop(0, FR_LIMBS * LIMB_BITS, body, (acc, base))
    out = cv.tree_sum_fast(acc)
    return G1Jac(out.x[..., 0], out.y[..., 0], out.z[..., 0])


# ---------------------------------------------------------------------------
# Fixed-base MSM (trusted-setup generation): one base, many scalars
# ---------------------------------------------------------------------------

_FB_TABLES: dict[tuple, G1Aff] = {}


def fixed_base_table(base_point, c: int = 8) -> G1Aff:
    """Affine table T[w*2^c + d] = (d << (c*w)) * base, built host-side once.

    The analog of the reference's BGMW precomputation tables
    (kzg::msm::precompute, reference src/engine/piano.rs:469-515): windowed
    multiples of a fixed base traded for doublings at commit time.
    """
    from ..refimpl.curve import g1_add, g1_mul

    key = (base_point, c)
    if key in _FB_TABLES:
        return _FB_TABLES[key]
    n_windows = -(-256 // c)
    rows = []
    for w in range(n_windows):
        step = g1_mul(base_point, 1 << (c * w))
        entry = None
        for _ in range(1 << c):
            rows.append(entry)
            entry = g1_add(entry, step)
    table = cv.affine_from_ints(rows)
    _FB_TABLES[key] = table
    return table


def fixed_base_msm(base_point, scalars, c: int = 8) -> G1Jac:
    """[d_i * base for each scalar d_i] — returns a Jacobian *batch* [L, n].

    Used for trusted-setup power generation (g^{tau^j}, the U matrix), where
    the reference does per-element blst scalar muls under rayon
    (reference src/engine/piano.rs:916-1007).
    """
    table = fixed_base_table(base_point, c)
    return _fixed_base_apply(table, scalars, c)


@partial(jax.jit, static_argnums=(2,))
def _fixed_base_apply(table: G1Aff, scalars, c: int) -> G1Jac:
    n = scalars.shape[-1]
    n_windows = -(-256 // c)
    digits_all = _all_window_digits(scalars, c, n_windows)  # [W, n]
    offsets = (np.arange(n_windows, dtype=np.int32) * (1 << c))[:, None]
    idx_all = digits_all + offsets

    def step(acc, idx):
        q = G1Aff(
            jnp.take(table.x, idx, axis=-1),
            jnp.take(table.y, idx, axis=-1),
            table.inf[idx],
        )
        return cv.madd_fast(acc, q), None

    acc, _ = jax.lax.scan(step, cv.jac_identity((n,)), idx_all)
    return acc


# ---------------------------------------------------------------------------
# BGMW-expanded tables for *arbitrary-scalar* MSM over fixed bases
# ---------------------------------------------------------------------------

def bgmw_expand(points: G1Aff, c: int) -> G1Aff:
    """Expand fixed bases into the BGMW window table
    T[w*n + j] = (2^{c*w}) * P_j.

    The TPU analog of the reference's PrecomputationTable generation
    (kzg::msm::precompute behind reference src/engine/piano.rs:477-504):
    space traded so the per-commit MSM needs a single bucket-accumulation
    pass with no inter-window doublings and ONE bucket reduction.

    Window-by-window at the Python level (affine-converted as we go) so
    peak device memory is the affine table plus one transient Jacobian
    batch — a single stacked scan at production sizes OOMs the device.
    """
    n_windows = -(-256 // c)
    jac = cv.from_affine(points)
    xs, ys, infs = [], [], []
    for w in range(n_windows):
        aff = cv.to_affine_batched(jac)
        xs.append(aff.x)
        ys.append(aff.y)
        infs.append(aff.inf)
        if w + 1 < n_windows:
            jac = _dbl_n(jac, c)
    return G1Aff(
        jnp.concatenate(xs, axis=-1),
        jnp.concatenate(ys, axis=-1),
        jnp.concatenate(infs, axis=-1),
    )


@partial(jax.jit, static_argnums=(1,))
def _dbl_n(p: G1Jac, c: int) -> G1Jac:
    return jax.lax.fori_loop(0, c, lambda _, a: cv.dbl_fast(a), p)


@partial(jax.jit, static_argnums=(2,))
def msm_bgmw(table: G1Aff, scalars, c: int) -> G1Jac:
    """MSM using a bgmw_expand table: one bucket accumulation over all
    W*n (window, point) pairs, one bucket reduction, zero doublings."""
    n = scalars.shape[-1]
    n_windows = table.x.shape[-1] // n
    digits = _all_window_digits(scalars, c, n_windows).reshape(-1)  # [W*n]
    return bgmw_from_digits(table, digits, c)


@partial(jax.jit, static_argnums=(2,))
def bgmw_from_digits(table: G1Aff, digits_flat, c: int) -> G1Jac:
    """msm_bgmw body over pre-extracted digits (the jnp twin of
    ops.msm_fused.bgmw_from_digits, used by the mesh-sharded caller on
    backends without Pallas)."""
    buckets = _bucket_accumulate(table, digits_flat, 1 << c)
    s = _bit_partial_sums(buckets, c)  # [L, c, R]
    return _horner_2k(s)
