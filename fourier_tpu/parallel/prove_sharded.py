"""The full distributed prove round as ONE jitted step over a device mesh.

This is the framework's "training step" analog: what the reference does
with M RPC servers plus a client shuttling base64 over HTTP
(worker commit/open on every machine, then master aggregation —
SURVEY.md §2d item 1, reference src/engine/piano.rs:143-298) runs here
as a single SPMD program:

  mesh axis "workers": each slot owns M/ndev rows of the witness and the
  matching U-matrix shard, computes its commits and evaluation-form
  opening proofs locally, then the 48-byte-scale per-worker results are
  all-gathered over ICI and the master aggregation (point sums, size-M
  INTT, quotient by (Y - beta), g_tau_y MSM) is computed replicated on
  every slot.

Per-round communication is O(M) points/scalars — identical to the wire
traffic of the reference's HTTP hop, but at ICI latency.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..constants import FR_LIMBS, R
from ..ops import curve as cv
from ..ops import msm as msm_mod
from ..ops.curve import G1Aff, G1Jac
from ..ops.field import FR
from ..ops.limbs import ints_to_vec


def _tree_sum_points(p: G1Jac) -> G1Jac:
    n = p.x.shape[-1]
    pow2 = 1 << (n - 1).bit_length() if n > 1 else 1
    if pow2 != n:
        pad = cv.jac_identity((pow2 - n,))
        p = G1Jac(
            jnp.concatenate([p.x, pad.x], -1),
            jnp.concatenate([p.y, pad.y], -1),
            jnp.concatenate([p.z, pad.z], -1),
        )
    out = cv.tree_sum(p)
    return G1Jac(out.x[..., 0], out.y[..., 0], out.z[..., 0])


def _horner_eval(coeffs_m, x_m):
    """Horner over the minor axis (small M): coeffs [L, M], x [L, 1]."""
    seq = jnp.moveaxis(coeffs_m[..., ::-1], -1, 0)  # [M, L, 1]... -> scan

    def step(acc, c):
        return FR.add(FR.mul(acc, x_m), c[..., None]), None

    init = jnp.zeros_like(x_m)
    out, _ = jax.lax.scan(step, init, seq)
    return out  # [L, 1]


def _div_linear(coeffs_m, x_m):
    """Synthetic division: (f - f(x)) / (Y - x) for [L, M] coeffs.

    Returns [L, M-1] quotient coefficients (standard basis).
    """
    m = coeffs_m.shape[-1]
    seq = jnp.moveaxis(coeffs_m[..., ::-1], -1, 0)[:-1]  # c_{M-1} .. c_1

    def step(acc, c):
        acc = FR.add(c[..., None], FR.mul(x_m, acc))
        return acc, acc[..., 0]

    init = jnp.zeros_like(x_m)
    _, qs = jax.lax.scan(step, init, seq)  # q_{M-2} .. q_0
    return jnp.moveaxis(qs, 0, -1)[..., ::-1]  # [L, M-1], ascending


def prove_in_specs(axis: str = "workers", table_c: int | None = None):
    """PartitionSpecs for build_distributed_prove's arguments, in order.

    Exported so multi-host drivers (parallel.multihost) can construct
    identically-sharded global arrays from process-local data.  With
    table_c set, three extra args carry the per-worker BGMW-expanded U
    tables (x, y, inf), sharded on the worker axis like U itself."""
    base = (
        P(None, axis, None), P(None, axis, None), P(axis, None),  # U shard
        P(None, None), P(None, None), P(None),                     # g_tau_y
        P(None, axis, None),                                       # coeffs
        P(None, None), P(None, None),                              # alpha, beta
        P(None, None), P(None, None),                              # roots
        P(None, None),                                             # t_inv
    )
    if table_c is None:
        return base
    return base + (
        P(None, axis, None), P(None, axis, None), P(axis, None),  # U tables
    )


def build_distributed_prove(mesh: Mesh, axis: str = "workers",
                            table_c: int | None = None):
    """Returns a jitted SPMD function

        prove(u_x, u_y, u_inf, g_ty_x, g_ty_y, g_ty_inf,
              coeffs, alpha, beta, left_roots_mont, right_roots_mont
              [, ut_x, ut_y, ut_inf])
        -> (master_commit, z, pi0, pi1, commits, evals, proofs)

    with the worker axis (M) of `u_*` and `coeffs` sharded over the mesh.
    alpha/beta are canonical [FR_LIMBS, 1]; coeffs canonical [FR_LIMBS, M, T].
    Assumes alpha is outside the left evaluation domain (the RPC path
    handles the in-domain fallback host-side).

    With `table_c` set, the per-worker commit/open MSMs run over
    BGMW-expanded U tables (the reference's precompute path,
    src/engine/piano.rs:150 with Some(table)) passed as three extra
    worker-sharded args: shared buckets, one reduction, no inter-window
    doublings — the same kernel economics as the RPC path's tables.
    """

    def _local_open(f_mont, roots, alpha_mont, t_inv_mont):
        """Eval-form open for all local workers at once.
        f_mont [L, Mloc, T]; roots [L, T]; returns y [L, Mloc], qhat [L, Mloc, T]."""
        diffs = FR.sub(alpha_mont[..., None], roots[:, None, :])  # [L, 1->Mloc?, T]
        diffs = jnp.broadcast_to(diffs, f_mont.shape)
        invd = FR.batch_inv(diffs[:, :1, :])    # same for all workers: [L, 1, T]
        t = f_mont.shape[-1]
        alpha_t = FR.pow_const(alpha_mont, t)   # [L, 1]
        one = FR.broadcast_const(FR.one_mont, (1,))
        factor = FR.mul(FR.sub(alpha_t, one), t_inv_mont)  # [L, 1]
        terms = FR.mul(FR.mul(f_mont, roots[:, None, :]), invd)
        s = terms
        while s.shape[-1] > 1:
            h = s.shape[-1] // 2
            s = FR.add(s[..., :h], s[..., h:])
        y = FR.mul(factor[..., None], s)[..., 0]           # [L, Mloc]
        qhat = FR.mul(FR.sub(y[..., None], f_mont), invd)  # [L, Mloc, T]
        return y, qhat

    def _vmsm(points: G1Aff, scalars):
        """Per-worker MSM, vmapped over the local worker axis."""
        fn = msm_mod.msm_naive if points.x.shape[-1] <= 64 else (
            lambda p, s: msm_mod.msm(p, s)
        )
        return jax.vmap(fn, in_axes=(G1Aff(1, 1, 0), 1), out_axes=1)(
            points, scalars
        )

    def _vmsm_table(tables: G1Aff, scalars):
        """Per-worker BGMW-table MSM, vmapped over the local worker axis."""
        fn = lambda t, s: msm_mod.msm_bgmw(t, s, table_c)
        return jax.vmap(fn, in_axes=(G1Aff(1, 1, 0), 1), out_axes=1)(
            tables, scalars
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=prove_in_specs(axis, table_c),
        out_specs={
            "master_com": (P(None), P(None), P(None)),
            "z": P(None),
            "pi0": (P(None), P(None), P(None)),
            "pi1": (P(None), P(None), P(None)),
            "commits": (P(None, axis), P(None, axis), P(None, axis)),
            "evals": P(None, axis),
            "proofs": (P(None, axis), P(None, axis), P(None, axis)),
        },
        check_vma=False,
    )
    def prove(u_x, u_y, u_inf, gty_x, gty_y, gty_inf, coeffs, alpha, beta,
              left_roots, right_roots, t_inv, *ut):
        u_local = G1Aff(u_x, u_y, u_inf)
        f_mont = FR.to_mont(coeffs)
        alpha_mont = FR.to_mont(alpha)
        beta_mont = FR.to_mont(beta)

        if table_c is not None:
            msm_local = lambda sc: _vmsm_table(G1Aff(*ut), sc)
        else:
            msm_local = lambda sc: _vmsm(u_local, sc)

        # worker commits: per-row MSM over the local U shard
        commits = msm_local(coeffs)                            # [L, Mloc]

        # worker opens (evaluation form)
        y_mont, qhat_mont = _local_open(f_mont, left_roots, alpha_mont, t_inv)
        proofs = msm_local(FR.from_mont(qhat_mont))            # [L, Mloc]

        # gather per-worker results (tiny: M points + M scalars over ICI)
        commits_all = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis, axis=a.ndim - 1, tiled=True),
            commits,
        )
        proofs_all = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis, axis=a.ndim - 1, tiled=True),
            proofs,
        )
        y_all = jax.lax.all_gather(y_mont, axis, axis=y_mont.ndim - 1, tiled=True)

        # master: aggregate commitments and pi0
        master_com = _tree_sum_points(commits_all)
        pi0 = _tree_sum_points(proofs_all)

        # master open along Y: INTT (size M), eval, quotient, g_tau_y MSM
        from ..ops.ntt import get_domain

        m_scale = int(y_all.shape[-1]).bit_length() - 1
        dom = get_domain(m_scale)
        coeffs_y = dom.ntt(y_all, inverse=True)                # [L, M] standard
        z_mont = _horner_eval(coeffs_y, beta_mont)             # [L, 1]
        q = _div_linear(coeffs_y, beta_mont)                   # [L, M-1]
        q_pad = jnp.concatenate(
            [q, jnp.zeros_like(q[..., :1])], axis=-1
        )                                                      # [L, M]
        gty = G1Aff(gty_x, gty_y, gty_inf)
        pi1 = msm_mod.msm_naive(gty, FR.from_mont(q_pad))

        expand = lambda p: (p.x[..., None], p.y[..., None], p.z[..., None])
        return {
            "master_com": expand(master_com),
            "z": FR.from_mont(z_mont),
            "pi0": expand(pi0),
            "pi1": expand(pi1),
            "commits": (commits.x, commits.y, commits.z),
            "evals": FR.from_mont(y_mont),
            "proofs": (proofs.x, proofs.y, proofs.z),
        }

    return jax.jit(prove)


def prove_inputs_from_backend(backend, rows, alpha: int, beta: int,
                              table_c: int | None = None):
    """Host helper: marshal backend state + witness rows into prove() args.

    With table_c set, the per-worker BGMW-expanded U tables are appended
    (built fresh, or reused from the backend's precompute when its window
    matches)."""
    s = backend.settings
    fft = backend.fft
    coeffs = jnp.asarray(
        ints_to_vec([v for row in rows for v in row], FR_LIMBS)
    ).reshape(FR_LIMBS, fft.M, fft.T)
    gty = s.g_tau_y
    t_inv = jnp.asarray(
        ints_to_vec([pow(fft.T, -1, R) * FR.mont_r % R], FR_LIMBS)
    )
    right_roots = jnp.asarray(
        ints_to_vec([v * FR.mont_r % R for v in fft.right_roots], FR_LIMBS)
    )
    args = (
        s.u.x, s.u.y, s.u.inf,
        gty.x, gty.y, gty.inf,
        coeffs,
        jnp.asarray(ints_to_vec([alpha], FR_LIMBS)),
        jnp.asarray(ints_to_vec([beta], FR_LIMBS)),
        fft.left_roots_mont(),
        right_roots,
        t_inv,
    )
    if table_c is None:
        return args

    pc = s.precompute
    tables = []
    for i in range(fft.M):
        row = None
        if pc is not None and pc.c == table_c and i < len(pc.u_rows):
            row = pc.u_rows[i]
        if row is None:
            row = msm_mod.bgmw_expand(s.u_row(i), table_c)
        tables.append(row)
    ut = G1Aff(
        jnp.stack([t.x for t in tables], axis=1),   # [L, M, W*T]
        jnp.stack([t.y for t in tables], axis=1),
        jnp.stack([t.inf for t in tables], axis=0),  # [M, W*T]
    )
    return args + (ut.x, ut.y, ut.inf)
