"""The PIANO/Pianist bivariate KZG protocol, TPU-first.

Same behavior and roles as the reference's PianoBackend
(src/engine/piano.rs:26-465): a degree-N polynomial is split into M=2^m
rows of T=2^t Lagrange coefficients; worker i commits/opens its row, the
master aggregates.  Two deliberate TPU-native re-designs:

1. **Evaluation-form opening.**  The reference opens by IFFT -> Horner
   eval -> polynomial long division -> FFT (src/engine/piano.rs:187-238),
   a chain of serial dependency.  We compute the identical quotient
   directly in the Lagrange/evaluation domain:
       y      = f(alpha)            (barycentric formula)
       q(w^j) = (f_j - y) / (w^j - alpha)
   which is bit-identical to the reference's proof (same polynomial,
   same basis) but embarrassingly parallel: one batched Fermat inversion
   plus vector ops, then the MSM.  A coefficient-basis fallback handles
   the measure-zero case alpha in domain.

2. **Device-resident SRS.**  The U matrix and tau powers live on device
   as affine Montgomery limb arrays, ready for the Pippenger MSM kernel;
   the (tiny, O(1)-per-request) pairing verifications run host-side via
   the exact ground-truth implementation, mirroring the reference's CPU
   blst verify path (src/engine/piano.rs:309-464).
"""

from __future__ import annotations

import logging
import os
import secrets as py_secrets
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FR_LIMBS, R, root_of_unity
from ..ops import curve as cv
from ..ops import msm as msm_mod
from ..ops.curve import G1Aff, G1Jac
from ..ops.field import FR
from ..ops.limbs import (
    bytes_be_to_limbs,
    int_to_vec,
    ints_to_vec,
    vec_to_int,
    vec_to_ints,
)
from ..ops.ntt import get_domain
from ..refimpl import curve as rc
from ..refimpl import pairing as rp
from ..refimpl import poly as rpoly
from ..refimpl.field import hash_to_bls_field
from ..utils.timing import timed

logger = logging.getLogger("fourier_tpu")


# ---------------------------------------------------------------------------
# Config (mirrors reference src/engine/config.rs semantics)
# ---------------------------------------------------------------------------

@dataclass
class SetupConfig:
    """Key rule preserved from the reference (config.rs:174-200): an omitted
    setup/precompute path means "generate fresh in memory"."""

    scale: int = 20
    machines_scale: int = 1
    setup_path: str | None = None
    precompute_path: str | None = None
    compressed: bool = True
    generate_setup: bool = True
    generate_precompute: bool = True
    overwrite: bool = False


# ---------------------------------------------------------------------------
# FFT settings (reference PianoFFTSettings, src/engine/piano.rs:1039-1136)
# ---------------------------------------------------------------------------

class PianoFFTSettings:
    """Two radix-2 domains: `left` of size T=2^(n-m) (X), `right` of size
    M=2^m (Y)."""

    def __init__(self, n: int, m: int):
        if m > n:
            raise ValueError("m must be less than or equal to n")
        self.n = n
        self.m = m
        self.t = n - m
        self.left = get_domain(self.t)
        self.right = get_domain(self.m)
        self.T = 1 << self.t
        self.M = 1 << self.m
        # host-side root powers (also used for barycentric evaluation)
        self.left_roots = self._powers(root_of_unity(self.t), self.T)
        self.right_roots = self._powers(root_of_unity(self.m), self.M)
        self._left_roots_mont_dev = None

    @staticmethod
    def _powers(w: int, n: int) -> list[int]:
        out = [1] * n
        for i in range(1, n):
            out[i] = out[i - 1] * w % R
        return out

    def left_roots_mont(self):
        """[FR_LIMBS, T] Montgomery device array of the left domain points."""
        if self._left_roots_mont_dev is None:
            self._left_roots_mont_dev = jnp.asarray(
                ints_to_vec([v * FR.mont_r % R for v in self.left_roots], FR_LIMBS)
            )
        return self._left_roots_mont_dev

    def fft(self, values: list[int], left: bool, inverse: bool) -> list[int]:
        """Zero-padding host-level NTT (fft_fr semantics: inputs shorter than
        the domain are padded, reference src/engine/piano.rs:1095-1103)."""
        if len(values) > (self.left if left else self.right).n:
            raise ValueError(
                f"input length {len(values)} exceeds domain"
            )
        out = self.fft_limbs(ints_to_vec(values, FR_LIMBS), left, inverse)
        return vec_to_ints(out)

    def fft_limbs(self, limbs, left: bool, inverse: bool) -> np.ndarray:
        """NTT over canonical [FR_LIMBS, n] limb arrays without any Python
        int round-trip: zero-pad to the domain, Montgomery in/out on device,
        return canonical [FR_LIMBS, domain] numpy limbs.

        The wire fast path behind the `fft` RPC method (a first-class wire
        method at production sizes, reference src/rpc.rs:338-359): at
        T=2^19 the per-value Python conversion alone costs seconds; this
        path is one device dispatch plus vectorized byte marshalling.
        """
        dom = self.left if left else self.right
        n = dom.n
        limbs = np.asarray(limbs)
        if limbs.shape[-1] > n:
            raise ValueError(
                f"input length {limbs.shape[-1]} exceeds domain {n}"
            )
        if limbs.shape[-1] < n:
            pad = np.zeros(limbs.shape[:-1] + (n - limbs.shape[-1],), np.uint32)
            limbs = np.concatenate([limbs, pad], axis=-1)
        x = FR.to_mont(jnp.asarray(limbs))
        return np.asarray(FR.from_mont(dom.ntt(x, inverse=inverse)))

    def fft_left(self, values, inverse: bool) -> list[int]:
        return self.fft(values, True, inverse)

    def fft_right(self, values, inverse: bool) -> list[int]:
        return self.fft(values, False, inverse)

    def left_lagrange_poly(self, j: int) -> list[int]:
        return rpoly.lagrange_poly(j, self.t)

    def right_lagrange_poly(self, i: int) -> list[int]:
        return rpoly.lagrange_poly(i, self.m)


# ---------------------------------------------------------------------------
# SRS + precompute
# ---------------------------------------------------------------------------

@dataclass
class PianoSettings:
    """SRS layout mirrors reference PianoSettings (src/engine/piano.rs:587-598):
    g, g^{tau_X^j} (j<T, kept for file parity; unused by the protocol),
    g^{tau_Y^i} (i<M), the MxT U matrix, and the G2 side."""

    g: tuple                      # refimpl G1 point
    g_tau_x: G1Aff                # [L, T] device affine (Montgomery)
    g_tau_y: G1Aff                # [L, M]
    u: G1Aff                      # [L, M, T]
    g2: tuple                     # refimpl G2 points
    g2_tau_x: tuple
    g2_tau_y: tuple
    g_tau_y_host: list = field(default_factory=list)  # small, host ints
    precompute: "PianoPrecompute | None" = None

    def u_row(self, i: int) -> G1Aff:
        return G1Aff(self.u.x[:, i], self.u.y[:, i], self.u.inf[i])


@dataclass
class PianoPrecompute:
    """BGMW-style window tables (analog of kzg::msm::precompute tables used
    at reference src/engine/piano.rs:150,157,294).

    On TPU backends the tables feed the shared-bucket fused MSM
    (ops.msm_fused.msm_fused_bgmw): all W*n (window, point) pairs of an
    expanded table accumulate into ONE set of 2^c buckets, cutting both
    the window count (c=16 -> 16 windows vs 20 tableless) and the bucket
    reduction (one instead of W).  Measured at T=2^19 on one v5e chip:
    309k pts/s tabled vs 247k tableless.  The packed word form the
    kernel consumes is derived lazily per table and cached."""

    c: int
    g1_tau_y: G1Aff | None        # [L, W*M]
    u_rows: list                   # per-row G1Aff [L, W*T] or None
    _packed: dict = field(default_factory=dict, repr=False)

    # Memory guard: a table is W*n points x 96 B (e.g. 1.6 GB for the
    # whole U matrix at scale 20).  Beyond this many points per table the
    # row falls back to the tableless kernel rather than risk HBM.
    MAX_TABLE_POINTS = 1 << 25

    @staticmethod
    def window_for(n: int) -> int:
        """Table window: balance accumulation adds against the bucket
        reduction (ops.msm_fused.bgmw_auto_window); tiny rows keep a
        small window so 2^c cannot dwarf the row.  When the MSM will be
        sharded over local chips, the window follows the per-topology
        cost model (bgmw_auto_window's shards arg — tables are built
        for the serving topology, like the reference builds its
        precompute for its CPU's layout)."""
        from ..ops import msm_fused as mf

        if n < (1 << 12):
            return 8
        mesh = _sharding_mesh()
        shards = mesh.shape["chips"] if mesh is not None else 1
        return mf.bgmw_auto_window(n, shards=shards)

    @staticmethod
    def generate(settings: PianoSettings, c: int | None = None) -> "PianoPrecompute":
        t_len = settings.u.x.shape[2]
        c = c or PianoPrecompute.window_for(t_len)

        def expand(points: G1Aff):
            n = points.x.shape[-1]
            n_windows = -(-256 // c)
            if n * n_windows > PianoPrecompute.MAX_TABLE_POINTS:
                logger.warning(
                    "precompute: table of %d points (%d windows x %d) exceeds "
                    "MAX_TABLE_POINTS=%d; this row will serve TABLELESS",
                    n * n_windows, n_windows, n,
                    PianoPrecompute.MAX_TABLE_POINTS,
                )
                return None
            return msm_mod.bgmw_expand(points, c)

        g1_tau_y = expand(settings.g_tau_y)
        m = settings.u.x.shape[1]
        u_rows = [expand(settings.u_row(i)) for i in range(m)]
        return PianoPrecompute(c=c, g1_tau_y=g1_tau_y, u_rows=u_rows)

    def packed_for(self, key, table: G1Aff):
        """Packed word form of a table (ops.msm_fused.pack_points), cached
        per table so serving pays the interleave once."""
        if key not in self._packed:
            from ..ops import msm_fused as mf

            self._packed[key] = mf.pack_points(table)
        return self._packed[key]


_SHARD_MESH = None

# Process-level cache of AOT-loaded/compiled executables for the serving
# path (keyed by program name + dynamic arg shapes).  On TPU the first
# result of a cold jitted MSM costs trace + Mosaic lowering + XLA compile
# + upload (~3 min at scale 20 — tools/SCALE20_RUN.log round 4); routing
# the hot programs through runtime.aot's serialized executables makes a
# warm server boot reach its first workerCommit in seconds.  The analog
# of the reference paying its compile once in `cargo build --release`
# (reference .github/workflows/ci.yml:54-58).
_EXE_CACHE: dict = {}


def _aot_enabled() -> bool:
    from ..ops import pallas_curve as pcv

    return pcv.enabled() and os.environ.get("FOURIER_AOT", "1") != "0"


def _exe_key(name: str, dyn_args, key: str):
    leaves = jax.tree_util.tree_leaves(dyn_args)
    return (name, tuple((tuple(a.shape), str(a.dtype)) for a in leaves), key)


def _aot_get(name: str, fn, dyn_args, static_args=(), key: str = ""):
    """Loaded-or-built executable for fn at dyn_args' shapes, memoized in
    process; None when AOT is disabled or serialization unsupported."""
    if not _aot_enabled():
        return None
    k = _exe_key(name, dyn_args, key)
    if k not in _EXE_CACHE:
        from ..runtime import aot

        _EXE_CACHE[k] = aot.get_or_build(
            name, fn, dyn_args, extra_key=key,
            lower_args=(*dyn_args, *static_args))
    return _EXE_CACHE[k]


def _aot_dispatch(name: str, fn, dyn_args, static_args=(), key: str = ""):
    """Call fn through the AOT executable cache (TPU serving path); fall
    back to the plain jitted call when AOT is unavailable."""
    exe = _aot_get(name, fn, dyn_args, static_args, key)
    if exe is None:
        return fn(*dyn_args, *static_args)
    return exe(*dyn_args)


def _sharding_mesh():
    """1-D mesh over the local devices for intra-worker MSM sharding, or
    None on a single device (or with FOURIER_SHARD_MSM=0).

    The TPU analog of the reference's rayon-parallel MSM inside one
    machine (reference Cargo.toml:11-12 `parallel` feature): one
    worker's MSM fans out over all local chips."""
    global _SHARD_MESH
    if os.environ.get("FOURIER_SHARD_MSM", "1") == "0":
        return None
    if _SHARD_MESH is None:
        from ..parallel.msm_fused_sharded import local_mesh

        _SHARD_MESH = local_mesh() or False
    return _SHARD_MESH or None


def _msm_dispatch(points: G1Aff, scalars, table: G1Aff | None, c: int,
                  packed=None):
    """MSM with optional BGMW table; small sizes take the naive batched
    path; on multi-device hosts the point/table axis is sharded across
    the local mesh (parallel.msm_fused_sharded)."""
    from ..ops import pallas_curve as pcv

    n = points.x.shape[-1]
    # Auto-sharding only on Pallas-enabled (TPU) backends: on the CPU
    # suite's virtual mesh the jnp shard_map programs compile
    # pathologically; the sharded jnp variant stays available to
    # explicit callers (tests, dryrun_multichip).
    mesh = _sharding_mesh() if pcv.enabled() else None
    if table is not None:
        wn = table.x.shape[-1]
        if pcv.enabled():
            from ..ops import msm_fused as mf

            pk = packed if packed is not None else mf.pack_points(table)
            if mesh is not None and wn % mesh.shape["chips"] == 0:
                from ..parallel.msm_fused_sharded import msm_fused_bgmw_sharded

                return msm_fused_bgmw_sharded(pk, table.inf, scalars, c, mesh)
            # artifact name matches bench.py's so bench and serving share
            # warm executables for the same shapes
            return _aot_dispatch(f"msm_bgmw_s{(n - 1).bit_length()}",
                                 mf.msm_fused_bgmw,
                                 (pk, table.inf, scalars), (c,), key=f"c{c}")
        return msm_mod.msm_bgmw(table, scalars, c)
    if n <= 64:
        return msm_mod.msm_naive(points, scalars)
    if mesh is not None and n % mesh.shape["chips"] == 0:
        from ..ops.msm import _auto_window
        from ..parallel.msm_fused_sharded import msm_fused_sharded

        return msm_fused_sharded(points, scalars,
                                 _auto_window(n // mesh.shape["chips"]), mesh)
    if pcv.enabled():
        return _aot_dispatch(f"msm_s{(n - 1).bit_length()}", msm_mod.msm,
                             (points, scalars), (0,), key="c0")
    return msm_mod.msm(points, scalars)


# ---------------------------------------------------------------------------
# Trusted setup generation (reference generate_trusted_setup,
# src/engine/piano.rs:883-1037)
# ---------------------------------------------------------------------------

def _batch_inverse_host(values: list[int]) -> list[int]:
    """Montgomery batch inversion over Python ints (one pow, 3n muls)."""
    n = len(values)
    prefix = [1] * (n + 1)
    for i, v in enumerate(values):
        prefix[i + 1] = prefix[i] * v % R
    inv_all = pow(prefix[n], -1, R)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % R
        inv_all = inv_all * values[i] % R
    return out


def _lagrange_evals_at(tau: int, roots: list[int]) -> list[int]:
    """L_j(tau) for all j via the barycentric formula:
    L_j(tau) = (w^j / n) * (tau^n - 1) / (tau - w^j)."""
    n = len(roots)
    if tau in set(roots):
        k = roots.index(tau)
        return [1 if j == k else 0 for j in range(n)]
    n_inv = pow(n, -1, R)
    tau_n = pow(tau, n, R) - 1
    diffs = [(tau - wj) % R for wj in roots]
    invs = _batch_inverse_host(diffs)
    return [wj * n_inv % R * tau_n % R * inv % R for wj, inv in zip(roots, invs)]


def generate_trusted_setup(
    fft: PianoFFTSettings, secrets: tuple[bytes, bytes]
) -> PianoSettings:
    tau_x = hash_to_bls_field(secrets[0])
    tau_y = hash_to_bls_field(secrets[1])
    T, M = fft.T, fft.M

    logger.debug("setup: tau powers on host")
    powers_x = fft._powers(tau_x, T)
    powers_y = fft._powers(tau_y, M)

    logger.debug("setup: Lagrange evals R_i(tau_y), L_j(tau_x)")
    r_evals = _lagrange_evals_at(tau_y, fft.right_roots)
    l_evals = _lagrange_evals_at(tau_x, fft.left_roots)
    u_scalars = [r * l % R for r in r_evals for l in l_evals]  # M*T, row-major

    logger.debug("setup: fixed-base point generation on device")
    g = rc.G1_GEN

    def fb(scalars, label):
        """Chunked fixed-base generation: every chunk reuses ONE compiled
        shape (the tail zero-pads; 0*G is the identity and is sliced
        off), the affine conversion uses the chunked batch inversion,
        and progress is logged per chunk — the analog of the reference's
        percentage logging inside its setup loops
        (src/engine/piano.rs:919-965)."""
        chunk = 1 << 16
        n = len(scalars)
        if n <= chunk:
            sc = jnp.asarray(ints_to_vec(scalars, FR_LIMBS))
            return cv.to_affine_batched(msm_mod.fixed_base_msm(g, sc))
        xs, ys, infs = [], [], []
        for lo in range(0, n, chunk):
            part = scalars[lo : lo + chunk]
            if len(part) < chunk:
                part = list(part) + [0] * (chunk - len(part))
            sc = jnp.asarray(ints_to_vec(part, FR_LIMBS))
            aff = cv.to_affine_batched(msm_mod.fixed_base_msm(g, sc))
            keep = min(chunk, n - lo)
            xs.append(aff.x[..., :keep])
            ys.append(aff.y[..., :keep])
            infs.append(aff.inf[..., :keep])
            logger.info("setup %s: %d%% (%d/%d)", label,
                        (lo + keep) * 100 // n, lo + keep, n)
        return G1Aff(
            jnp.concatenate(xs, axis=-1),
            jnp.concatenate(ys, axis=-1),
            jnp.concatenate(infs, axis=-1),
        )

    g_tau_x = timed("g_tau_x powers", lambda: fb(powers_x, "g_tau_x"))
    g_tau_y = timed("g_tau_y powers", lambda: fb(powers_y, "g_tau_y"))
    u_flat = timed("U matrix", lambda: fb(u_scalars, "U matrix"))
    u = G1Aff(
        u_flat.x.reshape(u_flat.x.shape[0], M, T),
        u_flat.y.reshape(u_flat.y.shape[0], M, T),
        u_flat.inf.reshape(M, T),
    )

    logger.debug("setup: G2 side on host")
    g2_tau_x = rc.g2_mul(rc.G2_GEN, tau_x)
    g2_tau_y = rc.g2_mul(rc.G2_GEN, tau_y)

    return PianoSettings(
        g=g,
        g_tau_x=g_tau_x,
        g_tau_y=g_tau_y,
        u=u,
        g2=rc.G2_GEN,
        g2_tau_x=g2_tau_x,
        g2_tau_y=g2_tau_y,
        g_tau_y_host=_host_points(g_tau_y),
    )


def _host_points(points: G1Aff) -> list:
    return cv.jac_to_int_points(cv.from_affine(points))


# ---------------------------------------------------------------------------
# Evaluation-form opening kernel
# ---------------------------------------------------------------------------

@jax.jit
def _eval_form_open(roots_mont, f_mont, alpha_mont, t_inv_mont):
    """Given Lagrange values f_j on the domain and a point alpha (all
    Montgomery), return (y_mont [L,1], qhat_mont [L,T], any_zero_diff).

    y      = (alpha^T - 1)/T * sum_j f_j w^j / (alpha - w^j)
    q(w^j) = (y - f_j) / (alpha - w^j)
    """
    T = roots_mont.shape[-1]
    diffs = FR.sub(alpha_mont, roots_mont)                 # alpha - w^j
    any_zero = jnp.any(FR.is_zero(diffs))
    # chunked batch inversion: the per-lane Fermat chain costs ~500 muls
    # per lane and dominated worker_open at T=2^20 (~20 s of the 28 s)
    invd = FR.batch_inv(diffs)
    alpha_t = FR.pow_const(alpha_mont, T)                  # [L, 1]
    one = FR.broadcast_const(FR.one_mont, (1,))
    factor = FR.mul(FR.sub(alpha_t, one), t_inv_mont)      # (alpha^T - 1)/T
    terms = FR.mul(FR.mul(f_mont, roots_mont), invd)
    # tree-sum the T terms (T is a power of two)
    s = terms
    while s.shape[-1] > 1:
        h = s.shape[-1] // 2
        s = FR.add(s[..., :h], s[..., h:])
    y = FR.mul(factor, s)                                  # [L, 1]
    qhat = FR.mul(FR.sub(y, f_mont), invd)                 # [L, T]
    return y, qhat, any_zero


@jax.jit
def _poly_eval_device(f_mont, x_mont):
    """sum_i f_i x^i for [L, n] Montgomery coefficients, n a power of two.

    Powers of x by log-doubling (powers[0:m] * x^m extends the ladder to
    2m), one elementwise mul, then a binary-tree sum: ~3n mul/add lanes
    across O(log n) sequential batched steps."""
    n = f_mont.shape[-1]
    p = FR.broadcast_const(FR.one_mont, (1,))
    xk = x_mont
    while p.shape[-1] < n:
        p = jnp.concatenate([p, FR.mul(p, xk)], axis=-1)
        xk = FR.square(xk)
    terms = FR.mul(f_mont, p)
    while terms.shape[-1] > 1:
        h = terms.shape[-1] // 2
        terms = FR.add(terms[..., :h], terms[..., h:])
    return terms


# ---------------------------------------------------------------------------
# Backend
# ---------------------------------------------------------------------------

class PianoBackend:
    """Worker/master commit-open-verify engine (reference PianoBackend,
    src/engine/piano.rs:81-465).  Host-facing values are Python ints and
    refimpl affine points; row coefficient vectors are numpy/device
    uint32[FR_LIMBS, T] canonical limb arrays."""

    def __init__(self, fft: PianoFFTSettings, settings: PianoSettings):
        self.fft = fft
        self.settings = settings

    # -- utils (reference src/engine/piano.rs:35-79) -----------------------

    def random_bivariate_polynomial(self) -> list[list[int]]:
        return [
            [int.from_bytes(os.urandom(32), "big") % R for _ in range(self.fft.T)]
            for _ in range(self.fft.M)
        ]

    def random_bivariate_limbs(self) -> np.ndarray:
        """[M, FR_LIMBS, T] canonical limb rows of a random bivariate poly.

        Vectorized twin of random_bivariate_polynomial for the randomPoly
        RPC (reference src/rpc.rs:320-327): one urandom draw + one device
        mod-R reduction instead of M*T per-value Python reductions (2^20
        of them at the reference's default scale).  Same distribution:
        uniform 256-bit value mod R."""
        m, t = self.fft.M, self.fft.T
        raw = os.urandom(32 * m * t)
        limbs = bytes_be_to_limbs(raw, 32, FR_LIMBS)        # [m*t, L]
        # value mod R via a Montgomery round-trip: to_mont accepts any
        # 256-bit limb value (the product pass is exact and the reduction
        # lands < 2R), from_mont returns the canonical residue.
        red = np.asarray(FR.from_mont(FR.to_mont(jnp.asarray(limbs.T))))
        return red.reshape(FR_LIMBS, m, t).transpose(1, 0, 2)

    def random_point(self) -> int:
        return int.from_bytes(os.urandom(32), "big") % R

    def evaluate(self, coeffs: list[int], x: int) -> int:
        return rpoly.poly_eval(coeffs, x)

    def evaluate_limbs(self, limbs: np.ndarray, x: int) -> int:
        """f(x) over canonical [FR_LIMBS, n] coefficient limbs.

        Device path for the evaluate RPC (reference FsPoly::eval behind
        src/rpc.rs:338-347): an x-power ladder by log-doubling plus one
        elementwise mul and a binary-tree sum — O(log n) sequential
        batched device steps instead of an n-step host bigint Horner
        (seconds per call at T=2^19).  Small inputs stay on the host
        where dispatch would dominate."""
        limbs = np.asarray(limbs)
        n = limbs.shape[-1]
        if n == 0:
            return 0
        if n <= 2048:
            return rpoly.poly_eval(vec_to_ints(limbs), x)
        pow2 = 1 << (n - 1).bit_length()
        if n < pow2:  # zero coefficients contribute nothing
            pad = np.zeros((limbs.shape[0], pow2 - n), np.uint32)
            limbs = np.concatenate([limbs, pad], axis=-1)
        xm = FR.to_mont(jnp.asarray(int_to_vec(x, FR_LIMBS)))
        y_m = _poly_eval_device(FR.to_mont(jnp.asarray(limbs)), xm)
        return vec_to_int(FR.from_mont(y_m))

    # -- coefficients in/out -----------------------------------------------

    def _coeffs_to_device(self, coeffs) -> jax.Array:
        """Accept list[int] (zero-padded to T) or ready [FR_LIMBS, T] limbs."""
        if isinstance(coeffs, (list, tuple)):
            if len(coeffs) > self.fft.T:
                raise ValueError("polynomial larger than sub-circuit size")
            vals = list(coeffs) + [0] * (self.fft.T - len(coeffs))
            return jnp.asarray(ints_to_vec(vals, FR_LIMBS))
        return jnp.asarray(coeffs)

    # -- protocol: worker side ---------------------------------------------

    def worker_commit(self, i: int, coeffs):
        """MSM of the Lagrange coefficients against U row i
        (reference src/engine/piano.rs:143-161)."""
        if not 0 <= i < self.fft.M:
            raise ValueError(f"machine index {i} out of range")
        sc = self._coeffs_to_device(coeffs)
        table = self._u_table(i)
        out = _msm_dispatch(self.settings.u_row(i), sc, table, self._table_c(),
                            packed=self._u_packed(i, table))
        return cv.jac_to_int_points(_lift(out))[0]

    def worker_open(self, i: int, coeffs, alpha: int):
        """(f_i(alpha), pi_0^{(i)}) via the evaluation-form quotient
        (bit-identical to reference src/engine/piano.rs:187-238)."""
        if not 0 <= i < self.fft.M:
            raise ValueError(f"machine index {i} out of range")
        sc = self._coeffs_to_device(coeffs)
        f_mont = FR.to_mont(sc)
        alpha_mont = FR.to_mont(jnp.asarray(ints_to_vec([alpha], FR_LIMBS)))
        t_inv = jnp.asarray(
            ints_to_vec([pow(self.fft.T, -1, R) * FR.mont_r % R], FR_LIMBS)
        )
        y_m, qhat_m, any_zero = _aot_dispatch(
            f"eval_open_s{self.fft.t}", _eval_form_open,
            (self.fft.left_roots_mont(), f_mont, alpha_mont, t_inv),
        )
        if bool(any_zero):  # alpha hits the domain: coefficient-basis fallback
            return self._worker_open_coeff_fallback(i, sc, alpha)
        y = vec_to_int(FR.from_mont(y_m))
        qhat = FR.from_mont(qhat_m)
        table = self._u_table(i)
        pi = _msm_dispatch(self.settings.u_row(i), qhat, table, self._table_c(),
                           packed=self._u_packed(i, table))
        return y, cv.jac_to_int_points(_lift(pi))[0]

    def _worker_open_coeff_fallback(self, i: int, sc, alpha: int):
        coeff_ints = self.fft.fft_left(vec_to_ints(np.asarray(sc)), True)
        y = rpoly.poly_eval(coeff_ints, alpha)
        q = rpoly.poly_div_linear(coeff_ints, alpha)
        q_hat = self.fft.fft_left(q + [0] * (self.fft.T - len(q)), False)
        sc_q = jnp.asarray(ints_to_vec(q_hat, FR_LIMBS))
        table = self._u_table(i)
        pi = _msm_dispatch(self.settings.u_row(i), sc_q, table, self._table_c(),
                           packed=self._u_packed(i, table))
        return y, cv.jac_to_int_points(_lift(pi))[0]

    def worker_verify(self, i: int, commitment, alpha: int, y: int, pi) -> bool:
        """Pairing check e(com - g^{y'}, g2) == e(pi, g2^{tau_X - alpha})
        (reference src/engine/piano.rs:309-356); host-side, O(M) + pairings."""
        if not 0 <= i < self.fft.M:
            return False
        r_coeffs = self.fft.right_lagrange_poly(i)
        r_i_tau_y = rc.g1_msm_fast(self.settings.g_tau_y_host, r_coeffs)
        g_y_prime = rc.g1_mul_fast(r_i_tau_y, y)
        com_minus = rc.g1_sub_fast(commitment, g_y_prime)
        g2_tau_x_minus_alpha = rc.g2_sub_fast(
            self.settings.g2_tau_x, rc.g2_mul_fast(self.settings.g2, alpha)
        )
        return rp.pairings_verify_single(
            com_minus, self.settings.g2, pi, g2_tau_x_minus_alpha
        )

    # -- protocol: master side ---------------------------------------------

    def master_commit(self, commitments: list) -> object:
        """Plain G1 sum of worker commitments (the reference's ones-vector
        MSM, src/engine/piano.rs:164-175)."""
        return rc.g1_sum(commitments)

    def master_open(self, evals: list[int], proofs: list, beta: int):
        """(z, (pi_0, pi_1)) — aggregates proofs and opens along Y
        (reference src/engine/piano.rs:250-298).  M is small (2^m), so the
        Y-side IFFT/division runs host-side."""
        pi0 = rc.g1_sum(proofs)
        coeffs = rpoly.ntt(evals, self.fft.m, inverse=True)
        z = rpoly.poly_eval(coeffs, beta)
        q = rpoly.poly_div_linear(coeffs, beta)
        pi1 = rc.g1_msm_fast(self.settings.g_tau_y_host[: len(q)], q)
        return z, (pi0, pi1)

    def master_verify(self, commitment, beta: int, alpha: int, z: int, pi) -> bool:
        """e(com - g^z, g2) == e(pi0, g2^{tau_X}-alpha g2) * e(pi1, g2^{tau_Y}-beta g2)
        (reference src/engine/piano.rs:393-420)."""
        pi0, pi1 = pi
        com_minus_z = rc.g1_sub_fast(commitment, rc.g1_mul_fast(self.settings.g, z))
        g2 = self.settings.g2
        b12 = rc.g2_sub_fast(self.settings.g2_tau_x, rc.g2_mul_fast(g2, alpha))
        b22 = rc.g2_sub_fast(self.settings.g2_tau_y, rc.g2_mul_fast(g2, beta))
        return rp.pairings_verify(com_minus_z, g2, pi0, b12, pi1, b22)

    # -- precompute helpers ------------------------------------------------

    def _table_c(self) -> int:
        pc = self.settings.precompute
        return pc.c if pc is not None else 8

    def _u_table(self, i: int):
        pc = self.settings.precompute
        if pc is None or i >= len(pc.u_rows):
            return None
        return pc.u_rows[i]

    def _u_packed(self, i: int, table):
        if table is None:
            return None
        return self.settings.precompute.packed_for(("u", i), table)

    # -- serving warm-up ---------------------------------------------------

    def warm_executables(self) -> None:
        """Pre-build/load every serving-path device executable for this
        backend's (scale, mscale) so the FIRST production RPC is served
        warm: the commit/open MSM (AOT via runtime.aot — trace + Mosaic +
        XLA otherwise costs minutes at scale 20), the evaluation-form
        open, and the fft domains (jit + persistent XLA cache).  Also
        packs the BGMW tables so H2D and the interleave are off the
        first request.  No-op on non-TPU backends."""
        if not _aot_enabled():
            return
        import time as _time

        t0 = _time.perf_counter()
        t = self.fft.T
        logger.info("warming serving executables (T=%d, M=%d) ...",
                    t, self.fft.M)
        sc_aval = jax.ShapeDtypeStruct((FR_LIMBS, t), jnp.uint32)
        warmed = set()
        for i in range(self.fft.M):
            table = self._u_table(i)
            if table is not None:
                pk = self._u_packed(i, table)
                shape_key = (pk.shape, "bgmw")
                if shape_key in warmed:
                    continue
                warmed.add(shape_key)
                c = self._table_c()
                inf_aval = jax.ShapeDtypeStruct(table.inf.shape, jnp.bool_)
                from ..ops import msm_fused as mf

                _aot_get(f"msm_bgmw_s{(t - 1).bit_length()}",
                         mf.msm_fused_bgmw,
                         (pk, inf_aval, sc_aval), (c,), key=f"c{c}")
            else:
                shape_key = (t, "tableless")
                if shape_key in warmed:
                    continue
                warmed.add(shape_key)
                row = self.settings.u_row(i)
                aval = G1Aff(
                    jax.ShapeDtypeStruct(row.x.shape, jnp.uint32),
                    jax.ShapeDtypeStruct(row.y.shape, jnp.uint32),
                    jax.ShapeDtypeStruct(row.inf.shape, jnp.bool_),
                )
                _aot_get(f"msm_s{(t - 1).bit_length()}", msm_mod.msm,
                         (aval, sc_aval), (0,), key="c0")
        # eval-form open + the fft wire path: compile-cheap relative to
        # the MSM; triggering jit here stores them in the persistent XLA
        # cache and the in-process jit cache.
        fm = jax.ShapeDtypeStruct((FR_LIMBS, t), jnp.uint32)
        one = jax.ShapeDtypeStruct((FR_LIMBS, 1), jnp.uint32)
        _aot_get(f"eval_open_s{self.fft.t}", _eval_form_open,
                 (self.fft.left_roots_mont(), fm, one, one))
        zeros = np.zeros((FR_LIMBS, t), np.uint32)
        for inv in (False, True):
            self.fft.fft_limbs(zeros, True, inv)
        logger.info("serving executables warm in %.1fs",
                    _time.perf_counter() - t0)

    # -- construction ------------------------------------------------------

    @staticmethod
    def setup(cfg: SetupConfig) -> "PianoBackend":
        """Load-or-generate semantics of the reference (piano.rs:87-122)."""
        from ..runtime import io as rio

        fft = PianoFFTSettings(cfg.scale, cfg.machines_scale)
        if cfg.generate_setup:
            secrets = (py_secrets.token_bytes(32), py_secrets.token_bytes(32))
            settings = timed(
                "Generating Trusted Setup",
                lambda: generate_trusted_setup(fft, secrets),
            )
        else:
            settings = timed(
                "Reading trusted setup from file",
                lambda: rio.load_setup(cfg.setup_path, cfg.compressed),
            )
        if cfg.generate_precompute:
            settings.precompute = timed(
                "Generating Precomputations",
                lambda: PianoPrecompute.generate(settings),
            )
        else:
            settings.precompute = timed(
                "Loading Precomputations from file",
                lambda: rio.load_precompute(cfg.precompute_path),
            )
        return PianoBackend(fft, settings)

    @staticmethod
    def setup_and_save(cfg: SetupConfig) -> "PianoBackend":
        from ..runtime import io as rio

        backend = PianoBackend.setup(cfg)
        if cfg.setup_path:
            rio.save_setup(backend.settings, cfg.setup_path, cfg.compressed)
        if cfg.precompute_path:
            rio.save_precompute(backend.settings.precompute, cfg.precompute_path)
        return backend


def _lift(p: G1Jac) -> G1Jac:
    """batch-() point -> batch-(1,)"""
    return G1Jac(p.x[..., None], p.y[..., None], p.z[..., None])
