"""Minimal repro hunt: a 64-long incomplete-lazy madd chain vs ground truth.

bisect_skew E6 shows every 64-point slot sum is wrong while the 25-ish
chains of the uniform case are right.  This strips away the kernel and
the slab: just chain _madd_values_incomplete_lazy (plain jnp, wide
formulation on TPU) over P_0..P_63 and compare every intermediate prefix
against the analytic expectation.  Also chains the complete _madd_impl
as a control.

Run on the TPU host:  python tools/bisect_chain.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-t0:7.1f}s] {m}", file=sys.stderr, flush=True)


import numpy as np  # noqa: E402

SCALE = int(os.environ.get("V_SCALE", "12"))
N = 1 << SCALE
CACHE = os.path.expanduser("~/.cache/fourier_tpu_bench")
CHAIN = int(os.environ.get("V_CHAIN", "64"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fourier_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from fourier_tpu.constants import FP_LIMBS, R
    from fourier_tpu.ops import pallas_curve as pc
    from fourier_tpu.ops.curve import G1Aff, G1Jac, _madd_impl, to_affine
    from fourier_tpu.ops.field import FP
    from fourier_tpu.ops.limbs import int_to_limbs
    from fourier_tpu.refimpl import curve as rc

    with np.load(f"{CACHE}/points_host_{SCALE}.npz") as z:
        xs, ys = z["x"][:, :CHAIN], z["y"][:, :CHAIN]
    # host file stores canonical limbs; device wants Montgomery
    import jax.numpy as _jnp
    from fourier_tpu.ops.field import FP as _FP
    xs = np.asarray(_FP.to_mont(_jnp.asarray(xs)))
    ys = np.asarray(_FP.to_mont(_jnp.asarray(ys)))

    # analytic prefixes
    pow5 = [0] * (CHAIN + 1)
    a5, p5 = 0, 5
    for j in range(CHAIN):
        a5 = (a5 + p5) % R
        p5 = p5 * 5 % R
        pow5[j + 1] = a5
    exp = [rc.g1_mul_fast(rc.G1_GEN, pow5[k]) for k in range(1, CHAIN + 1)]

    # lazy incomplete chain, one lane, plain jnp (wide formulation on TPU)
    def chain_lazy(px_all, py_all):
        def step(carry, q):
            x1, y1, z1 = carry
            qx, qy = q
            rx, ry, rz, col = pc._madd_values_incomplete_lazy(
                FP, x1, y1, z1, qx, qy,
                jnp.zeros(x1.shape[1:], bool),
            )
            return (rx, ry, rz), ((rx, ry, rz), col)

        init = tuple(jnp.zeros((FP_LIMBS, 1), jnp.uint32) for _ in range(3))
        qx = jnp.moveaxis(px_all[:, :, None], 1, 0)  # [CHAIN, L, 1]
        qy = jnp.moveaxis(py_all[:, :, None], 1, 0)
        _, (states, cols) = jax.lax.scan(step, init, (qx, qy))
        return states, cols

    states, cols = jax.jit(chain_lazy)(jnp.asarray(xs), jnp.asarray(ys))
    # states are [CHAIN, L, 1]; canonicalize wants the limb axis leading
    sx = np.asarray(FP.canonicalize(jnp.moveaxis(states[0], 0, -1)))[..., 0, :]
    sy = np.asarray(FP.canonicalize(jnp.moveaxis(states[1], 0, -1)))[..., 0, :]
    sz = np.asarray(FP.canonicalize(jnp.moveaxis(states[2], 0, -1)))[..., 0, :]
    log(f"lazy chain done; collisions flagged: {np.asarray(cols).sum()}")

    first_bad = None
    for k in range(CHAIN):
        aff = to_affine(G1Jac(jnp.asarray(sx[:, k:k+1]),
                              jnp.asarray(sy[:, k:k+1]),
                              jnp.asarray(sz[:, k:k+1])))
        gx = np.asarray(FP.from_mont(aff.x)).ravel()
        gy = np.asarray(FP.from_mont(aff.y)).ravel()
        ex = int_to_limbs(exp[k][0], FP_LIMBS)
        ey = int_to_limbs(exp[k][1], FP_LIMBS)
        ok = np.array_equal(gx, ex) and np.array_equal(gy, ey)
        if not ok and first_bad is None:
            first_bad = k
            log(f"lazy chain: FIRST BAD prefix at k={k} "
                f"(prefix sum of P_0..P_{k})")
    if first_bad is None:
        log("lazy chain: all prefixes OK")

    # control: complete formula chain
    def chain_complete(px_all, py_all):
        def step(carry, q):
            p = G1Jac(*carry)
            qx, qy = q
            r = _madd_impl(FP, p, G1Aff(qx, qy,
                                        jnp.zeros(qx.shape[1:], bool)))
            return (r.x, r.y, r.z), (r.x, r.y, r.z)

        init = tuple(jnp.zeros((FP_LIMBS, 1), jnp.uint32) for _ in range(3))
        qx = jnp.moveaxis(px_all[:, :, None], 1, 0)
        qy = jnp.moveaxis(py_all[:, :, None], 1, 0)
        _, states = jax.lax.scan(step, init, (qx, qy))
        return states

    states_c = jax.jit(chain_complete)(jnp.asarray(xs), jnp.asarray(ys))
    k = CHAIN - 1
    aff = to_affine(G1Jac(states_c[0][k], states_c[1][k], states_c[2][k]))
    gx = np.asarray(FP.from_mont(aff.x)).ravel()
    gy = np.asarray(FP.from_mont(aff.y)).ravel()
    ok = (np.array_equal(gx, int_to_limbs(exp[k][0], FP_LIMBS))
          and np.array_equal(gy, int_to_limbs(exp[k][1], FP_LIMBS)))
    log(f"complete chain final: {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
