"""Window sweep for the tabled MSM at 2^19: measure end-to-end time for
several c (signed where available), to fit bgmw_auto_window's cost model
to reality.  Appends JSON lines to tools/PROFILE_MSM.log."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FOURIER_XLA_CACHE",
                      os.path.expanduser("~/.cache/fourier_tpu_xla"))

t0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter()-t0:7.1f}s] {m}", file=sys.stderr, flush=True)


SCALE = int(os.environ.get("SW_SCALE", "19"))
N = 1 << SCALE
CS = [int(x) for x in os.environ.get("SW_CS", "16,17,18,19").split(",")]
ITERS = int(os.environ.get("SW_ITERS", "5"))
CACHE = os.path.expanduser("~/.cache/fourier_tpu_bench")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["FOURIER_XLA_CACHE"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from fourier_tpu.constants import FR_LIMBS
    from fourier_tpu.ops import msm as msm_mod
    from fourier_tpu.ops import msm_fused as mf
    from fourier_tpu.ops.curve import G1Aff

    log(f"devices={jax.devices()}")
    with np.load(os.path.join(CACHE, f"points_{SCALE}.npz")) as z:
        points = G1Aff(jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                       jnp.zeros((N,), bool))
    rng = np.random.default_rng(11)
    sc = rng.integers(0, 1 << 16, size=(FR_LIMBS, N), dtype=np.uint32)
    sc[-1] &= 0x7FFF
    scal = jnp.asarray(sc)

    def sync(x):
        return np.asarray(x.ravel()[:1])

    out = {}
    for c in CS:
        path = os.path.join(CACHE, f"bgmw_{SCALE}_{c}.npz")
        if os.path.exists(path):
            with np.load(path) as z:
                packed = jnp.asarray(z["packed"])
            log(f"c={c}: table cached")
        else:
            log(f"c={c}: building table ...")
            table = msm_mod.bgmw_expand(points, c)
            packed = mf.pack_points(table)
            np.savez(path, packed=np.asarray(packed))
        tab_inf = jnp.zeros((packed.shape[0],), bool)
        signed = (packed.shape[0] // N) == mf.signed_window_count(c)
        run = jax.jit(lambda p, i, s, _c=c: mf.msm_fused_bgmw(p, i, s, _c).x)
        sync(run(packed, tab_inf, scal))
        ts = []
        for _ in range(ITERS):
            t = time.perf_counter()
            sync(run(packed, tab_inf, scal))
            ts.append(time.perf_counter() - t)
        med = float(np.median(ts))
        out[c] = med
        log(f"c={c} ({'signed' if signed else 'unsigned'}, "
            f"W={packed.shape[0]//N}): {med:.3f}s ({N/med:.0f} pts/s)")
        del packed

    line = {"metric": f"bgmw_c_sweep_2^{SCALE}",
            "seconds": {str(k): round(v, 4) for k, v in out.items()}}
    print(json.dumps(line))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PROFILE_MSM.log"), "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
