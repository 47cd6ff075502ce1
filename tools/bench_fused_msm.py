import os, sys, time
os.environ.setdefault("FOURIER_XLA_CACHE", os.path.expanduser("~/.cache/fourier_tpu_xla"))
t0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-t0:7.1f}s] {m}", file=sys.stderr, flush=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["FOURIER_XLA_CACHE"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from fourier_tpu.constants import FR_LIMBS, FP_LIMBS
from fourier_tpu.ops import msm_fused as mf
from fourier_tpu.ops.curve import G1Aff

scale = int(os.environ.get("S", "19"))
c = int(os.environ.get("C", "13"))
n = 1 << scale
with np.load(os.path.expanduser(f"~/.cache/fourier_tpu_bench/points_{scale}.npz")) as z:
    px, py = jnp.asarray(z["x"]), jnp.asarray(z["y"])
points = G1Aff(px, py, jnp.zeros((n,), bool))
rng = np.random.default_rng(1)
sc = rng.integers(0, 1 << 16, size=(FR_LIMBS, n), dtype=np.uint32)
sc[-1] &= 0x7FFF
scalars = jnp.asarray(sc)
log("inputs ready")

out = mf.msm_fused(points, scalars, c)
np.asarray(out.x)
log("first call done (compile+run)")
for i in range(3):
    sc2 = rng.integers(0, 1 << 16, size=(FR_LIMBS, n), dtype=np.uint32)
    sc2[-1] &= 0x7FFF
    s2 = jnp.asarray(sc2); np.asarray(s2[:1,:1])
    t = time.perf_counter()
    out = mf.msm_fused(points, s2, c)
    np.asarray(out.x)
    dt = time.perf_counter() - t
    log(f"iter {i}: {dt:.3f}s = {n/dt:,.0f} pts/s")
