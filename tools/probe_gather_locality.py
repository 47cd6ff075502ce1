"""Gather locality on the axon TPU: random vs monotone row gathers at the
slab's shapes — decides whether slot-packed pre-gather is worth it."""
import os, sys, time
os.environ.setdefault("FOURIER_XLA_CACHE", os.path.expanduser("~/.cache/fourier_tpu_xla"))
t0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-t0:7.1f}s] {m}", file=sys.stderr, flush=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["FOURIER_XLA_CACHE"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

n_src = 1 << 23            # 8.4M rows of 24 u32 = 96B (the bgmw table)
n_out = 9 << 20            # ~9.4M gathered rows (slab size)
src = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, (n_src, 24), dtype=np.uint32))
rng = np.random.default_rng(1)

def timeit(name, idx):
    idx = jnp.asarray(idx)
    g = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    out = g(src, idx); np.asarray(out[:1,:1])
    best = 1e9
    for _ in range(2):
        t = time.perf_counter(); out = g(src, idx); np.asarray(out[:1,:1])
        best = min(best, time.perf_counter()-t)
    gb = n_out * 96 / 1e9
    log(f"{name}: {best*1000:.1f} ms ({gb/best:.0f} GB/s effective)")

timeit("random", rng.integers(0, n_src, n_out, dtype=np.int32))
# monotone: sorted random (page-local, variable stride)
timeit("monotone", np.sort(rng.integers(0, n_src, n_out, dtype=np.int32)))
# slab-shaped monotone: rows of 1024 lanes, each row monotone with ~stride n_src/1024
rows = n_out // 1024
base = np.arange(1024, dtype=np.int64) * (n_src // 1024)
mat = (base[None, :] + rng.integers(0, n_src // 1024, (rows, 1024))) % n_src
timeit("rowwise-monotone", mat.astype(np.int32).reshape(-1))
# sequential (upper bound)
timeit("sequential", (np.arange(n_out, dtype=np.int64) % n_src).astype(np.int32))

# -- width sweep: is the cost per ROW or per BYTE? --------------------------
log("width sweep at fixed row count (8.4M gathers):")
for width in (8, 16, 24, 32, 64, 128):
    srcw = jnp.asarray(np.random.default_rng(2).integers(
        0, 2**32, (n_src, width), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n_src, n_out, dtype=np.int32))
    g = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    out = g(srcw, idx); np.asarray(out[:1, :1])
    best = 1e9
    for _ in range(2):
        t = time.perf_counter(); out = g(srcw, idx); np.asarray(out[:1, :1])
        best = min(best, time.perf_counter() - t)
    gb = n_out * width * 4 / 1e9
    log(f"  width {width:4d}: {best*1000:7.1f} ms "
        f"({gb/best:5.1f} GB/s, {n_out/best/1e6:6.1f} Mrows/s)")

# element gather (width 1, minor-most)
src1 = jnp.asarray(np.random.default_rng(3).integers(
    0, 2**32, (n_src,), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, n_src, n_out, dtype=np.int32))
g1 = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
out = g1(src1, idx); np.asarray(out[:1])
best = 1e9
for _ in range(2):
    t = time.perf_counter(); out = g1(src1, idx); np.asarray(out[:1])
    best = min(best, time.perf_counter() - t)
log(f"  width    1: {best*1000:7.1f} ms ({n_out/best/1e6:6.1f} Mrows/s)")
