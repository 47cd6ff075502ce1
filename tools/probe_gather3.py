"""Round-4 gather probe, part 2: map the fast XLA gather emitter.

probe_gather2 found take() rates of 44 Mrows/s at width 8, 26 at width
24, 17 at width 48, and 43 at width 96 — non-monotonic, so an emitter
switch happens somewhere.  This probe maps the sweet spot and validates
the quad-gather plan at production scale:

  F1  width sweep 64..384 at 4M rows
  F2  width 96 at the REAL slab size (8.9M rows), with and without .T
  F3  element gather (the order_flat[src_pos] indirection)
  F4  quad-gather correctness vs row-gather

Appends JSON lines to tools/PROBE_GATHER2.log.
"""
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


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["FOURIER_XLA_CACHE"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    log(f"devices={jax.devices()}")
    results = {}
    rng = np.random.default_rng(11)

    def sync(out):
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])

    def timeit(fn, *args, iters=3):
        out = fn(*args)
        sync(out)
        best = 1e9
        for _ in range(iters):
            t = time.perf_counter()
            out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t)
        return best

    n_src = 1 << 21
    n_out = 1 << 22
    idx = jnp.asarray(rng.integers(0, n_src, n_out, dtype=np.int32))

    # F1: fine width sweep
    for width in (64, 72, 80, 88, 96, 128, 192, 384):
        src = jnp.asarray(rng.integers(0, 2**32, (n_src, width),
                                       dtype=np.uint32))
        g = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
        dt = timeit(g, src, idx)
        mrows = n_out / dt / 1e6
        gbs = n_out * width * 4 / dt / 1e9
        log(f"F1 take width {width:3d}: {dt*1000:7.1f} ms "
            f"{mrows:6.1f} Mrows/s {gbs:5.1f} GB/s")
        results[f"f1_w{width}_mrows"] = round(mrows, 1)

    # F2: width 96 at real slab size, with and without fused transpose
    n_src2 = 1 << 21   # 2.1M quads = 8.4M rows
    n_out2 = 9 << 20   # 9.4M slab positions
    src96 = jnp.asarray(rng.integers(0, 2**32, (n_src2, 96),
                                     dtype=np.uint32))
    idx2 = jnp.asarray(rng.integers(0, n_src2, n_out2, dtype=np.int32))
    g = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    dt = timeit(g, src96, idx2)
    log(f"F2 w96 @9.4M rows: {dt*1000:7.1f} ms {n_out2/dt/1e6:6.1f} Mrows/s")
    results["f2_w96_9m_mrows"] = round(n_out2 / dt / 1e6, 1)
    gT = jax.jit(lambda s, i: jnp.take(s, i, axis=0).T)
    dt = timeit(gT, src96, idx2)
    log(f"F2 w96 @9.4M +.T: {dt*1000:7.1f} ms {n_out2/dt/1e6:6.1f} Mrows/s")
    results["f2_w96_9m_T_mrows"] = round(n_out2 / dt / 1e6, 1)
    # current production shape for comparison: w24 @9.4M + .T
    src24 = jnp.asarray(rng.integers(0, 2**32, (4 * n_src2, 24),
                                     dtype=np.uint32))
    idx24 = jnp.asarray(rng.integers(0, 4 * n_src2, n_out2, dtype=np.int32))
    dt = timeit(gT, src24, idx24)
    log(f"F2 w24 @9.4M +.T: {dt*1000:7.1f} ms {n_out2/dt/1e6:6.1f} Mrows/s")
    results["f2_w24_9m_T_mrows"] = round(n_out2 / dt / 1e6, 1)

    # F3: element gather at the indirection's size
    flat = jnp.asarray(rng.integers(0, 2**32, (4 * n_src2,),
                                    dtype=np.uint32))
    g1 = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
    dt = timeit(g1, flat, idx24)
    log(f"F3 element gather @9.4M: {dt*1000:7.1f} ms "
        f"{n_out2/dt/1e6:6.1f} Melems/s")
    results["f3_elem_melems"] = round(n_out2 / dt / 1e6, 1)

    # F4: quad-gather == row-gather (correctness of the select math)
    rows = src96.reshape(-1, 24)
    ridx = np.asarray(idx2[:1024]) * 4 + rng.integers(0, 4, 1024)
    direct = np.asarray(jnp.take(rows, jnp.asarray(ridx), axis=0))
    quads = np.asarray(jnp.take(src96, jnp.asarray(ridx // 4), axis=0))
    sub = ridx % 4
    sel = quads.reshape(-1, 4, 24)[np.arange(1024), sub]
    ok = bool((direct == sel).all())
    log(f"F4 quad select correctness: {ok}")
    results["f4_quad_ok"] = ok

    line = {"metric": "gather_probe_round4b", **results}
    print(json.dumps(line))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PROBE_GATHER2.log"), "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
