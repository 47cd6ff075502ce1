"""Round-4 gather probes: can anything move scattered 96B rows faster
than XLA's ~30 Mrows/s take?

The slab gather is ~30% of MSM wall time (tools/PROFILE_MSM.log) and
round-3 established XLA's row gather is index-pattern-insensitive.  This
probe pins down WHERE the cost lives and what beats it:

  E1  XLA take row-width sweep          per-row vs per-byte cost
  E2  sorted indices + gather hints     does XLA pick a faster emitter?
  E3  transposed (lane-axis) gather     axis=1 emitter
  E4  Mosaic in-VMEM gathers            take_along_axis at several
                                        shapes/axes + row-copy loop
  E5  per-row DMA issue rate            HBM->VMEM descriptor floor

NOTE on timing: jax.block_until_ready does NOT synchronize on the axon
tunnel platform — every measurement must fetch a device byte
(np.asarray) to force completion.

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"devices={jax.devices()}")
    results = {}
    rng = np.random.default_rng(7)

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

    n_src = 1 << 22
    n_out = 1 << 22
    idx_np = rng.integers(0, n_src, n_out, dtype=np.int32)
    idx = jnp.asarray(idx_np)

    # E1: width sweep
    for width in (8, 24, 48, 96):
        src = jnp.asarray(rng.integers(0, 2**32, (n_src, width),
                                       dtype=np.uint32))
        g = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
        dt = timeit(g, src, idx)
        mrows = n_out / dt / 1e6
        gbs = n_out * width * 4 / dt / 1e9
        log(f"E1 take width {width:3d}: {dt*1000:7.1f} ms "
            f"{mrows:6.1f} Mrows/s {gbs:5.1f} GB/s")
        results[f"e1_take_w{width}_mrows"] = round(mrows, 1)

    # E2: sorted indices, gather emitter hints
    src24 = jnp.asarray(rng.integers(0, 2**32, (n_src, 24), dtype=np.uint32))
    sidx = jnp.asarray(np.sort(idx_np))

    def take_sorted(s, i):
        return jax.lax.gather(
            s, i[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 24),
            indices_are_sorted=True, unique_indices=False,
            mode=jax.lax.GatherScatterMode.CLIP,
        )
    dt = timeit(jax.jit(take_sorted), src24, sidx)
    log(f"E2 sorted+hint w24: {dt*1000:7.1f} ms {n_out/dt/1e6:6.1f} Mrows/s")
    results["e2_sorted_hint_mrows"] = round(n_out / dt / 1e6, 1)

    # E3: lane-axis gather (transposed table)
    src_t = jnp.asarray(rng.integers(0, 2**32, (24, n_src), dtype=np.uint32))
    g = jax.jit(lambda s, i: jnp.take(s, i, axis=1))
    try:
        dt = timeit(g, src_t, idx)
        log(f"E3 take axis=1: {dt*1000:7.1f} ms {n_out/dt/1e6:6.1f} Mrows/s")
        results["e3_axis1_mrows"] = round(n_out / dt / 1e6, 1)
    except Exception as e:  # pragma: no cover - probe
        log(f"E3 failed: {type(e).__name__}: {e}")
        results["e3_axis1_mrows"] = None

    # E4: Mosaic in-VMEM take_along_axis at several shapes.  idx shape
    # must equal the output shape; gather axis 0 (sublanes) and -1
    # (lanes) probed separately.  The kernel loops ITER times to
    # amortize pallas_call overhead.
    def tala_probe(S, W, axis, ITER=64):
        blk = jnp.asarray(rng.integers(0, 2**32, (S, W), dtype=np.uint32))
        lim = S if axis == 0 else W
        kidx = jnp.asarray(rng.integers(0, lim, (ITER, S, W),
                                        dtype=np.int32))

        def kernel(idx_ref, src_ref, out_ref):
            def body(i, acc):
                g = jnp.take_along_axis(src_ref[...], idx_ref[i], axis=axis)
                return acc ^ g
            out_ref[...] = jax.lax.fori_loop(
                0, ITER, body, jnp.zeros((S, W), jnp.uint32))

        fn = jax.jit(lambda i, s: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, W), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, s))
        dt = timeit(fn, kidx, blk)
        elems = ITER * S * W / dt / 1e6
        return dt, elems

    for (S, W, axis) in ((8, 128, 0), (256, 128, 0), (2048, 128, 0),
                         (8, 128, 1), (256, 128, 1)):
        key = f"e4_tala_{S}x{W}_ax{axis}"
        try:
            dt, melems = tala_probe(S, W, axis)
            log(f"E4 tala [{S},{W}] axis={axis}: {dt*1000:7.2f} ms "
                f"{melems:8.1f} Melems/s")
            results[key] = round(melems, 1)
        except Exception as e:  # pragma: no cover - probe
            log(f"E4 tala [{S},{W}] axis={axis} failed: "
                f"{type(e).__name__}: {str(e).splitlines()[0][:160]}")
            results[key] = None

    # E4c: dynamic-slice row-copy loop (one row per iteration), VMEM
    S, K, W = 4096, 4096, 128
    blk = jnp.asarray(rng.integers(0, 2**32, (S, W), dtype=np.uint32))
    kidx1 = jnp.asarray(rng.integers(0, S, (1, K), dtype=np.int32))

    def copy_kernel(idx_ref, src_ref, out_ref):
        def body(i, _):
            j = idx_ref[0, i]
            out_ref[pl.ds(i, 1), :] = src_ref[pl.ds(j, 1), :]
            return 0
        jax.lax.fori_loop(0, K, body, 0)

    try:
        fn = jax.jit(lambda i, s: pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct((K, W), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, s))
        dt = timeit(fn, kidx1, blk)
        mrows = K / dt / 1e6
        log(f"E4c row-copy loop: {dt*1000:7.2f} ms {mrows:6.1f} Mrows/s "
            f"(rows of {W*4}B)")
        results["e4c_rowcopy_mrows"] = round(mrows, 1)
    except Exception as e:  # pragma: no cover - probe
        log(f"E4c failed: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
        results["e4c_rowcopy_mrows"] = None

    # E5: per-row DMA issue rate, HBM source, NSEM in flight
    NSEM, K5 = 8, 4096
    hbm_src = jnp.asarray(rng.integers(0, 2**32, (n_src, 24),
                                       dtype=np.uint32))
    hidx = jnp.asarray(rng.integers(0, n_src, (1, K5), dtype=np.int32))

    def dma_kernel(idx_ref, hbm_ref, out_ref, sems):
        def get(i):
            j = idx_ref[0, i]
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(j, 1)],
                out_ref.at[pl.ds(jax.lax.rem(i, K5), 1)],
                sems.at[jax.lax.rem(i, NSEM)],
            )

        def body(i, _):
            @pl.when(i >= NSEM)
            def _():
                get(i - NSEM).wait()
            get(i).start()
            return 0
        jax.lax.fori_loop(0, K5, body, 0)

        def drain(i, _):
            get(K5 - NSEM + i).wait()
            return 0
        jax.lax.fori_loop(0, NSEM, drain, 0)

    try:
        fn = jax.jit(lambda i, s: pl.pallas_call(
            dma_kernel,
            out_shape=jax.ShapeDtypeStruct((K5, 24), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(i, s))
        dt = timeit(fn, hidx, hbm_src)
        mrows = K5 / dt / 1e6
        log(f"E5 per-row DMA: {dt*1000:7.2f} ms {mrows:6.1f} Mrows/s")
        results["e5_dma_mrows"] = round(mrows, 1)
    except Exception as e:  # pragma: no cover - probe
        log(f"E5 failed: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
        results["e5_dma_mrows"] = None

    line = {"metric": "gather_probe_round4", **results}
    print(json.dumps(line))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PROBE_GATHER2.log"), "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
