"""Probe replacements for the 31 ms `edges` searchsorted (B+1 binary
searches = 17 rounds x 65537 element gathers, Theta(B log WN), fixed at
every shard size).

Candidates, at WN in {1.05M (D=8 shard), 8.4M (D=1)}:
  ss        baseline jnp.searchsorted(sd, arange(B+1))
  bincount  counts via scatter-add (jnp.zeros(B).at[sd].add(1))
  smin      first-occurrence scatter-min + reverse cummin -> edges
  dsort     sentinel double-sort: append B+1 sentinel keys to the digit
            sort, second sort extracts their positions
Appends to tools/PROFILE_MSM.log.
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
    B = 1 << 16
    rng = np.random.default_rng(0)
    results = {}

    def timeit(name, fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        K = 10
        ts = []
        for _ in range(3):
            t = time.perf_counter()
            for _ in range(K):
                out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            ts.append((time.perf_counter() - t) / K)
        med = float(np.median(ts))
        results[name] = round(med * 1e3, 2)
        log(f"{name}: {med*1e3:8.2f} ms")

    for tag, WN in (("1m", (16 << 19) // 8), ("8m", 16 << 19)):
        d_np = np.sort(rng.integers(0, B, WN, dtype=np.int32))
        sd = jnp.asarray(d_np)
        digits = jnp.asarray(rng.integers(0, B, WN, dtype=np.int32))
        meta = jnp.asarray(rng.integers(0, 1 << 28, WN, dtype=np.uint32))

        @jax.jit
        def p_ss(s):
            return jnp.searchsorted(
                s, jnp.arange(B + 1, dtype=jnp.int32), side="left"
            ).astype(jnp.int32)

        timeit(f"ss_{tag}", p_ss, sd)

        @jax.jit
        def p_bincount(d):
            return jnp.zeros((B,), jnp.int32).at[d].add(1, mode="drop")

        timeit(f"bincount_{tag}", p_bincount, digits)

        @jax.jit
        def p_smin(s):
            idx = jnp.arange(s.shape[0], dtype=jnp.int32)
            e = jnp.full((B + 1,), s.shape[0], jnp.int32).at[s].min(
                idx, mode="drop")
            return jax.lax.associative_scan(jnp.minimum, e, reverse=True)

        timeit(f"smin_{tag}", p_smin, sd)

        @jax.jit
        def p_dsort(d, m):
            sent_keys = jnp.arange(B + 1, dtype=jnp.int32)
            sent_meta = jnp.uint32(1 << 31) | sent_keys.astype(jnp.uint32)
            dk = jnp.concatenate([d, sent_keys])
            mk = jnp.concatenate([m, sent_meta])
            sd2, ms2 = jax.lax.sort_key_val(dk, mk)
            is_s = (ms2 >> 31).astype(jnp.int32)
            key2 = jnp.where(is_s == 1, ms2 & 0x7FFFFFFF,
                             jnp.uint32(B + 2)).astype(jnp.int32)
            pos = jnp.arange(dk.shape[0], dtype=jnp.int32)
            _, p_b = jax.lax.sort_key_val(key2, pos)
            return sd2, ms2, p_b[: B + 1]

        timeit(f"dsort_{tag}", p_dsort, digits, meta)

        # reference correctness check (host, small cost): smin == ss
        e_ss = np.asarray(p_ss(sd))
        e_sm = np.asarray(p_smin(sd))
        assert (e_ss == e_sm).all(), "smin mismatch"
        cnt = np.asarray(p_bincount(sd))
        assert (cnt == (e_ss[1:] - e_ss[:-1])).all(), "bincount mismatch"

    line = {"metric": "edges_probe", **results, "unit": "ms"}
    print(json.dumps(line))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "PROFILE_MSM.log"), "a") as fh:
        fh.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
