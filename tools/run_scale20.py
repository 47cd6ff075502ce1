"""Scale-20 default-config exercise on the real chip (VERDICT item 3).

The reference's default configuration is --scale 20 (reference
src/cli.rs:28).  This runs it end-to-end on the TPU: trusted setup,
BGMW precompute, the full worker->master commit/open/verify round, and
a saved-setup serve cycle (save, reload, re-commit must match), timing
every phase.  Output is appended to tools/SCALE20_RUN.log (committed).

Run:  python tools/run_scale20.py            (scale 20, M=2)
      S20_M=0 python tools/run_scale20.py    (M=1: single worker)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FOURIER_XLA_CACHE",
                      os.path.expanduser("~/.cache/fourier_tpu_xla"))

t0 = time.perf_counter()
_LINES = []


def log(m):
    line = f"[{time.perf_counter()-t0:8.1f}s] {m}"
    print(line, file=sys.stderr, flush=True)
    _LINES.append(line)


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["FOURIER_XLA_CACHE"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random  # noqa: E402

from fourier_tpu.constants import R  # noqa: E402
from fourier_tpu.models.piano import PianoBackend, SetupConfig  # noqa: E402

scale = int(os.environ.get("S20_SCALE", "20"))
m = int(os.environ.get("S20_M", "1"))
gen_pc = os.environ.get("S20_PRECOMPUTE", "1") == "1"
M = 1 << m

log(f"devices={jax.devices()}")
log(f"setup scale={scale} machines_scale={m} (M={M}) precompute={gen_pc}")
t = time.perf_counter()
be = PianoBackend.setup(SetupConfig(
    scale=scale, machines_scale=m, generate_precompute=gen_pc))
log(f"setup + precompute complete: {time.perf_counter()-t:.1f}s")

random.seed(1)
T = be.fft.T
rows = [[random.randrange(R) for _ in range(T)] for _ in range(M)]
alpha = random.randrange(R)
beta = random.randrange(R)

# full distributed round, every role
coms, evals, proofs = [], [], []
for i in range(M):
    t = time.perf_counter()
    coms.append(be.worker_commit(i, rows[i]))
    log(f"worker_commit[{i}] (first, incl compile): "
        f"{time.perf_counter()-t:.1f}s")
for i in range(M):
    t = time.perf_counter()
    y, pi = be.worker_open(i, rows[i], alpha)
    evals.append(y)
    proofs.append(pi)
    log(f"worker_open[{i}] (first, incl compile): {time.perf_counter()-t:.1f}s")
for i in range(M):
    t = time.perf_counter()
    ok = be.worker_verify(i, coms[i], alpha, evals[i], proofs[i])
    assert ok
    log(f"worker_verify[{i}]: True in {time.perf_counter()-t:.2f}s")

t = time.perf_counter()
master_com = be.master_commit(coms)
z, (pi0, pi1) = be.master_open(evals, proofs, beta)
log(f"master_commit + master_open: {time.perf_counter()-t:.2f}s")
t = time.perf_counter()
ok = be.master_verify(master_com, beta, alpha, z, (pi0, pi1))
assert ok
log(f"master_verify: True in {time.perf_counter()-t:.2f}s")

# steady-state timings (compiled)
row2 = [random.randrange(R) for _ in range(T)]
t = time.perf_counter()
com2 = be.worker_commit(0, row2)
log(f"worker_commit (steady): {time.perf_counter()-t:.2f}s")
t = time.perf_counter()
y2, pi2 = be.worker_open(0, row2, alpha)
log(f"worker_open (steady): {time.perf_counter()-t:.2f}s")

# saved-setup serve cycle: save, reload in a fresh backend, re-commit
import tempfile

with tempfile.TemporaryDirectory() as d:
    from fourier_tpu.runtime import io as rio

    sp = os.path.join(d, "setup")
    pp = os.path.join(d, "precompute")
    t = time.perf_counter()
    rio.save_setup(be.settings, sp, compressed=True)
    log(f"save_setup (compressed): {time.perf_counter()-t:.1f}s "
        f"({os.path.getsize(sp)//(1<<20)} MiB)")
    if be.settings.precompute is not None:
        t = time.perf_counter()
        rio.save_precompute(be.settings.precompute, pp)
        log(f"save_precompute: {time.perf_counter()-t:.1f}s "
            f"({os.path.getsize(pp)//(1<<20)} MiB)")
    # Drop the live backend before reloading: a serving process holds
    # ONE backend, and two full scale-20 table sets plus the commit
    # program's slab transients exceed single-chip HBM.
    had_pc = be.settings.precompute is not None
    del be
    import gc

    gc.collect()
    t = time.perf_counter()
    be2 = PianoBackend.setup(SetupConfig(
        scale=scale, machines_scale=m, setup_path=sp,
        precompute_path=pp if had_pc else None,
        generate_setup=False,
        generate_precompute=not had_pc,
    ))
    log(f"reload from files: {time.perf_counter()-t:.1f}s")
    # mirror the server boot: pre-build/load serving executables (the
    # run-command warms before taking requests — runtime/server.py)
    t = time.perf_counter()
    be2.warm_executables()
    log(f"warm_executables: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    com_reload = be2.worker_commit(0, rows[0])
    log(f"re-commit on reloaded setup: {time.perf_counter()-t:.1f}s")
    assert com_reload == coms[0], "reloaded-setup commitment mismatch"
    log("saved-setup serve cycle: commitments match")

verdict = f"SCALE-{scale} OK (M={M}, precompute={gen_pc})"
log(verdict)
out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "SCALE20_RUN.log")
with open(out, "a") as fh:
    fh.write("\n".join(_LINES) + "\n\n")
print(verdict)
