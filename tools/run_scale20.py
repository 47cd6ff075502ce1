"""Scale-20 default-config exercise (VERDICT item 4): setup + commit/open
at the reference's default scale on the real chip, timing each phase."""
import os, sys, time
os.environ.setdefault("FOURIER_XLA_CACHE", os.path.expanduser("~/.cache/fourier_tpu_xla"))
t0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-t0:8.1f}s] {m}", file=sys.stderr, flush=True)
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["FOURIER_XLA_CACHE"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, random
from fourier_tpu.constants import R
from fourier_tpu.models.piano import PianoBackend, SetupConfig

scale = int(os.environ.get("S20_SCALE", "20"))
m = int(os.environ.get("S20_M", "1"))
gen_pc = os.environ.get("S20_PRECOMPUTE", "1") == "1"
log(f"setup scale={scale} machines_scale={m} precompute={gen_pc}")
be = PianoBackend.setup(SetupConfig(
    scale=scale, machines_scale=m, generate_precompute=gen_pc))
log("setup complete")

random.seed(1)
T = be.fft.T
row = [random.randrange(R) for _ in range(T)]
alpha = random.randrange(R)
t = time.perf_counter()
com = be.worker_commit(0, row)
log(f"worker_commit (first, incl compile): {time.perf_counter()-t:.1f}s")
row2 = [random.randrange(R) for _ in range(T)]
t = time.perf_counter()
com2 = be.worker_commit(0, row2)
log(f"worker_commit (steady): {time.perf_counter()-t:.2f}s")
t = time.perf_counter()
y, pi = be.worker_open(0, row, alpha)
log(f"worker_open (first, incl compile): {time.perf_counter()-t:.1f}s")
t = time.perf_counter()
y2, pi2 = be.worker_open(0, row2, alpha)
log(f"worker_open (steady): {time.perf_counter()-t:.2f}s")
t = time.perf_counter()
ok = be.worker_verify(0, com, alpha, y, pi)
log(f"worker_verify: {ok} in {time.perf_counter()-t:.2f}s")
assert ok
print("SCALE-20 OK")
