"""Multi-host distribution: Piano workers mapped onto jax processes.

The reference's deployment is one RPC server per machine with the
CLIENT shuttling every byte between master and workers over HTTP
(reference src/rpc.rs:866-875 boots M+1 servers; there is no
server<->server traffic at all).  The TPU-native deployment keeps that
JSON-RPC surface at the job edge, but INSIDE a job the hosts form one
`jax.distributed` cluster: all devices of all hosts join a single
global Mesh, each host holds its workers' witness rows and U-matrix
shard process-locally, and the master aggregation runs as a cross-host
collective (the all_gather inside parallel.prove_sharded rides DCN/ICI
instead of the reference's client-orchestrated HTTP hop — SURVEY.md §5
"distributed communication backend").

Usage on a real multi-host job (one process per host):

    from fourier_tpu.parallel import multihost
    multihost.initialize(coordinator, num_processes, process_id)
    mesh = multihost.global_mesh()
    out = multihost.run_prove(backend, rows, alpha, beta, mesh=mesh)

Every process passes the FULL logical inputs (cheap: the hot arrays are
the SRS shards each host already owns); `make_array_from_callback` only
materializes the shards addressable on that host, so host i only
touches its own workers' rows.

`python -m fourier_tpu.parallel.multihost --dryrun ...` is the
self-contained fake-host worker used by __graft_entry__.dryrun_multihost
and the test suite: N local processes, CPU devices, gRPC coordination on
localhost — the same code path as a real pod deployment.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the jax.distributed cluster (idempotent per process)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "workers"):
    """One-axis mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def host_to_global(mesh, spec, arr):
    """Lift a process-local full array to a global sharded array.

    The callback is only invoked for this process's addressable shards,
    so each host materializes just its slice of the worker axis."""
    import jax
    from jax.sharding import NamedSharding

    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def coordination_barrier(name: str, timeout_s: float = 600.0) -> bool:
    """Block until every process reaches `name`, via the coordination
    service (gRPC — usable even before any collective has initialized
    the on-device communicator, whose own connect timeout is short).
    Returns False when the runtime doesn't expose the barrier API."""
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is None:
            return False
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
        return True
    except (ImportError, AttributeError):
        return False


def run_prove(backend, rows, alpha: int, beta: int, mesh=None,
              axis: str = "workers"):
    """The full distributed prove round over a (multi-host) mesh.

    Returns the prove_sharded output dict; the master outputs
    (master_com, z, pi0, pi1) are fully replicated and readable on every
    host, the per-worker outputs are sharded along the worker axis.

    The program is AOT-compiled before a coordination barrier so that
    hosts with cold compile caches cannot skew into the communicator's
    connect timeout: every host enters the first collective together."""
    from .prove_sharded import (
        build_distributed_prove,
        prove_in_specs,
        prove_inputs_from_backend,
    )

    if mesh is None:
        mesh = global_mesh(axis)
    args = prove_inputs_from_backend(backend, rows, alpha, beta)
    gargs = [
        host_to_global(mesh, spec, a)
        for a, spec in zip(args, prove_in_specs(axis))
    ]
    prove = build_distributed_prove(mesh, axis=axis)
    compiled = prove.lower(*gargs).compile()
    coordination_barrier("prove-compiled")
    return compiled(*gargs)


def replicated_to_host(x):
    """np.ndarray view of a fully-replicated global array."""
    return np.asarray(x.addressable_data(0))


# ---------------------------------------------------------------------------
# Fake-host dryrun worker (CPU, localhost coordination)
# ---------------------------------------------------------------------------

def _dryrun_worker(coordinator: str, num_processes: int, process_id: int,
                   scale: int, machines_scale: int) -> None:
    """One fake host: join the cluster, run the prove round over the
    global mesh, assert the master outputs against the host protocol
    path, and verify the aggregate proof."""
    import jax

    # Fake hosts are CPU-only; pin the platform at config level too (the
    # ambient environment may carry a hardware TPU plugin) and reuse the
    # persistent compile cache so repeated dryruns are cheap.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("FOURIER_XLA_CACHE", "/root/.cache/jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass

    def log(msg):
        print(f"[multihost dryrun p{process_id}] {msg}", flush=True)

    log(f"joining cluster at {coordinator}")
    initialize(coordinator, num_processes, process_id)
    log(f"joined: {jax.process_count()} processes, "
        f"{len(jax.devices())} global devices")

    from ..constants import R
    from ..models.piano import (
        PianoBackend,
        PianoFFTSettings,
        generate_trusted_setup,
    )
    from ..ops import curve as cv
    from ..ops.limbs import vec_to_int

    assert jax.process_count() == num_processes

    # Identical deterministic backend on every host (fixed secrets).
    fft = PianoFFTSettings(scale, machines_scale)
    settings = generate_trusted_setup(fft, (b"\x2a" * 32, b"\x2b" * 32))
    backend = PianoBackend(fft, settings)

    rng = np.random.default_rng(7)
    rows = [
        [int(r) for r in rng.integers(0, 1 << 62, fft.T)]
        for _ in range(fft.M)
    ]
    alpha = int(rng.integers(1, 1 << 62))
    beta = int(rng.integers(1, 1 << 62))

    log("backend ready; starting SPMD prove")
    mesh = global_mesh()
    out = jax.block_until_ready(run_prove(backend, rows, alpha, beta, mesh))
    log("SPMD prove done")

    def pt(triple):
        return cv.jac_to_int_points(
            cv.G1Jac(*[replicated_to_host(a) for a in triple])
        )[0]

    master_com = pt(out["master_com"])
    pi0 = pt(out["pi0"])
    pi1 = pt(out["pi1"])
    z = vec_to_int(replicated_to_host(out["z"]))

    log("replicated outputs extracted; computing host reference")
    commits, evals, proofs = [], [], []
    for i in range(fft.M):
        commits.append(backend.worker_commit(i, rows[i]))
        y, pi = backend.worker_open(i, rows[i], alpha)
        evals.append(y)
        proofs.append(pi)
    assert master_com == backend.master_commit(commits), "master_com mismatch"
    z_ref, (pi0_ref, pi1_ref) = backend.master_open(evals, proofs, beta)
    assert z == z_ref, "z mismatch"
    assert pi0 == pi0_ref, "pi0 mismatch"
    assert pi1 == pi1_ref, "pi1 mismatch"
    log("host reference asserts passed")
    assert backend.master_verify(master_com, beta, alpha, z, (pi0, pi1))
    # Align exits: the distributed runtime's shutdown barrier times out if
    # one process (e.g. paying a cold compile on its host-path asserts)
    # exits minutes after another.
    coordination_barrier("dryrun-done")
    print(f"[multihost dryrun] process {process_id}/{num_processes}: OK",
          flush=True)


def spawn_dryrun(n_processes: int = 2, scale: int = 5,
                 machines_scale: int = 2, devices_per_process: int = 2,
                 timeout: float = 900.0) -> None:
    """Launch n fake-host processes on localhost and wait for all-OK.

    Raises on any non-zero exit.  Each child is a fresh interpreter with
    CPU devices and its own jax.distributed client — the same wiring as
    one process per machine on a real cluster."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    inherited = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": " ".join(
            [f"--xla_force_host_platform_device_count={devices_per_process}"]
            + inherited
        ),
    }
    env_base.pop("FOURIER_PLATFORM", None)
    procs = []
    for pid in range(n_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fourier_tpu.parallel.multihost",
             "--dryrun", "--coordinator", coordinator,
             "--num-processes", str(n_processes),
             "--process-id", str(pid),
             "--scale", str(scale),
             "--machines-scale", str(machines_scale)],
            env=env_base,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        ))
    failures, tails = [], []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
            rc = p.returncode
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = -9
        if rc != 0:
            failures.append((pid, rc))
            tails.append(
                f"--- process {pid} (rc={rc}) tail ---\n"
                + "\n".join((out or "").splitlines()[-40:])
            )
    if failures:
        raise RuntimeError(
            f"multihost dryrun failed: {failures}\n" + "\n".join(tails)
        )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="fourier_tpu.parallel.multihost")
    ap.add_argument("--dryrun", action="store_true")
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--scale", type=int, default=5)
    ap.add_argument("--machines-scale", type=int, default=2)
    args = ap.parse_args(argv)
    _dryrun_worker(args.coordinator, args.num_processes, args.process_id,
                   args.scale, args.machines_scale)


if __name__ == "__main__":
    main()
