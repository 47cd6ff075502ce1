"""Ahead-of-time executable cache: compiled XLA programs on disk.

On tunneled TPU backends the end-to-end latency of a large jitted
program is dominated by machinery that runs before the first result:
Python tracing + Mosaic kernel lowering (tens of seconds), XLA
compilation (minutes for the MSM program), and program upload.  JAX's
persistent *compilation* cache only removes the middle step.  This
module serializes the fully-compiled executable
(`jax.experimental.serialize_executable`), so a later process reaches
its first result in seconds instead of minutes.

This is the TPU analog of the reference's ahead-of-time native build:
the reference pays its compile cost once in `cargo build --release`
(reference .github/workflows/ci.yml:54-58) and ships a binary; we pay
XLA's cost once and ship the executable bytes.

Artifacts are keyed on function name, argument shapes/dtypes, backend
platform/device-kind, the jax version, and a content hash of this
package's kernel sources — any kernel change invalidates the cache.
Loading is strictly best-effort: any failure falls back to jit.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile

import jax

_CODE_HASH = None


def _code_hash() -> str:
    """Content hash over the compute-path sources (ops/ + constants)."""
    global _CODE_HASH
    if _CODE_HASH is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        paths = [os.path.join(root, "constants.py")]
        ops_dir = os.path.join(root, "ops")
        paths += sorted(
            os.path.join(ops_dir, f)
            for f in os.listdir(ops_dir)
            if f.endswith(".py")
        )
        for p in paths:
            with open(p, "rb") as fh:
                h.update(fh.read())
        _CODE_HASH = h.hexdigest()[:16]
    return _CODE_HASH


def _backend_key() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "unknown").replace(" ", "_")
    return f"{d.platform}-{kind}-jax{jax.__version__}"


def cache_dir() -> str:
    path = os.environ.get(
        "FOURIER_AOT_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "fourier_tpu_aot"
        ),
    )
    os.makedirs(path, exist_ok=True)
    return path


def _args_key(args) -> str:
    leaves = jax.tree_util.tree_leaves(args)
    sig = ";".join(f"{tuple(a.shape)}:{a.dtype}" for a in leaves)
    return hashlib.sha256(sig.encode()).hexdigest()[:16]


def _artifact_path(name: str, args, extra_key: str) -> str:
    key = f"{name}-{_args_key(args)}-{_backend_key()}-{_code_hash()}"
    if extra_key:
        key += f"-{extra_key}"
    safe = hashlib.sha256(key.encode()).hexdigest()[:24]
    return os.path.join(cache_dir(), f"{name.replace('/', '_')}-{safe}.aot")


def load(name: str, args, extra_key: str = ""):
    """Return a loaded compiled callable for (name, arg shapes), or None."""
    path = _artifact_path(name, args, extra_key)
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental.serialize_executable import deserialize_and_load

        with open(path, "rb") as fh:
            payload, in_tree, out_tree = pickle.load(fh)
        return deserialize_and_load(payload, in_tree, out_tree)
    except Exception as e:  # stale jaxlib, other backend, corrupt file...
        print(f"[aot] load failed for {name}: {e}", file=sys.stderr)
        return None


def save(name: str, compiled, args, extra_key: str = "") -> str | None:
    """Serialize a jax.stages.Compiled to the cache (atomic write)."""
    path = _artifact_path(name, args, extra_key)
    try:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        fd, tmp = tempfile.mkstemp(dir=cache_dir(), suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        os.replace(tmp, path)
        return path
    except Exception as e:
        print(f"[aot] save failed for {name}: {e}", file=sys.stderr)
        return None


def get_or_build(
    name: str,
    fn,
    args,
    extra_key: str = "",
    build: bool = True,
    lower_args=None,
):
    """Loaded executable for fn at `args`' shapes, building+caching if needed.

    fn must be a jax.jit-wrapped callable.  `args` are the *dynamic*
    array arguments (used for shape keying and as lower() arguments);
    pass `lower_args` when fn additionally takes static arguments —
    fold those into `extra_key`.  Returns a callable taking the dynamic
    arguments, or None if build=False and no artifact exists.
    """
    loaded = load(name, args, extra_key)
    if loaded is not None:
        return loaded
    if not build:
        return None
    compiled = fn.lower(*(lower_args if lower_args is not None else args)).compile()
    save(name, compiled, args, extra_key)
    return compiled


def exists(name: str, args, extra_key: str = "") -> bool:
    return os.path.exists(_artifact_path(name, args, extra_key))
