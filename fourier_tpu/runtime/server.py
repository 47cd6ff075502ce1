"""HTTP JSON-RPC server exposing the 11-method wire protocol.

Role-parity with the reference server (reference src/rpc.rs:403-521):
- any HTTP method is accepted (the reference ignores the verb — its tests
  use GET, the Python client POSTs; reference src/rpc.rs:632, fourier.py:276);
- responses are bare RpcResult JSON, errors are {"message": ...};
- one backend instance is shared across connections (Arc<PianoBackend>
  analog); the restart-forever loop of start_rpc_server
  (reference src/rpc.rs:514-521) is preserved.

Concurrency: a threading HTTP server front-end; the heavy math runs as
batched device computations, so request handling is dominated by compute
dispatch rather than IO.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..constants import FR_LIMBS
from ..models.piano import PianoBackend, SetupConfig
from ..ops import serialize as pser
from ..ops.limbs import bytes_be_to_limbs, limbs_to_bytes_be
from ..refimpl import curve as rc
from ..refimpl.field import fr_from_bytes, fr_to_bytes
from . import wire

logger = logging.getLogger("fourier_tpu")


@dataclass
class ServerConfig:
    host: str = "localhost"
    port: int = 1337
    backend: SetupConfig = field(default_factory=SetupConfig)


def _parse_fr(s: str) -> int:
    return fr_from_bytes(wire.b64_decode(s))


def _parse_g1(s: str) -> object:
    return rc.g1_from_bytes(wire.b64_decode(s))


def _enc_fr(v: int) -> str:
    return wire.b64_encode(fr_to_bytes(v))


def _enc_fr_batch(limbs: np.ndarray) -> list[str]:
    """[FR_LIMBS, n] canonical limbs -> base64 wire strings, vectorized.

    Byte marshalling is numpy; the base64 hop uses the native batch
    encoder when built, else one bulk b64encode per row group."""
    from .. import native

    raw = np.frombuffer(
        limbs_to_bytes_be(np.asarray(limbs).T, 32), np.uint8
    ).reshape(-1, 32)
    out = native.encode_b64_batch(raw)
    if out is not None:
        return out
    return [wire.b64_encode(r.tobytes()) for r in raw]


def _enc_g1(pt) -> str:
    return wire.b64_encode(rc.g1_to_bytes(pt))


def _parse_usize(v) -> int:
    """serde-strict usize: JSON unsigned integers only.  The reference's
    `i: usize` field rejects bools, floats, and numeric strings ("3",
    3.0, true are deserialization errors — src/rpc.rs:36-58)."""
    if type(v) is not int or v < 0:
        raise ValueError("invalid type for machine index: expected unsigned integer")
    return v


_R_BE = None


def _parse_poly_limbs(strs: list[str]) -> np.ndarray:
    """Vectorized wire decode: base64 strings -> [FR_LIMBS, n] canonical limbs.

    Validates canonicality (FsFr::from_bytes semantics) on the whole batch.
    Uses the native C++ fast path when available (fourier_tpu.native),
    mirroring the reference's native batch_reader IO layer.
    """
    from ..constants import R

    global _R_BE
    if _R_BE is None:
        _R_BE = int(R).to_bytes(32, "big")

    if strs and all(isinstance(s, str) for s in strs):
        from .. import native

        try:
            limbs = native.decode_scalars_b64(strs, _R_BE, FR_LIMBS)
        except ValueError:
            raise
        if limbs is not None:
            return np.ascontiguousarray(limbs.T)

    raw = b"".join(wire.b64_decode(s) for s in strs)
    if len(raw) != 32 * len(strs):
        raise ValueError("scalar encoding must be 32 bytes")
    limbs = bytes_be_to_limbs(raw, 32, FR_LIMBS)  # [n, L]
    from ..ops.limbs import int_to_limbs

    if pser._np_geq(limbs, int_to_limbs(R, FR_LIMBS).astype(np.int64)).any():
        raise ValueError("scalar is not canonical (>= r)")
    return np.ascontiguousarray(limbs.T)


class RpcHandler:
    """Method dispatch (reference RpcHandler, src/rpc.rs:176-401).

    Locking is scoped per method class, so cheap host-side requests are
    served concurrently (the reference spawns a tokio task per
    connection, src/rpc.rs:502-509): device-dispatch methods share one
    lock (one chip = one queue), RNG methods share a small lock for the
    non-thread-safe generator, and pure host math (ping, evaluate,
    verify, masterCommit) runs lock-free on read-only setup state.
    """

    _DEVICE_METHODS = frozenset({"fft", "workerCommit", "workerOpen", "masterOpen"})
    _RNG_METHODS = frozenset({"randomPoly", "randomPoint"})

    def __init__(self, backend: PianoBackend):
        self.backend = backend
        self._device_lock = threading.Lock()
        self._rng_lock = threading.Lock()

    def handle(self, method: str, params: dict) -> dict:
        fn = getattr(self, "_handle_" + method)
        if method in self._DEVICE_METHODS:
            with self._device_lock:
                return fn(params)
        if method in self._RNG_METHODS:
            with self._rng_lock:
                return fn(params)
        return fn(params)

    # -- utils -------------------------------------------------------------

    def _handle_ping(self, params):
        # RpcResult::Pong is a unit variant of an untagged serde enum: it
        # serializes as JSON null (reference src/rpc.rs:98-127, 202-204).
        return None

    def _handle_randomPoly(self, params):
        # vectorized end to end: limb draw + device mod-R + native batch
        # base64 (the per-value _enc_fr loop was 2^20 Python iterations
        # at the reference's default scale)
        rows = self.backend.random_bivariate_limbs()
        return {"poly": [_enc_fr_batch(row) for row in rows]}

    def _handle_randomPoint(self, params):
        return {"point": _enc_fr(self.backend.random_point())}

    def _handle_evaluate(self, params):
        limbs = _parse_poly_limbs(params["poly"])
        x = _parse_fr(params["x"])
        return {"y": _enc_fr(self.backend.evaluate_limbs(limbs, x))}

    def _handle_fft(self, params):
        # serde-strict parameter types (the reference's bool fields reject
        # anything but JSON true/false, src/rpc.rs:60-66)
        left, inverse = params["left"], params["inverse"]
        if not isinstance(left, bool) or not isinstance(inverse, bool):
            raise ValueError("left/inverse must be booleans")
        limbs = _parse_poly_limbs(params["poly"])
        out = self.backend.fft.fft_limbs(limbs, left, inverse)
        return {"poly": _enc_fr_batch(out)}

    # -- worker ------------------------------------------------------------

    def _handle_workerCommit(self, params):
        limbs = _parse_poly_limbs(params["poly"])
        self._check_len(limbs)
        commitment = self.backend.worker_commit(
            _parse_usize(params["i"]), self._pad(limbs))
        return {"commitment": _enc_g1(commitment)}

    def _handle_workerOpen(self, params):
        limbs = _parse_poly_limbs(params["poly"])
        self._check_len(limbs)
        x = _parse_fr(params["x"])
        y, proof = self.backend.worker_open(
            _parse_usize(params["i"]), self._pad(limbs), x)
        return {"proof": _enc_g1(proof), "eval": _enc_fr(y)}

    def _handle_workerVerify(self, params):
        valid = self.backend.worker_verify(
            _parse_usize(params["i"]),
            _parse_g1(params["commitment"]),
            _parse_fr(params["alpha"]),
            _parse_fr(params["eval"]),
            _parse_g1(params["proof"]),
        )
        return {"valid": bool(valid)}

    # -- master ------------------------------------------------------------

    def _handle_masterCommit(self, params):
        commitments = [_parse_g1(s) for s in params["commitments"]]
        return {"commitment": _enc_g1(self.backend.master_commit(commitments))}

    def _handle_masterOpen(self, params):
        evals = [_parse_fr(s) for s in params["evals"]]
        proofs = [_parse_g1(s) for s in params["proofs"]]
        beta = _parse_fr(params["beta"])
        z, (pi0, pi1) = self.backend.master_open(evals, proofs, beta)
        return {"z": _enc_fr(z), "pi_0": _enc_g1(pi0), "pi_1": _enc_g1(pi1)}

    def _handle_masterVerify(self, params):
        valid = self.backend.master_verify(
            _parse_g1(params["commitment"]),
            _parse_fr(params["beta"]),
            _parse_fr(params["alpha"]),
            _parse_fr(params["z"]),
            (_parse_g1(params["pi_0"]), _parse_g1(params["pi_1"])),
        )
        return {"valid": bool(valid)}

    # -- helpers -----------------------------------------------------------

    def _check_len(self, limbs: np.ndarray):
        if limbs.shape[-1] > self.backend.fft.T:
            raise ValueError("polynomial larger than sub-circuit size")

    def _pad(self, limbs: np.ndarray) -> np.ndarray:
        t = self.backend.fft.T
        if limbs.shape[-1] == t:
            return limbs
        pad = np.zeros((limbs.shape[0], t - limbs.shape[-1]), np.uint32)
        return np.concatenate([limbs, pad], axis=-1)


# Request-body bound: a full scale-22 single-machine worker polynomial is
# ~190 MB of base64; 1 GiB leaves headroom without letting a hostile
# Content-Length exhaust host memory.  Overridable for bigger deployments.
_MAX_BODY = int(os.environ.get("FOURIER_MAX_BODY", str(1 << 30)))


class _HTTPHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    rpc: RpcHandler = None  # type: ignore[assignment]

    def _serve(self):
        try:
            length = int(self.headers.get("Content-Length") or 0)
            if length > _MAX_BODY:
                payload = wire.serialize_result(
                    {"message": f"request body exceeds {_MAX_BODY} bytes"}
                )
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                # The oversize body is never read: close the connection
                # without draining.  A client still streaming the large
                # body may observe a connection reset before it reads
                # this envelope — acceptable for a size-cap defense
                # (the alternative, draining _MAX_BODY+ bytes, defeats
                # the cap's purpose).
                self.send_header("Connection", "close")
                self.end_headers()
                self.wfile.write(payload)
                self.close_connection = True
                return
            body = self.rfile.read(length) if length else b""
            logger.info("Received request")
            try:
                method, params = wire.parse_request(body)
                result = self.rpc.handle(method, params)
                payload = b"null" if result is None else wire.serialize_result(result)
                logger.debug("Sending back response %s", method)
            except Exception as e:  # error -> {"message": ...}, HTTP 200
                logger.error("Error: %s", e)
                payload = wire.serialize_result({"message": str(e)})
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
        except Exception as e:
            logger.error("Connection error: %s", e)

    do_GET = _serve
    do_POST = _serve

    def log_message(self, fmt, *args):  # route through our logger
        logger.debug("http: " + fmt, *args)


class Server:
    """Owns the backend and the listening socket (reference Server,
    src/rpc.rs:470-512)."""

    def __init__(self, cfg: ServerConfig):
        self.cfg = cfg
        self.httpd: ThreadingHTTPServer | None = None

    def _new_handler(self) -> RpcHandler:
        from ..utils.timing import timed

        backend = timed("start handler", lambda: PianoBackend.setup(self.cfg.backend))
        # Pre-build/load the serving executables before taking requests:
        # a warm restart then serves its first workerCommit in seconds
        # instead of paying trace+Mosaic+XLA at scale (no-op off-TPU;
        # FOURIER_AOT=0 disables).
        timed("warm executables", backend.warm_executables)
        return RpcHandler(backend)

    def run(self) -> None:
        logger.info("Starting RPC server...")
        handler_cls = type("BoundHandler", (_HTTPHandler,), {})
        addr = (self.cfg.host, self.cfg.port)
        self.httpd = ThreadingHTTPServer(addr, handler_cls)
        logger.info("Listening on: %s:%s", *addr)
        handler_cls.rpc = self._new_handler()
        self.httpd.serve_forever()

    def shutdown(self):
        if self.httpd:
            self.httpd.shutdown()


def start_rpc_server(cfg: ServerConfig, on_server=None) -> None:
    """Retry-forever loop (reference start_rpc_server, src/rpc.rs:514-521).

    `on_server` (optional) receives the Server instance before it runs —
    the handle a host embedding this loop needs to call shutdown().

    FOURIER_PROFILE=<dir> starts a jax profiler trace for the server's
    lifetime (xprof/tensorboard-readable) — the TPU analog of the
    reference's `tracing` subscriber + `timed` wall-clock logging
    (reference src/main.rs:25-28, src/utils.rs:1-8).
    """
    profile_dir = os.environ.get("FOURIER_PROFILE")
    if profile_dir:
        import jax

        try:
            jax.profiler.start_trace(profile_dir)
            logger.info("jax profiler trace -> %s", profile_dir)
        except Exception as e:
            logger.warning("profiler start failed: %s", e)
    server = Server(cfg)
    if on_server is not None:
        on_server(server)
    while True:
        try:
            server.run()
            return
        except Exception as e:
            logger.error("Error: %s", e)
            logger.info("Error starting server, retrying in 2 seconds...")
            time.sleep(2)
