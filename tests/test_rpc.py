"""Wire-format pinning + in-process server integration tests.

- The 11 raw JSON strings must survive parse->reserialize byte-identically,
  pinning the exact wire protocol (mirrors test_serialize_deserialize,
  reference src/rpc.rs:550-572).
- Multi-node is tested without a cluster: M+1 real HTTP servers on
  consecutive localhost ports sharing one setup file, driving the whole
  distributed protocol over real sockets (mirrors
  test_worker_commit_open_verify, reference src/rpc.rs:760-988).
"""

import json
import threading

import pytest
import requests

from fourier_tpu.constants import R
from fourier_tpu.models.piano import (
    PianoBackend,
    PianoFFTSettings,
    generate_trusted_setup,
)
from fourier_tpu.runtime import wire
from fourier_tpu.runtime.server import RpcHandler, _HTTPHandler
from http.server import ThreadingHTTPServer

RAW_REQUESTS = [
    '{"method":"ping"}',
    '{"method":"randomPoly"}',
    '{"method":"randomPoint"}',
    '{"method":"evaluate","params":{"poly":["123","456"],"x":"789"}}',
    '{"method":"workerCommit","params":{"i":0,"poly":["123","456"]}}',
    '{"method":"workerOpen","params":{"i":0,"poly":["123","456"],"x":"789"}}',
    '{"method":"workerVerify","params":{"i":0,"alpha":"123","proof":"456",'
    '"eval":"789","commitment":"abc"}}',
    '{"method":"masterCommit","params":{"commitments":["123","456"]}}',
    '{"method":"masterOpen","params":{"evals":["123","456"],"proofs":["789","abc"],'
    '"beta":"def"}}',
    '{"method":"masterVerify","params":{"commitment":"123","beta":"456",'
    '"alpha":"789","z":"abc","pi_0":"def","pi_1":"ghi"}}',
    '{"method":"fft","params":{"poly":["123","456"],"left":true,"inverse":false}}',
]


def test_wire_format_pinned():
    for raw in RAW_REQUESTS:
        method, params = wire.parse_request(raw)
        reserialized = wire.serialize_request(method, params)
        assert raw == reserialized


def test_unknown_method_rejected():
    with pytest.raises(ValueError):
        wire.parse_request('{"method":"prove","params":{}}')
    with pytest.raises(ValueError):
        wire.parse_request("not json")


SECRETS = (b"\x03" * 32, b"\x04" * 32)
SCALE = 6
MACHINES_SCALE = 2


@pytest.fixture(scope="module")
def backend():
    fft = PianoFFTSettings(SCALE, MACHINES_SCALE)
    settings = generate_trusted_setup(fft, SECRETS)
    return PianoBackend(fft, settings)


@pytest.fixture(scope="module")
def servers(backend):
    """M+1 servers on consecutive ports, all sharing one backend state
    (workers on PORT+i, validator on PORT+M, reference rpc.rs:866-875)."""
    n = (1 << MACHINES_SCALE) + 1
    httpds = []
    ports = []
    for k in range(n):
        handler_cls = type("H", (_HTTPHandler,), {"rpc": RpcHandler(backend)})
        httpd = ThreadingHTTPServer(("localhost", 0), handler_cls)
        ports.append(httpd.server_address[1])
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        httpds.append(httpd)
    yield ports
    for h in httpds:
        h.shutdown()


def _post(port, method, params=None):
    body = wire.serialize_request(method, params)
    resp = requests.post(f"http://localhost:{port}/", data=body, timeout=300)
    assert resp.status_code == 200
    return resp.json()


def test_handle_ping(servers):
    body = wire.serialize_request("ping")
    resp = requests.post(f"http://localhost:{servers[0]}/", data=body, timeout=60)
    assert resp.status_code == 200
    assert resp.json() is None  # RpcResult::Pong serializes as null


def test_generate_poly(servers):
    data = _post(servers[0], "randomPoly")
    assert len(data["poly"]) == 1 << MACHINES_SCALE
    assert len(data["poly"][0]) == 1 << (SCALE - MACHINES_SCALE)


def test_generate_point(servers):
    data = _post(servers[0], "randomPoint")
    assert isinstance(data["point"], str)
    assert len(wire.b64_decode(data["point"])) == 32


def test_evaluate(servers, backend):
    from fourier_tpu.refimpl.field import fr_to_bytes
    from fourier_tpu.refimpl.poly import poly_eval

    coeffs = [5, 7, 11]
    x = 13
    enc = [wire.b64_encode(fr_to_bytes(c)) for c in coeffs]
    data = _post(servers[0], "evaluate", {"poly": enc, "x": wire.b64_encode(fr_to_bytes(x))})
    from fourier_tpu.refimpl.field import fr_from_bytes

    assert fr_from_bytes(wire.b64_decode(data["y"])) == poly_eval(coeffs, x)


def test_error_response(servers):
    data = _post(servers[0], "workerCommit", {"i": 99, "poly": []})
    assert "message" in data


def test_adversarial_wire_inputs(servers):
    """Malformed and hostile request bodies must produce {"message": ...}
    (never a hang, crash, or bare 500) — the reference returns the same
    error envelope for every handler failure (src/rpc.rs:427-439)."""
    import json

    from fourier_tpu.constants import R
    from fourier_tpu.refimpl.field import fr_to_bytes

    ok_fr = wire.b64_encode(fr_to_bytes(5))
    non_canonical = wire.b64_encode(int(R).to_bytes(32, "big"))  # == r
    cases = [
        ("evaluate", {"poly": ["!!notbase64!!"], "x": ok_fr}),
        ("evaluate", {"poly": [ok_fr], "x": "AAAA"}),       # short scalar
        ("evaluate", {"poly": [non_canonical], "x": ok_fr}),
        ("workerCommit", {"i": 0, "poly": [non_canonical]}),
        ("workerCommit", {"i": 0, "poly": [ok_fr] * (1 << 10)}),  # > T
        ("workerVerify", {"i": 0, "commitment": "AA", "alpha": ok_fr,
                          "eval": ok_fr, "proof": "AA"}),
        ("masterCommit", {"commitments": ["%%%"]}),
    ]
    for method, params in cases:
        data = _post(servers[0], method, params)
        assert "message" in data, (method, data)
    # structurally invalid bodies (missing params, raw garbage) bypass
    # the client-side builders: post raw JSON
    raw_bodies = [
        b'{"method":"workerOpen","params":{"i":0,"poly":["AAAA"]}}',
        b'{"method":"fft","params":{"poly":[],"left":true}}',
        b'{"method":"workerCommit","params":{"i":"zero","poly":[]}}',
        b"\x00\xff{]",
    ]
    for body in raw_bodies:
        resp = requests.post(
            f"http://localhost:{servers[0]}/", data=body, timeout=60
        )
        assert "message" in resp.json(), body
    # the server is still healthy afterwards
    resp = requests.post(
        f"http://localhost:{servers[0]}/",
        data=wire.serialize_request("ping"), timeout=60,
    )
    assert resp.json() is None


def test_fft_param_types_rejected(servers):
    """left/inverse must be JSON booleans (serde-strict, like the
    reference's bool fields at src/rpc.rs:60-66)."""
    from fourier_tpu.refimpl.field import fr_to_bytes

    ok_fr = wire.b64_encode(fr_to_bytes(5))
    for left, inverse in (("yes", False), (True, 1), (0, False)):
        data = _post(
            servers[0], "fft",
            {"poly": [ok_fr], "left": left, "inverse": inverse},
        )
        assert "message" in data, (left, inverse)


def test_usize_param_types_rejected(servers):
    """The machine index must be a JSON unsigned integer: serde's usize
    rejects numeric strings, floats, bools, and negatives (reference
    src/rpc.rs:36-58) — coercible-but-wrongly-typed values included."""
    from fourier_tpu.refimpl.field import fr_to_bytes

    ok_fr = wire.b64_encode(fr_to_bytes(5))
    for bad_i in ("3", 3.0, True, -1, None, [0]):
        data = _post(servers[0], "workerCommit",
                     {"i": bad_i, "poly": [ok_fr]})
        assert "message" in data, bad_i
    # and i=0 (a genuine integer) still works
    data = _post(servers[0], "workerCommit", {"i": 0, "poly": [ok_fr]})
    assert "commitment" in data


def test_evaluate_large_poly(servers, backend):
    """The device power-ladder path (n > 2048) matches host Horner."""
    import numpy as np

    from fourier_tpu.refimpl.field import fr_from_bytes, fr_to_bytes
    from fourier_tpu.refimpl.poly import poly_eval

    rng = np.random.default_rng(7)
    n = 2048 + 37  # odd length exercises the zero-pad
    coeffs = [int(v) for v in rng.integers(0, 1 << 62, size=n)]
    x = 123456789
    enc = [wire.b64_encode(fr_to_bytes(c)) for c in coeffs]
    data = _post(servers[0], "evaluate",
                 {"poly": enc, "x": wire.b64_encode(fr_to_bytes(x))})
    assert fr_from_bytes(wire.b64_decode(data["y"])) == poly_eval(coeffs, x)


def test_oversized_body_rejected(servers, monkeypatch):
    """A hostile Content-Length beyond the bound gets the error envelope
    without the server buffering the body."""
    from fourier_tpu.runtime import server as srv

    monkeypatch.setattr(srv, "_MAX_BODY", 1024)
    body = b" " * 2048
    resp = requests.post(f"http://localhost:{servers[0]}/", data=body, timeout=60)
    assert resp.status_code == 200
    assert "message" in resp.json()
    # server still healthy
    resp = requests.post(
        f"http://localhost:{servers[0]}/",
        data=wire.serialize_request("ping"), timeout=60,
    )
    assert resp.json() is None


def test_distributed_flow_over_http(servers, backend, rng):
    """The full worker->master protocol over real sockets, workers on their
    own ports, validator on the last."""
    from fourier_tpu.refimpl.field import fr_from_bytes, fr_to_bytes

    m_count = 1 << MACHINES_SCALE
    worker_ports = servers[:m_count]
    validator = servers[m_count]

    def enc_fr(v):
        return wire.b64_encode(fr_to_bytes(v))

    rows = [
        [rng.randrange(R) for _ in range(backend.fft.T)] for _ in range(m_count)
    ]
    alpha, beta = rng.randrange(R), rng.randrange(R)

    commitments, evals, proofs = [], [], []
    for i in range(m_count):
        enc_poly = [enc_fr(v) for v in rows[i]]
        com = _post(worker_ports[i], "workerCommit", {"i": i, "poly": enc_poly})[
            "commitment"
        ]
        opened = _post(
            worker_ports[i],
            "workerOpen",
            {"i": i, "poly": enc_poly, "x": enc_fr(alpha)},
        )
        ver = _post(
            validator,
            "workerVerify",
            {
                "i": i,
                "alpha": enc_fr(alpha),
                "proof": opened["proof"],
                "eval": opened["eval"],
                "commitment": com,
            },
        )
        assert ver["valid"] is True
        commitments.append(com)
        evals.append(opened["eval"])
        proofs.append(opened["proof"])

    master_com = _post(validator, "masterCommit", {"commitments": commitments})[
        "commitment"
    ]
    mo = _post(
        validator,
        "masterOpen",
        {"evals": evals, "proofs": proofs, "beta": enc_fr(beta)},
    )
    mv = _post(
        validator,
        "masterVerify",
        {
            "commitment": master_com,
            "beta": enc_fr(beta),
            "alpha": enc_fr(alpha),
            "z": mo["z"],
            "pi_0": mo["pi_0"],
            "pi_1": mo["pi_1"],
        },
    )
    assert mv["valid"] is True

    # fft round trip over the wire
    enc_poly = [enc_fr(v) for v in rows[0]]
    f1 = _post(servers[0], "fft", {"poly": enc_poly, "left": True, "inverse": True})
    f2 = _post(
        servers[0], "fft", {"poly": f1["poly"], "left": True, "inverse": False}
    )
    assert [fr_from_bytes(wire.b64_decode(s)) for s in f2["poly"]] == rows[0]


def test_real_server_lifecycle(tmp_path, rng):
    """M+1 real Server instances booted through start_rpc_server — the full
    lifecycle (setup load at boot, listen, serve, shutdown), each server
    with its OWN backend loaded from a shared setup file (the reference
    integration test boots M+1 servers the same way, rpc.rs:760-988)."""
    import socket

    from fourier_tpu.models.piano import SetupConfig
    from fourier_tpu.runtime import io as rio
    from fourier_tpu.runtime.server import ServerConfig, start_rpc_server
    from fourier_tpu.refimpl.field import fr_to_bytes

    scale, mscale = 5, 1
    m_count = 1 << mscale
    fft = PianoFFTSettings(scale, mscale)
    settings = generate_trusted_setup(fft, (b"\x05" * 32, b"\x06" * 32))
    setup_file = str(tmp_path / "setup")
    rio.save_setup(settings, setup_file, compressed=True)

    def free_port():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    ports = [free_port() for _ in range(m_count + 1)]
    handles, threads = [], []
    for port in ports:
        cfg = ServerConfig(
            host="127.0.0.1",
            port=port,
            backend=SetupConfig(
                scale=scale,
                machines_scale=mscale,
                setup_path=setup_file,
                generate_setup=False,
                generate_precompute=True,
            ),
        )
        t = threading.Thread(
            target=start_rpc_server, args=(cfg, handles.append), daemon=True
        )
        t.start()
        threads.append(t)

    try:
        import time as _time

        deadline = _time.monotonic() + 120
        for port in ports:
            while True:
                try:
                    if _post(port, "ping") is None:
                        break
                except requests.ConnectionError:
                    if _time.monotonic() > deadline:
                        raise AssertionError(f"server on {port} never came up")
                    _time.sleep(0.5)

        def enc_fr(v):
            return wire.b64_encode(fr_to_bytes(v))

        rows = [[rng.randrange(R) for _ in range(fft.T)] for _ in range(m_count)]
        alpha = rng.randrange(R)
        for i in range(m_count):
            enc_poly = [enc_fr(v) for v in rows[i]]
            com = _post(ports[i], "workerCommit", {"i": i, "poly": enc_poly})[
                "commitment"
            ]
            opened = _post(
                ports[i], "workerOpen", {"i": i, "poly": enc_poly, "x": enc_fr(alpha)}
            )
            ver = _post(
                ports[m_count],
                "workerVerify",
                {
                    "i": i,
                    "alpha": enc_fr(alpha),
                    "proof": opened["proof"],
                    "eval": opened["eval"],
                    "commitment": com,
                },
            )
            assert ver["valid"] is True
        # all servers loaded the same setup: commitments must agree
        com0 = _post(ports[0], "workerCommit", {"i": 0, "poly": [enc_fr(v) for v in rows[0]]})
        com1 = _post(ports[1], "workerCommit", {"i": 0, "poly": [enc_fr(v) for v in rows[0]]})
        assert com0 == com1
    finally:
        for h in handles:
            h.shutdown()
        for t in threads:
            t.join(timeout=10)
    assert not any(t.is_alive() for t in threads)
