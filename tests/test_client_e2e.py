"""Python end-to-end: spawn the real server binary via the client and run the
full distributed routine over HTTP (the CI gate flow, reference
fourier.py:472-534 + ci.yml:70-71)."""

import os
import socket

import pytest

from fourier_tpu.runtime.client import test_routine


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.e2e
def test_python_e2e(tmp_path, monkeypatch):
    # the spawned server inherits the environment: force CPU + shared
    # compile cache so the subprocess doesn't grab TPU hardware in CI.
    # (FOURIER_PLATFORM because some plugins ignore JAX_PLATFORMS.)
    # monkeypatch scopes the mutation to this test (xdist workers share
    # a process across tests).
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("FOURIER_PLATFORM", "cpu")
    if "FOURIER_XLA_CACHE" not in os.environ:
        monkeypatch.setenv("FOURIER_XLA_CACHE", "/root/.cache/jax_test_cache")
    test_routine(
        host="127.0.0.1",
        port=_free_port(),
        scale=6,
        machines_scale=2,
    )
