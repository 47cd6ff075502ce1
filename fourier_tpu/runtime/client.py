"""Python client: the L5 user-facing surface (reference fourier/fourier.py).

Mirrors the reference client's API one-for-one: RPCRequest builders
(fourier.py:18-96), a CLI subprocess manager (fourier.py:99-213), the
Client class (fourier.py:216-348), module-level convenience wrappers
(fourier.py:352-469), and the end-to-end `test_routine` that CI runs
directly (fourier.py:472-534).

The spawned server binary is this package's own CLI
(`python -m fourier_tpu run ...`) instead of a Rust binary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import List

import requests

DEFAULT_HOST = "127.0.0.1"
DEFAULT_PORT = 1337
DEFAULT_BIN = None  # None -> python -m fourier_tpu
DEFAULT_SETUP_PATH = "setup"
DEFAULT_PRECOMPUTE_PATH = "precompute"
DEFAULT_SKIP_PRECOMPUTE = False
DEFAULT_UNCOMPRESSED = False


class RPCRequest:
    """Request builders; wire shape pinned by the reference's serde test
    (reference src/rpc.rs:553-565)."""

    def __init__(self, method="ping", id=0, params=None):
        self.id = id
        self.method = method
        self.params = params
        self.jsonrpc = "2.0"

    def json(self):
        return json.dumps(self.__dict__)

    # UTILS
    @staticmethod
    def ping():
        return RPCRequest()

    @staticmethod
    def random_poly():
        return RPCRequest(method="randomPoly")

    @staticmethod
    def random_point():
        return RPCRequest(method="randomPoint")

    @staticmethod
    def evaluate(poly: List[str], x: str):
        return RPCRequest(method="evaluate", params={"poly": poly, "x": x})

    @staticmethod
    def fft(poly: List[str], left: bool, inverse: bool):
        return RPCRequest(
            method="fft", params={"poly": poly, "left": left, "inverse": inverse}
        )

    # WORKER METHODS
    @staticmethod
    def worker_commit(i: int, poly: List[str]):
        return RPCRequest(method="workerCommit", params={"i": i, "poly": poly})

    @staticmethod
    def worker_open(i: int, poly: List[str], x: str):
        return RPCRequest(
            method="workerOpen", params={"i": i, "poly": poly, "x": x}
        )

    @staticmethod
    def worker_verify(i: int, alpha: str, proof: str, eval: str, commitment: str):
        return RPCRequest(
            method="workerVerify",
            params={
                "i": i,
                "alpha": alpha,
                "proof": proof,
                "eval": eval,
                "commitment": commitment,
            },
        )

    # MASTER METHODS
    @staticmethod
    def master_commit(commitments: List[str]):
        return RPCRequest(
            method="masterCommit", params={"commitments": commitments}
        )

    @staticmethod
    def master_open(evals: List[str], proofs: List[str], beta: str):
        return RPCRequest(
            method="masterOpen",
            params={"evals": evals, "proofs": proofs, "beta": beta},
        )

    @staticmethod
    def master_verify(
        commitment: str, beta: str, alpha: str, z: str, pi_0: str, pi_1: str
    ):
        return RPCRequest(
            method="masterVerify",
            params={
                "commitment": commitment,
                "beta": beta,
                "alpha": alpha,
                "z": z,
                "pi_0": pi_0,
                "pi_1": pi_1,
            },
        )


def _default_cmd() -> List[str]:
    return [sys.executable, "-m", "fourier_tpu"]


class CLI:
    """Server subprocess manager (reference fourier.py:99-213)."""

    def __init__(self, bin=DEFAULT_BIN):
        if bin is not None and not os.path.exists(bin):
            print(f"Binary does not exist: {bin}")
            raise FileNotFoundError(bin)
        self.bin = bin
        self.process = None

    def cmd(self, args: List[str]):
        base = [self.bin] if self.bin else _default_cmd()
        return [*base, *args]

    def wait_until_running(self) -> bool:
        time.sleep(1)
        total_sleep = 0
        while not self.is_running():
            total_sleep += 1
            time.sleep(1)
            if total_sleep > 10:
                print("Failed to start process.")
                return False
        return True

    def run(
        self,
        host=None,
        port=None,
        scale=None,
        machines_scale=None,
        setup_path=None,
        precompute_path=None,
        uncompressed=None,
    ) -> bool:
        args = ["run"]
        if host:
            args.extend(["--host", host])
        if port:
            args.extend(["--port", str(port)])
        if scale:
            args.extend(["--scale", str(scale)])
        if setup_path:
            args.extend(["--setup-path", setup_path])
        if precompute_path:
            args.extend(["--precompute-path", precompute_path])
        if machines_scale:
            args.extend(["--machines-scale", str(machines_scale)])
        if uncompressed:
            args.append("--uncompressed")
        print(f"Running: {self.cmd(args)}")
        self.process = subprocess.Popen(args=self.cmd(args))
        return self.wait_until_running()

    def setup(
        self,
        setup_path=None,
        overwrite=False,
        scale=None,
        machines_scale=None,
        precompute_path=None,
        generate_setup=False,
        generate_precompute=False,
        uncompressed=False,
        compress_existing=False,
        decompress_existing=False,
    ):
        args = ["setup"]
        if setup_path:
            args.extend(["--setup-path", setup_path])
        if precompute_path:
            args.extend(["--precompute-path", precompute_path])
        if overwrite:
            args.append("--overwrite")
        if scale:
            args.extend(["--scale", str(scale)])
        if generate_setup:
            args.append("--generate-setup")
        if generate_precompute:
            args.append("--generate-precompute")
        if uncompressed:
            args.append("--uncompressed")
        if compress_existing:
            args.append("--compress-existing")
        if decompress_existing:
            args.append("--decompress-existing")
        if machines_scale:
            args.extend(["--machines-scale", str(machines_scale)])
        self.process = subprocess.Popen(args=self.cmd(args))
        return self.wait_until_running()

    def stop(self) -> bool:
        if self.is_running():
            self.process.terminate()
            try:
                self.process.wait(timeout=10)
            except subprocess.TimeoutExpired:
                self.process.kill()
        return self.is_running()

    def is_running(self):
        return self.process is not None and self.process.poll() is None


class Client:
    """HTTP client + server lifecycle (reference fourier.py:216-348)."""

    def __init__(
        self,
        setup_path=None,
        precompute_path=None,
        host=DEFAULT_HOST,
        port=DEFAULT_PORT,
        uncompressed=DEFAULT_UNCOMPRESSED,
        bin=DEFAULT_BIN,
    ):
        self.host = host
        self.port = port
        self.cli = CLI(bin=bin)
        self.setup_path = setup_path
        self.precompute_path = precompute_path
        self.uncompressed = uncompressed

    def endpoint(self):
        return f"http://{self.host}:{self.port}"

    def start_server(self, scale=None, machines_scale=None) -> bool:
        self.cli.run(
            host=self.host,
            port=self.port,
            setup_path=self.setup_path,
            precompute_path=self.precompute_path,
            scale=scale,
            machines_scale=machines_scale,
            uncompressed=self.uncompressed,
        )
        return self.cli.is_running()

    # reference names preserved
    start_rust = start_server

    def stop_server(self) -> bool:
        return self.cli.stop()

    stop_rust = stop_server

    def start(self, scale=None, machines_scale=None, timeout=300) -> bool:
        """Start the server and wait until it answers ping.

        Setup generation can take a while at large scale, so ping is polled
        (the reference used a single ping after a 1s sleep, fourier.py:258-268)."""
        if not self.start_server(scale=scale, machines_scale=machines_scale):
            return False
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                if self.ping().ok:
                    print("Server is running.")
                    return None  # reference returns None on success
            except requests.ConnectionError:
                pass
            if not self.cli.is_running():
                print("Server process exited.")
                return False
            time.sleep(0.5)
        print("Failed to ping server.")
        return False

    def stop(self):
        if not self.stop_server():
            return False
        print("Server stopped.")

    def post(self, req: RPCRequest) -> requests.Response:
        return requests.post(self.endpoint(), data=req.json())

    # UTILS
    def ping(self) -> requests.Response:
        return requests.post(self.endpoint(), data=RPCRequest.ping().json())

    def random_poly(self) -> requests.Response:
        return self.post(RPCRequest.random_poly())

    def random_point(self) -> requests.Response:
        return self.post(RPCRequest.random_point())

    def eval(self, poly, x) -> requests.Response:
        return self.post(RPCRequest.evaluate(poly, x))

    def fft(self, poly, left: bool, inverse: bool) -> requests.Response:
        return self.post(RPCRequest.fft(poly, left, inverse))

    # WORKER METHODS
    def worker_commit(self, i, poly) -> requests.Response:
        return self.post(RPCRequest.worker_commit(i, poly))

    def worker_open(self, i, poly, x) -> requests.Response:
        return self.post(RPCRequest.worker_open(i, poly, x))

    def worker_verify(self, i, proof, alpha, eval, commitment) -> requests.Response:
        return self.post(RPCRequest.worker_verify(i, alpha, proof, eval, commitment))

    # MASTER METHODS
    def master_commit(self, commitments) -> requests.Response:
        return self.post(RPCRequest.master_commit(commitments))

    def master_open(self, evals, proofs, beta) -> requests.Response:
        return self.post(RPCRequest.master_open(evals, proofs, beta))

    def master_verify(self, commitment, beta, alpha, z, pi_0, pi_1):
        return self.post(
            RPCRequest.master_verify(commitment, beta, alpha, z, pi_0, pi_1)
        )


# Module-level convenience wrappers (reference fourier.py:352-469)

def random_poly(rpc: Client):
    with rpc.random_poly() as resp:
        data = resp.json()
        if data.get("error") or data.get("message"):
            print(f"Error: {data.get('error') or data.get('message')}")
        return data.get("poly")


def random_point(rpc: Client):
    with rpc.random_point() as resp:
        data = resp.json()
        if data.get("error") or data.get("message"):
            print(f"Error: {data.get('error') or data.get('message')}")
        return data.get("point")


def eval_poly(rpc: Client, poly, x):
    with rpc.eval(poly, x) as resp:
        return resp.json().get("y")


def fft(rpc: Client, poly, left: bool, inverse: bool):
    with rpc.fft(poly, left, inverse) as resp:
        return resp.json().get("poly")


def worker_commit(rpc: Client, i, poly):
    with rpc.worker_commit(i, poly) as resp:
        return resp.json().get("commitment")


def worker_open(rpc: Client, i, poly, x):
    with rpc.worker_open(i, poly, x) as resp:
        data = resp.json()
        return data.get("eval"), data.get("proof")


def worker_verify(rpc: Client, i, proof, alpha, eval, commitment):
    with rpc.worker_verify(i, proof, alpha, eval, commitment) as resp:
        return resp.json().get("valid")


def worker_commit_and_open(rpc: Client, i, poly, alpha):
    commitment = worker_commit(rpc, i, poly)
    eval, proof = worker_open(rpc, i, poly, alpha)
    return commitment, eval, proof


def master_commit(rpc: Client, commitments):
    with rpc.master_commit(commitments) as resp:
        return resp.json().get("commitment")


def master_open(rpc: Client, evals, proofs, beta):
    with rpc.master_open(evals, proofs, beta) as resp:
        data = resp.json()
        return data.get("z"), data.get("pi_0"), data.get("pi_1")


def master_verify(rpc: Client, commitment, beta, alpha, z, pi_0, pi_1):
    with rpc.master_verify(commitment, beta, alpha, z, pi_0, pi_1) as resp:
        return resp.json().get("valid")


def test_routine(
    host: str = DEFAULT_HOST,
    port: int = DEFAULT_PORT,
    setup_path: str = None,
    precompute_path: str = None,
    uncompressed: bool = True,
    bin: str = DEFAULT_BIN,
    scale: int = 6,
    machines_scale: int = 2,
):
    """End-to-end driver, the CI-blessed flow (reference fourier.py:472-534).

    Behavioral note preserved from the reference (SURVEY.md §3.5): the
    client IFFTs each row (left=True, inverse=True) and feeds the
    *standard-basis* rows to workerCommit/workerOpen.  Commit and open use
    the same basis, so worker and master proofs verify all the same.
    """
    rpc = Client(
        host=host,
        port=port,
        bin=bin,
        setup_path=setup_path,
        precompute_path=precompute_path,
        uncompressed=uncompressed,
    )
    n_workers = 2**machines_scale
    try:
        rpc.start(scale=scale, machines_scale=machines_scale)

        f, alpha, beta = random_poly(rpc), random_point(rpc), random_point(rpc)
        worker_polys = [
            fft(rpc, f[i], left=True, inverse=True) for i in range(n_workers)
        ]

        commitments, evals, proofs = [], [], []
        for i in range(n_workers):
            print(f"Querying worker {i}")
            commitment, eval, proof = worker_commit_and_open(
                rpc, i, worker_polys[i], alpha
            )
            valid = worker_verify(rpc, i, proof, alpha, eval, commitment)
            assert valid
            print(f"Worker {i} submitted valid proof.")
            commitments.append(commitment)
            evals.append(eval)
            proofs.append(proof)

        print("Assembling master proof.")
        master_commitment = master_commit(rpc, commitments)
        z, pi_0, pi_1 = master_open(rpc, evals, proofs, beta)
        valid = master_verify(rpc, master_commitment, beta, alpha, z, pi_0, pi_1)
        assert valid
        print("Proof is valid.")
    finally:
        rpc.stop()


if __name__ == "__main__":
    os.environ.setdefault("FOURIER_LOG", "debug")
    test_routine(host="localhost", port=1337)
