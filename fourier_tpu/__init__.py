"""fourier_tpu — a TPU-native distributed KZG polynomial-commitment framework.

A from-scratch JAX/XLA/Pallas implementation of the Pianist/PIANO bivariate
KZG scheme over BLS12-381, with the same capabilities and wire protocol as
the reference system (apollozkp/fourier): master/worker distributed proving
behind a JSON-RPC HTTP API, trusted-setup generation and persistence, and a
Python client.

Layer map (top to bottom), mirroring SURVEY.md §1:
  L5  runtime.client   — Python Client + e2e test routine
  L4  runtime.cli      — `fourier-tpu setup|run` command line
  L3  runtime.server   — JSON-RPC HTTP server (11 wire methods)
  L2  models.piano     — PIANO protocol: setup / commit / open / verify
  L1  ops.*            — TPU kernels: limb field arithmetic, NTT, curve, MSM
      refimpl.*        — exact Python ground truth + verify-side pairings
      parallel.*       — multi-chip sharding (jax.sharding / shard_map)
"""

__version__ = "0.1.0"
