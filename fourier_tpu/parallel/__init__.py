"""Multi-chip + multi-host distribution: mesh helpers, sharded MSM,
distributed proving, jax.distributed cluster wiring.

The reference distributes by running one RPC server per machine and
having the client move data between them (SURVEY.md §2d, §5).  Inside a
TPU pod slice we instead map Pianist sub-provers onto mesh slots and
replace the client-orchestrated hop with on-device collectives
(all_gather of 48-byte-scale commitments over ICI/DCN); the external RPC
surface is unchanged.  See `mesh` (device meshes), `msm_sharded`
(point-axis MSM sharding), `prove_sharded` (the full prove round as one
SPMD program), and `multihost` (one process per host via
jax.distributed; fake-host CPU dryrun included).
"""
