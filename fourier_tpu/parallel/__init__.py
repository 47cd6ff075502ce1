"""Multi-chip sharding: mesh helpers, sharded MSM, distributed proving.

The reference distributes by running one RPC server per machine and
having the client move data between them (SURVEY.md §2d, §5).  Inside a
TPU pod slice we instead map Pianist sub-provers onto mesh slots and
replace the client-orchestrated hop with on-device collectives
(all_gather of 48-byte-scale commitments over ICI); the external RPC
surface is unchanged.
"""
