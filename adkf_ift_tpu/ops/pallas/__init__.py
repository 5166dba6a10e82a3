"""Pallas TPU kernels (SURVEY.md §7 design delta #6): the fused
message-passing kernel (ops/pallas/message_passing.py) that powers the
default dense-layout encoder path.

A blocked VMEM-resident Cholesky kernel for large-support GP fits lived
here through round 2; it was REMOVED after device benchmarks showed it
statistically tied with XLA's cholesky at the BO support sizes it was
written for (n=512: 0.97x, n=1024: 1.02x — docs/CHOLESKY_BENCH.md) and
exceeded the 16 MB scoped-VMEM limit at n=2048. gp/exact uses
jnp.linalg.cholesky everywhere.
"""
