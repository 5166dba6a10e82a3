"""Pallas TPU kernels (SURVEY.md §7 design delta #6): blocked Cholesky
for large-support GP fits; kernels fall back to XLA when Pallas is
unavailable (CPU tests run in interpret mode)."""

from adkf_ift_tpu.ops.pallas.cholesky import blocked_cholesky

__all__ = ["blocked_cholesky"]
