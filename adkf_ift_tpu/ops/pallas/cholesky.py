"""Blocked Cholesky factorization as a single Pallas TPU kernel.

The GP layer Cholesky-factors (K + σ²I) on every MLL evaluation — the
O(n³) heart of the framework (SURVEY.md §2.4). XLA's `cholesky` lowering
serializes column-by-column at full matrix width; for the large-support
regimes (BO configs fit 512+ points, bo_utils.py) this kernel keeps the
whole matrix resident in VMEM and does the classic right-looking blocked
factorization:

    for k in blocks:                 (B = 128, MXU-native)
      L_kk   = chol(A_kk)            (in-register, 128 column steps)
      Y      = inv(L_kk)             (forward substitution, 128 steps)
      L_:k   = A_:k @ Y^T            (MXU)
      A_::   -= L_:k @ L_:k^T        (MXU syrk update)

One kernel launch total — on launch-latency-bound parts (remote TPU
tunnels) this also collapses the ~N sequential kernels XLA would emit.

`blocked_cholesky` pads to a 128 multiple (identity on the padded
diagonal) and falls back to jnp.linalg.cholesky for small matrices or
non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
# Below this size the XLA cholesky is fine and the VMEM residency buys
# nothing (FS-Mol support sets are <= 256; measured on v5e the crossover
# is above 512).
MIN_PALLAS_DIM = 1024
_HIGHEST = jax.lax.Precision.HIGHEST


def _factor_diag_and_invert(a_kk):
    """Unblocked Cholesky of a [B, B] SPD block + its inverse, with
    column-at-a-time updates expressed as full-block masked vector ops
    (no dynamic shapes). Returns (L_kk, inv(L_kk))."""
    b = a_kk.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)

    # Mosaic lowers neither dynamic_slice nor dynamic_update_slice on
    # VALUES: rows/columns are extracted by one-hot matvecs and written
    # back with masked selects instead.
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    idx_vec = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]

    def _mm(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    def col_step(j, l):
        e_j = (idx_vec == j).astype(a_kk.dtype)[None, :]  # one-hot row [1, b]
        lj_row = _mm(e_j, l)  # [1, b] = L[j, :] (cols < j finalized)
        s = _mm(l, lj_row.T)  # [b, 1]  Σ_{t<j} L[:,t] L[j,t]
        a_col = _mm(a_kk, e_j.T)  # [b, 1] = A[:, j]
        col = a_col - s  # [b, 1]
        diag = jnp.sqrt(jnp.maximum(_mm(e_j, col)[0, 0], 1e-20))
        rows2d = idx_vec[:, None]
        new_col = jnp.where(rows2d > j, col / diag, 0.0)
        new_col = jnp.where(rows2d == j, diag, new_col)
        return jnp.where(col_idx == j, new_col, l)

    l = jax.lax.fori_loop(0, b, col_step, jnp.zeros_like(a_kk))

    # Forward substitution for inv(L): solve L Y = I row by row.
    # Y[j, :] = (e_j - L[j, :j] @ Y[:j, :]) / L[j, j]
    def sub_step(j, y):
        e_j = (idx_vec == j).astype(a_kk.dtype)[None, :]  # [1, b]
        lj = _mm(e_j, l)  # [1, b]
        lj_masked = jnp.where(idx_vec[None, :] < j, lj, 0.0)
        rhs = e_j - _mm(lj_masked, y)  # [1, b]
        diag = _mm(lj, e_j.T)[0, 0]
        return jnp.where(row_idx == j, rhs / diag, y)

    y = jax.lax.fori_loop(0, b, sub_step, jnp.zeros_like(a_kk))
    return l, y


def _cholesky_kernel(a_ref, out_ref, *, nb: int):
    """Right-looking blocked Cholesky over an [nb*B, nb*B] VMEM matrix."""
    # Work in the output buffer: copy A in, factor in place.
    out_ref[:] = a_ref[:]

    def panel(k, _):
        k0 = k * BLOCK
        a_kk = out_ref[pl.ds(k0, BLOCK), pl.ds(k0, BLOCK)]
        l_kk, inv_kk = _factor_diag_and_invert(a_kk)
        out_ref[pl.ds(k0, BLOCK), pl.ds(k0, BLOCK)] = l_kk

        def below(i, _):
            i0 = i * BLOCK

            @pl.when(i > k)
            def _():
                a_ik = out_ref[pl.ds(i0, BLOCK), pl.ds(k0, BLOCK)]
                l_ik = jnp.dot(a_ik, inv_kk.T, preferred_element_type=jnp.float32)
                out_ref[pl.ds(i0, BLOCK), pl.ds(k0, BLOCK)] = l_ik

            return 0

        jax.lax.fori_loop(0, nb, below, 0)

        def update(i, _):
            i0 = i * BLOCK

            @pl.when(i > k)
            def _():
                l_ik = out_ref[pl.ds(i0, BLOCK), pl.ds(k0, BLOCK)]

                def update_j(j, _):
                    j0 = j * BLOCK

                    @pl.when((j > k) & (j <= i))
                    def _():
                        l_jk = out_ref[pl.ds(j0, BLOCK), pl.ds(k0, BLOCK)]
                        a_ij = out_ref[pl.ds(i0, BLOCK), pl.ds(j0, BLOCK)]
                        out_ref[pl.ds(i0, BLOCK), pl.ds(j0, BLOCK)] = a_ij - jnp.dot(
                            l_ik, l_jk.T, preferred_element_type=jnp.float32
                        )

                    return 0

                jax.lax.fori_loop(0, nb, update_j, 0)

            return 0

        jax.lax.fori_loop(0, nb, update, 0)
        return 0

    jax.lax.fori_loop(0, nb, panel, 0)

    # Zero the strict upper triangle (block-diagonal blocks already
    # lower-triangular; off-diagonal upper blocks hold stale syrk data).
    n = nb * BLOCK
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    out_ref[:] = jnp.where(rows >= cols, out_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_cholesky(a: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    n = a.shape[0]
    nb = n // BLOCK
    return pl.pallas_call(
        functools.partial(_cholesky_kernel, nb=nb),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a.astype(jnp.float32))


@jax.custom_vjp
def _chol_pallas_diff(a: jnp.ndarray) -> jnp.ndarray:
    return _pallas_cholesky(a, interpret=False)


def _chol_fwd(a):
    l = _pallas_cholesky(a, interpret=False)
    return l, l


def _chol_bwd(l, l_bar):
    """Standard Cholesky pullback from the factor (Murray 2016): with
    P = Phi(L^T Lbar) (lower triangle, halved diagonal),
    Abar = sym(L^{-T} P L^{-1}) — plain XLA triangular solves, so the
    kernel needs no backward of its own."""
    m = jnp.matmul(l.T, l_bar, precision=_HIGHEST)
    phi = jnp.tril(m) - 0.5 * jnp.diag(jnp.diag(m))
    # X = L^{-T} phi L^{-1}: solve L^T X1 = phi, then X L = X1 -> X = X1 L^{-1}
    x1 = jax.scipy.linalg.solve_triangular(l, phi, lower=True, trans=1)
    x = jax.scipy.linalg.solve_triangular(l, x1.T, lower=True, trans=1).T
    return (0.5 * (x + x.T),)


_chol_pallas_diff.defvjp(_chol_fwd, _chol_bwd)


def blocked_cholesky(a: jnp.ndarray, force: bool = False, interpret: bool | None = None) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix.

    Routes to the Pallas kernel on TPU for n >= MIN_PALLAS_DIM (padding
    to a BLOCK multiple with an identity diagonal), otherwise to
    jnp.linalg.cholesky. Differentiable on both routes (the kernel route
    carries a custom_vjp computing the standard Cholesky pullback from
    the factor with XLA triangular solves). `force` + `interpret` exist
    for testing.
    """
    n = a.shape[0]
    if not force and n < MIN_PALLAS_DIM:
        return jnp.linalg.cholesky(a)
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform not in ("tpu",)
        except Exception:  # noqa: BLE001
            interpret = True
    if not force and interpret:
        return jnp.linalg.cholesky(a)

    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    if n_pad != n:
        padded = jnp.eye(n_pad, dtype=jnp.float32).at[:n, :n].set(a)
    else:
        padded = a
    if interpret:
        l = _pallas_cholesky(padded, interpret=True)
    else:
        l = _chol_pallas_diff(padded)
    return l[:n, :n]
