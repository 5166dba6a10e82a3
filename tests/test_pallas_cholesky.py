"""Blocked Pallas Cholesky vs jnp.linalg.cholesky (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from adkf_ift_tpu.ops.pallas.cholesky import blocked_cholesky


def _spd(n, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(n, n).astype(np.float32)
    return a @ a.T + n * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n", [128, 256, 384])
def test_blocked_cholesky_matches_xla(n):
    a = _spd(n, seed=n)
    ours = np.asarray(blocked_cholesky(jnp.asarray(a), force=True, interpret=True))
    ref = np.asarray(jnp.linalg.cholesky(jnp.asarray(a)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
    # Reconstruction check (tighter than factor comparison).
    np.testing.assert_allclose(ours @ ours.T, a, rtol=2e-3, atol=2e-1)


def test_blocked_cholesky_pads_non_multiple():
    n = 200  # not a multiple of 128
    a = _spd(n, seed=7)
    ours = np.asarray(blocked_cholesky(jnp.asarray(a), force=True, interpret=True))
    assert ours.shape == (n, n)
    np.testing.assert_allclose(ours @ ours.T, a, rtol=2e-3, atol=2e-1)


def test_small_matrices_route_to_xla():
    a = _spd(64, seed=1)
    out = np.asarray(blocked_cholesky(jnp.asarray(a)))
    ref = np.asarray(jnp.linalg.cholesky(jnp.asarray(a)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_cholesky_custom_vjp_formula_matches_xla():
    """The kernel route's custom_vjp pullback (Phi formula with triangular
    solves) must match jax's cholesky VJP exactly."""
    import jax
    import jax.numpy as jnp

    from adkf_ift_tpu.ops.pallas.cholesky import _chol_bwd

    rng = np.random.RandomState(5)
    n = 96
    b = rng.randn(n, n).astype(np.float32) / np.sqrt(n)
    a = jnp.asarray(b @ b.T + 1e-1 * np.eye(n, dtype=np.float32))
    l_bar = jnp.asarray(rng.randn(n, n).astype(np.float32))

    l, vjp = jax.vjp(jnp.linalg.cholesky, a)
    (want,) = vjp(l_bar)
    (got,) = _chol_bwd(l, l_bar)
    # jax's pullback returns the non-symmetrized cotangent for the
    # (symmetric) input; both are valid pullbacks of the same function on
    # the symmetric subspace — compare symmetrized.
    want_s = 0.5 * (want + want.T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_s), rtol=2e-4, atol=2e-4)
