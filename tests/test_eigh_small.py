"""eigh_small (unrolled Jacobi) vs jnp.linalg.eigh on the sizes the GP
inner loop actually uses (3-param non-ARD Hessians; up to 16 for the
auto-method dispatch boundary)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adkf_ift_tpu.ops.eigh_small import eigh_small


@pytest.mark.parametrize("d", [2, 3, 8, 16])
def test_matches_reference_eigh(d):
    rng = np.random.RandomState(d)
    a = rng.randn(5, d, d).astype(np.float32)
    a = (a + np.swapaxes(a, -1, -2)) / 2
    lam, vecs = eigh_small(jnp.asarray(a))
    lam_ref = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.asarray(lam), lam_ref, atol=2e-5)
    # Eigen-equation + orthonormality (eigenvectors themselves are only
    # defined up to sign/degenerate rotation).
    av = np.einsum("bij,bjk->bik", a, np.asarray(vecs))
    vl = np.asarray(vecs) * np.asarray(lam)[:, None, :]
    np.testing.assert_allclose(av, vl, atol=5e-5)
    vtv = np.einsum("bij,bik->bjk", np.asarray(vecs), np.asarray(vecs))
    np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(d), (5, d, d)), atol=2e-5)


def test_repeated_eigenvalues_and_diagonal():
    # Degenerate spectra: identity and a diagonal with ties must not NaN.
    for a in (np.eye(3), np.diag([2.0, 2.0, -1.0]), np.zeros((3, 3))):
        lam, vecs = eigh_small(jnp.asarray(a, jnp.float32))
        assert np.isfinite(np.asarray(lam)).all()
        np.testing.assert_allclose(np.sort(np.linalg.eigvalsh(a)),
                                   np.asarray(lam), atol=1e-6)
        vtv = np.asarray(vecs).T @ np.asarray(vecs)
        np.testing.assert_allclose(vtv, np.eye(3), atol=1e-5)


def test_vmap_and_scan_compatible():
    rng = np.random.RandomState(0)
    a = rng.randn(4, 3, 3).astype(np.float32)
    a = (a + np.swapaxes(a, -1, -2)) / 2
    lam_v, _ = jax.vmap(eigh_small)(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(lam_v), np.linalg.eigvalsh(a), atol=2e-5)


def test_newton_still_converges_with_jacobi_eigh():
    """The saddle-free Newton path must still reach the quadratic's
    minimum. (The eigh_small wiring was measured as a bench regression
    and reverted — Newton uses jnp.linalg.eigh; ops/eigh_small.py keeps
    the note — but this convergence pin stays valid either way.)"""
    from adkf_ift_tpu.gp.fit import LBFGSConfig, newton_minimize

    def quad(x):
        return jnp.sum((x - 1.5) ** 2) + x[0] * x[1] * 0.1

    res = newton_minimize(quad, jnp.zeros(3), LBFGSConfig(newton_iters=12))
    assert float(res.grad_norm) < 1e-4
