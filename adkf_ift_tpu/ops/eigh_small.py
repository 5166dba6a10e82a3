"""Branch-free symmetric eigendecomposition for TINY matrices.

`jnp.linalg.eigh` lowers to XLA's general iterative eigensolver, which
on TPU costs hundreds of sequential ops regardless of matrix size — but
the saddle-free Newton inner fit (gp/fit.py) and the dense IFT Hessian
solve (gp/ift.py) call it on 3×3 (non-ARD) hyperparameter Hessians
inside a `lax.scan`, ~130 times per outer step at the bench
configuration. For d ≤ 16 a statically-unrolled cyclic Jacobi sweep is
exact to machine precision in O(d² · sweeps) fully-vectorizable
elementwise ops with NO data-dependent control flow, so it fuses into
the surrounding computation and vmaps across tasks for free.

No reference counterpart: the reference's inner fits run scipy on the
host (fs_mol/utils/adaptive_dkt_utils.py:91); this file exists because
the compiled TPU inner loop made tiny-eigh latency visible.

MEASURED RESULT (round 4, v5e bench): swapping this into the Newton
scan + IFT dense solve took the outer step 2.01 -> 1.83 steps/s — XLA's
eigh custom call is FASTER there than ~50 unrolled rotation ops, so the
hot paths keep jnp.linalg.eigh and this op stays available for
contexts where a fusable, control-flow-free eigh matters more than raw
latency (e.g. inside Pallas-adjacent code or vmapped-many-tiny-problem
settings).

Not differentiated through (both call sites sit inside custom_vjp
forward/backward rules), and not ordered by magnitude: eigenvalues are
returned ASCENDING like jnp.linalg.eigh, via an argsort on d lanes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax


@functools.partial(jnp.vectorize, signature="(d,d)->(d),(d,d)")
def _jacobi_eigh(a: jnp.ndarray):
    d = a.shape[-1]
    dtype = a.dtype
    eye = jnp.eye(d, dtype=dtype)
    v = eye
    # Fixed sweep count: cyclic Jacobi converges quadratically; for
    # d <= 16, 8 sweeps reach ~machine precision (tests pin vs
    # jnp.linalg.eigh at 1e-6 f32 / 1e-12 f64).
    sweeps = 8
    tiny = jnp.asarray(1e-30, dtype)
    for _ in range(sweeps):
        for p in range(d - 1):
            for q in range(p + 1, d):
                app = a[p, p]
                aqq = a[q, q]
                apq = a[p, q]
                # Classic Jacobi rotation, guarded for apq ~ 0 (t -> 0,
                # c -> 1, s -> 0: identity rotation, branch-free).
                theta = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < tiny, tiny, apq))
                sign_t = jnp.where(theta >= 0.0, 1.0, -1.0).astype(dtype)
                t = sign_t / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
                t = jnp.where(jnp.abs(apq) < tiny, jnp.zeros((), dtype), t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                # G = I with [p,p]=c, [q,q]=c, [p,q]=s, [q,p]=-s  (static
                # indices: scatter-free construction via one-hot outer
                # products).
                ep = eye[p]
                eq = eye[q]
                g = (
                    eye
                    + (c - 1.0) * (jnp.outer(ep, ep) + jnp.outer(eq, eq))
                    + s * jnp.outer(ep, eq)
                    - s * jnp.outer(eq, ep)
                )
                a = g.T @ a @ g
                v = v @ g
    lam = jnp.diagonal(a)
    order = jnp.argsort(lam)
    return lam[order], v[:, order]


def eigh_small(a: jnp.ndarray):
    """Drop-in for jnp.linalg.eigh on small symmetric matrices
    ([..., d, d] with d <= 16): -> (eigenvalues ascending [..., d],
    eigenvectors as columns [..., d, d]). Falls back to jnp.linalg.eigh
    above d=16 (where the unrolled sweep's O(d²) pair loop stops being a
    win and XLA's blocked solver is appropriate)."""
    d = a.shape[-1]
    if d > 16:
        return jnp.linalg.eigh(a)
    # Symmetrize like eigh (uses the lower triangle; we average) so both
    # paths see identical inputs.
    a = (a + jnp.swapaxes(a, -1, -2)) * 0.5
    return _jacobi_eigh(a)
