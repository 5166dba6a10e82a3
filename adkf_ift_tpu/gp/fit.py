"""Fully-compiled inner-loop optimizer for GP hyperparameters.

Replaces the reference's per-task scipy L-BFGS-B round-trip
(botorch fit_gpytorch_scipy called at fs_mol/utils/adaptive_dkt_utils.py:91
and siblings) with a fixed-iteration L-BFGS + Armijo backtracking written
entirely in lax.scan, so the fit jits, vmaps over a task batch, and runs
on-device with zero host synchronization.

The optimized parameter vector is tiny (3 scalars without ARD, ~2050
with ARD — SURVEY.md §2.9), so per-iteration cost is dominated by the
O(n³) Cholesky inside each MLL evaluation; a fixed iteration budget with
convergence masking wastes only masked lanes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from adkf_ift_tpu.gp.exact import ExactGPConfig, marginal_log_likelihood
from adkf_ift_tpu.gp.kernels import KernelConfig


@dataclass(frozen=True)
class LBFGSConfig:
    max_iters: int = 48
    history: int = 8
    grad_tol: float = 1e-5
    # Parallel line-search ladder: candidate steps 2^max_growth .. 2^-max_backtrack,
    # all evaluated in ONE vmapped (batched-Cholesky) call per iteration; the
    # largest step satisfying Armijo wins. Sequential backtracking would chain
    # ~20 small Choleskys per iteration — on TPU a single batched factorization
    # is dramatically cheaper in wall-clock.
    max_growth: int = 6
    max_backtrack: int = 16
    armijo_c1: float = 1e-4
    # "auto" (default): saddle-free damped Newton for tiny (<=16-dim)
    # non-ARD hyperparameter problems — converges in ~1/3 the iterations
    # with ~10x fewer sequential ops and is the configuration behind every
    # measured headline number (BENCH_r02) — and L-BFGS above that (ARD:
    # dense Hessians scale as d^2). "lbfgs"/"newton" force one method.
    method: str = "auto"
    newton_iters: int = 16
    newton_damping: float = 1e-6
    # IFT backward solve budget for ARD-width problems (gp/ift.py): CG on
    # f64 Hessian-vector products stops at min(ift_cg_iters, convergence
    # at ift_cg_tol). f64 HVPs are emulated on TPU — this budget is the
    # ARD backward's dominant sequential cost, so it is a tuning knob.
    # 400 covers the measured worst case: on hard ARD instances CG needs
    # ~333 iterations to reach 1e-5, and the previous 100-iteration
    # default left 70-97% relative hypergradient error there, while
    # warm-started instances converge in ~4 iterations and exit early
    # (benchmarks/ard_cpu_probe.py; a Jacobi/Hutchinson preconditioner
    # was tried and made the hard case worse — see gp/ift.py).
    ift_cg_iters: int = 400
    ift_cg_tol: float = 1e-5

    def resolve_method(self, dim: int) -> str:
        """Concrete method for a `dim`-parameter inner problem."""
        if self.method == "auto":
            return "newton" if dim <= 16 else "lbfgs"
        return self.method


class LBFGSResult(NamedTuple):
    x: jnp.ndarray
    value: jnp.ndarray
    grad_norm: jnp.ndarray
    iterations: jnp.ndarray


def newton_minimize(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    config: LBFGSConfig = LBFGSConfig(),
) -> LBFGSResult:
    """Damped Newton with the same parallel Armijo ladder.

    For the non-ARD GP inner problem (3 raw scalars) the dense Hessian
    is 3×3 — forward-over-reverse per iteration is cheap, quadratic
    convergence needs ~8-16 iterations, and each iteration is a handful
    of fused ops instead of L-BFGS's two-loop machinery.

    SADDLE-FREE: plain (damped) Newton is attracted to ANY stationary
    point, and measured inner fits on real training trajectories
    'converged' onto saddles (inner-Hessian eigenvalues down to -7e3 at
    grad ~1e-3 — benchmarks/ift_stability.py), which breaks the IFT
    hypergradient's assumption that theta* is a minimum and destabilized
    full-IFT meta-training. The step therefore preconditions by the
    eigendecomposition with |eigenvalues| (Dauphin et al.'s saddle-free
    Newton — repels negative-curvature stationary points, identical to
    Newton near a minimum), walks the most-negative eigenvector when the
    gradient vanishes at indefinite curvature, and does not declare
    convergence while the Hessian has a significantly negative
    eigenvalue. The reference never faces this: scipy L-BFGS-B
    (fsmol gp fits) is descent-only."""
    d = x0.shape[0]
    value_and_grad = jax.value_and_grad(fun)
    hess = jax.jacfwd(jax.grad(fun))

    ladder = jnp.asarray(
        [2.0**j for j in range(config.max_growth, -config.max_backtrack - 1, -1)],
        x0.dtype,
    )

    def linesearch(x, f, grad, direction):
        dg = jnp.dot(grad, direction)
        trials = x[None, :] + ladder[:, None] * direction[None, :]
        f_trials = jax.vmap(fun)(trials)
        ok = jnp.isfinite(f_trials) & (f_trials <= f + config.armijo_c1 * ladder * dg)
        any_ok = jnp.any(ok)
        best_step = jnp.where(any_ok, ladder[jnp.argmax(ok)], 0.0)
        return best_step, any_ok

    f0, g0 = value_and_grad(x0)

    def step(carry, _):
        x, f, grad, lam, vecs, converged, iters = carry
        lam_abs = jnp.maximum(jnp.abs(lam), config.newton_damping)
        # Saddle-free Newton direction: -V |L|^-1 V^T g — a strict
        # descent direction whenever grad != 0.
        direction = -(vecs @ ((vecs.T @ grad) / lam_abs))
        # Negative-curvature escape: at an (approximate) saddle the
        # gradient — and with it the step above — vanishes; move along
        # the most-negative eigenvector instead (downhill sign; with
        # grad ~ 0 the Armijo test accepts whichever sign lowers f).
        # The direction is scaled so the line-search ladder's LARGEST
        # trial is a unit move in raw-parameter space: with dg ~ 0 the
        # Armijo test accepts any non-increase, and an unbounded 2^k
        # jump along a flat/negative direction can land on degenerate
        # hyperparameters (noise -> 0 => singular K) that technically
        # lower the inner loss (observed: meta-training arms diverged).
        v0 = vecs[:, 0]
        nc = v0 * jnp.where(jnp.dot(v0, grad) > 0.0, -1.0, 1.0)
        nc = nc * (2.0 ** (-config.max_growth))
        indefinite = lam[0] < -1e3 * config.newton_damping
        at_saddle = indefinite & (
            jnp.linalg.norm(direction) < 1e2 * config.grad_tol
        )
        direction = jnp.where(at_saddle, nc, direction)
        descent = jnp.isfinite(jnp.dot(grad, direction)) & (
            jnp.dot(grad, direction) <= 0.0
        )
        direction = jnp.where(descent, direction, -grad)

        step_size, ls_ok = linesearch(x, f, grad, direction)
        x_new = x + step_size * direction
        f_new, g_new = value_and_grad(x_new)
        moved = ls_ok & ~converged
        x_new = jnp.where(moved, x_new, x)
        f_new = jnp.where(moved, f_new, f)
        g_new = jnp.where(moved, g_new, grad)
        # NOTE: an unrolled-Jacobi eigh for these 3x3 Hessians
        # (ops/eigh_small.py) was MEASURED SLOWER end-to-end on the v5e
        # (2.01 -> 1.83 steps/s, round 4): XLA's eigh custom call beats
        # ~50 tiny unrolled matmul/rotation ops inside this scan. Kept
        # out of the hot path on that evidence.
        lam_new, vecs_new = jnp.linalg.eigh(hess(x_new))
        grad_norm = jnp.max(jnp.abs(g_new))
        # Don't declare convergence on a saddle (small gradient but
        # significantly indefinite curvature) — keep escaping instead.
        stationary_min = (grad_norm < config.grad_tol) & (
            lam_new[0] > -1e3 * config.newton_damping
        )
        converged = converged | stationary_min | ~ls_ok
        iters = iters + jnp.where(converged, 0, 1)
        return (x_new, f_new, g_new, lam_new, vecs_new, converged, iters), None

    lam0, vecs0 = jnp.linalg.eigh(hess(x0))
    converged0 = (jnp.max(jnp.abs(g0)) < config.grad_tol) & (
        lam0[0] > -1e3 * config.newton_damping
    )
    init = (x0, f0, g0, lam0, vecs0, converged0, jnp.zeros((), jnp.int32))
    # Early-exit while_loop instead of a fixed-trip scan: measured fits
    # at the bench configuration converge in 7-10 of the 16 budgeted
    # iterations, and post-convergence iterations are exact no-ops
    # (`moved` masks every update), so the result is bit-identical while
    # the sequential chain shortens ~40%. Legal because every caller
    # sits inside a custom_vjp (never reverse-differentiated through);
    # under vmap, the loop runs until the SLOWEST task in the chunk
    # converges (converged lanes stay no-ops).

    def cond_fn(state):
        carry, k = state
        return (k < config.newton_iters) & ~jnp.all(carry[5])

    def body_fn(state):
        carry, k = state
        new_carry, _ = step(carry, None)
        return new_carry, k + 1

    (x, f, g, _, _, _, iters), _ = jax.lax.while_loop(
        cond_fn, body_fn, (init, jnp.zeros((), jnp.int32))
    )
    return LBFGSResult(x=x, value=f, grad_norm=jnp.max(jnp.abs(g)), iterations=iters)


def minimize(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    config: LBFGSConfig = LBFGSConfig(),
) -> LBFGSResult:
    """Dispatch on config.method ('auto' | 'lbfgs' | 'newton'). x0's
    (static) length decides 'auto'."""
    if config.resolve_method(int(x0.shape[-1])) == "newton":
        return newton_minimize(fun, x0, config)
    return lbfgs_minimize(fun, x0, config)


def lbfgs_minimize(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    config: LBFGSConfig = LBFGSConfig(),
) -> LBFGSResult:
    """Minimize `fun` (R^d -> R) from x0 with bounded-memory L-BFGS.

    Fixed trip count (lax.scan) with a convergence mask so the whole
    routine is jittable and vmappable. Non-finite trial values are
    rejected by the backtracking line search, which makes the fit robust
    to the hard boundary regions of the raw-parameter space.
    """
    d = x0.shape[0]
    m = config.history
    value_and_grad = jax.value_and_grad(fun)

    def two_loop(grad, s_hist, y_hist, rho_hist, head, count):
        """Standard L-BFGS two-loop recursion over a circular buffer."""
        q = grad
        idxs = (head - 1 - jnp.arange(m)) % m  # newest -> oldest
        valid = jnp.arange(m) < count

        def bwd(carry, i):
            q, alphas = carry
            v = valid[i]
            s, y, rho = s_hist[idxs[i]], y_hist[idxs[i]], rho_hist[idxs[i]]
            alpha = jnp.where(v, rho * jnp.dot(s, q), 0.0)
            q = q - alpha * y * jnp.where(v, 1.0, 0.0)
            alphas = alphas.at[i].set(alpha)
            return (q, alphas), None

        (q, alphas), _ = jax.lax.scan(bwd, (q, jnp.zeros(m, x0.dtype)), jnp.arange(m))

        # Initial Hessian scaling gamma = s·y / y·y of the newest pair.
        newest = idxs[0]
        sy = jnp.dot(s_hist[newest], y_hist[newest])
        yy = jnp.dot(y_hist[newest], y_hist[newest])
        gamma = jnp.where(count > 0, sy / jnp.maximum(yy, 1e-20), 1.0)
        r = gamma * q

        def fwd(r, i):
            j = m - 1 - i  # oldest -> newest
            v = valid[j]
            s, y, rho = s_hist[idxs[j]], y_hist[idxs[j]], rho_hist[idxs[j]]
            beta = jnp.where(v, rho * jnp.dot(y, r), 0.0)
            r = r + (alphas[j] - beta) * s * jnp.where(v, 1.0, 0.0)
            return r, None

        r, _ = jax.lax.scan(fwd, r, jnp.arange(m))
        return r

    # Static step ladder, largest first.
    ladder = jnp.asarray(
        [2.0**j for j in range(config.max_growth, -config.max_backtrack - 1, -1)],
        x0.dtype,
    )

    def linesearch(x, f, grad, direction):
        """Parallel Armijo line search: evaluate every candidate step in one
        batched call, accept the largest step satisfying the Armijo condition."""
        dg = jnp.dot(grad, direction)
        trials = x[None, :] + ladder[:, None] * direction[None, :]
        f_trials = jax.vmap(fun)(trials)
        ok = jnp.isfinite(f_trials) & (f_trials <= f + config.armijo_c1 * ladder * dg)
        any_ok = jnp.any(ok)
        first_ok = jnp.argmax(ok)  # ladder is descending => largest accepted step
        best_step = jnp.where(any_ok, ladder[first_ok], 0.0)
        return best_step, any_ok

    f0, g0 = value_and_grad(x0)

    def step(carry, _):
        x, f, grad, s_hist, y_hist, rho_hist, head, count, converged, iters = carry

        direction = -two_loop(grad, s_hist, y_hist, rho_hist, head, count)
        # Fall back to steepest descent if the direction is not a descent
        # direction (can happen with a stale/degenerate history).
        descent = jnp.dot(grad, direction) < 0.0
        direction = jnp.where(descent, direction, -grad)
        # First iteration (empty history): trust-region-style scaling so a
        # huge initial gradient cannot poison the curvature history with a
        # microscopic backtracked pair.
        first_scale = 1.0 / jnp.maximum(1.0, jnp.max(jnp.abs(direction)))
        direction = jnp.where(count == 0, direction * first_scale, direction)

        step_size, ls_ok = linesearch(x, f, grad, direction)
        x_new = x + step_size * direction
        f_new, g_new = value_and_grad(x_new)

        moved = ls_ok & ~converged
        x_new = jnp.where(moved, x_new, x)
        f_new = jnp.where(moved, f_new, f)
        g_new = jnp.where(moved, g_new, grad)

        s = x_new - x
        y = g_new - grad
        sy = jnp.dot(s, y)
        store = moved & (sy > 1e-10)
        rho = jnp.where(store, 1.0 / jnp.where(store, sy, 1.0), 0.0)
        s_hist = jnp.where(store, s_hist.at[head].set(s), s_hist)
        y_hist = jnp.where(store, y_hist.at[head].set(y), y_hist)
        rho_hist = jnp.where(store, rho_hist.at[head].set(rho), rho_hist)
        head = jnp.where(store, (head + 1) % m, head)
        count = jnp.where(store, jnp.minimum(count + 1, m), count)

        grad_norm = jnp.max(jnp.abs(g_new))
        converged = converged | (grad_norm < config.grad_tol) | ~ls_ok
        iters = iters + jnp.where(converged, 0, 1)
        return (x_new, f_new, g_new, s_hist, y_hist, rho_hist, head, count, converged, iters), None

    init = (
        x0,
        f0,
        g0,
        jnp.zeros((m, d), x0.dtype),
        jnp.zeros((m, d), x0.dtype),
        jnp.zeros((m,), x0.dtype),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.max(jnp.abs(g0)) < config.grad_tol,
        jnp.zeros((), jnp.int32),
    )

    # Early-exit while_loop (see newton_minimize: bit-identical to the
    # fixed-trip scan, shorter sequential chain; safe — all callers are
    # custom_vjp forwards).
    def cond_fn(state):
        carry, k = state
        return (k < config.max_iters) & ~jnp.all(carry[8])

    def body_fn(state):
        carry, k = state
        new_carry, _ = step(carry, None)
        return new_carry, k + 1

    (x, f, g, *_rest, iters), _ = jax.lax.while_loop(
        cond_fn, body_fn, (init, jnp.zeros((), jnp.int32))
    )
    return LBFGSResult(x=x, value=f, grad_norm=jnp.max(jnp.abs(g)), iterations=iters)


# ---------------------------------------------------------------------------
# GP-parameter flattening and the inner objective
# ---------------------------------------------------------------------------


def flatten_gp_params(kernel: KernelConfig, params: dict) -> jnp.ndarray:
    """Deterministic flat layout: [raw_noise, raw_outputscale, rest...]."""
    parts = [jnp.reshape(params["raw_noise"], (-1,)), jnp.reshape(params["raw_outputscale"], (-1,))]
    if kernel.has_lengthscale:
        parts.append(jnp.reshape(params["raw_lengthscale"], (-1,)))
    if kernel.kind in ("poli1", "poli2"):
        parts.append(jnp.reshape(params["raw_offset"], (-1,)))
    if kernel.kind == "linear":
        parts.append(jnp.reshape(params["raw_variance"], (-1,)))
    return jnp.concatenate(parts)


def unflatten_gp_params(kernel: KernelConfig, flat: jnp.ndarray) -> dict:
    params = {"raw_noise": flat[0], "raw_outputscale": flat[1]}
    idx = 2
    if kernel.has_lengthscale:
        n_ls = kernel.ard_dims or 1
        ls = flat[idx : idx + n_ls]
        params["raw_lengthscale"] = ls if kernel.ard_dims else ls[0]
        idx += n_ls
    if kernel.kind in ("poli1", "poli2"):
        params["raw_offset"] = flat[idx]
        idx += 1
    if kernel.kind == "linear":
        params["raw_variance"] = flat[idx]
        idx += 1
    return params


def make_inner_loss(
    config: ExactGPConfig,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    lengthscale_prior_loc: Optional[jnp.ndarray] = None,
    gram=None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Inner objective: negative (MLL + priors)/n as a function of the flat
    raw GP parameter vector (the reference's -mll, adaptive_dkt.py:173-176).
    With `gram` (kernels.base_gram) the features `x` are unused — the loss
    becomes a pure function of (theta, gram)."""

    def loss(flat: jnp.ndarray) -> jnp.ndarray:
        params = unflatten_gp_params(config.kernel, flat)
        return -marginal_log_likelihood(
            config, params, x, y, mask=mask,
            lengthscale_prior_loc=lengthscale_prior_loc, gram=gram,
        )

    return loss


def fit_gp(
    config: ExactGPConfig,
    x: jnp.ndarray,
    y: jnp.ndarray,
    init_flat: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    lengthscale_prior_loc: Optional[jnp.ndarray] = None,
    optimizer: LBFGSConfig = LBFGSConfig(),
) -> Tuple[jnp.ndarray, LBFGSResult]:
    """Fit raw GP hyperparameters to (x, y) by compiled L-BFGS on the MLL."""
    loss = make_inner_loss(config, x, y, mask, lengthscale_prior_loc)
    result = minimize(loss, init_flat, optimizer)
    return result.x, result


def isotropic_config(config: ExactGPConfig) -> ExactGPConfig:
    """The same GP with a single shared lengthscale (ard_dims=None)."""
    from dataclasses import replace

    return replace(config, kernel=replace(config.kernel, ard_dims=None))


def ard_warmstart_init(
    config: ExactGPConfig,
    x: jnp.ndarray,
    y: jnp.ndarray,
    init_flat: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    lengthscale_prior_loc: Optional[jnp.ndarray] = None,
    optimizer: Optional[LBFGSConfig] = None,
) -> jnp.ndarray:
    """Two-stage ARD initialization: minimize the FULL ARD objective
    restricted to the isotropic subspace (all lengthscales tied to one
    scalar) with a few saddle-free Newton iterations, then release the
    tie. Because the subspace contains the cold init and the line search
    only accepts decreases, loss(warm) <= loss(init) by construction —
    the subsequent ARD L-BFGS starts with the scalar hyperparameters
    near-optimal and only has to differentiate lengthscales ACROSS dims
    (tests/test_gp_fit.py::test_ard_warmstart_matches_full_budget).

    The pre-fit runs on stop_gradient'ed inputs and its output is
    detached: theta* gradients flow through the IFT custom_vjp
    (gp/ift.py), never through the optimizer trajectory, so the warm
    start must not open an unrolled-scan backward.

    Reference parity note: gpytorch ARD fits (fs_mol/models/adaptive_dkt.py
    ARD configs via gp_utils.py:7-49) hand scipy L-BFGS-B the cold init
    and let its adaptive line search cope; a fixed-budget compiled
    optimizer benefits from the staging instead.
    """
    if not config.kernel.has_lengthscale or not config.kernel.ard_dims:
        return init_flat
    iso_kernel = isotropic_config(config).kernel
    x_d = jax.lax.stop_gradient(x)
    y_d = jax.lax.stop_gradient(y)
    ard_loss = make_inner_loss(config, x_d, y_d, mask, lengthscale_prior_loc)
    ard_params = unflatten_gp_params(config.kernel, jax.lax.stop_gradient(init_flat))
    ls_shape = jnp.shape(ard_params["raw_lengthscale"])

    def embed(flat_iso: jnp.ndarray) -> jnp.ndarray:
        p = unflatten_gp_params(iso_kernel, flat_iso)
        p["raw_lengthscale"] = jnp.broadcast_to(p["raw_lengthscale"], ls_shape)
        return flatten_gp_params(config.kernel, p)

    iso_init = flatten_gp_params(
        iso_kernel,
        {**ard_params, "raw_lengthscale": jnp.mean(ard_params["raw_lengthscale"])},
    )
    pre_opt = optimizer or LBFGSConfig(method="newton", newton_iters=8)
    result = minimize(lambda t: ard_loss(embed(t)), iso_init, pre_opt)
    # Reject a failed pre-fit (non-finite escape / worse than cold): keep
    # the cold init.
    improved = result.value <= ard_loss(jax.lax.stop_gradient(init_flat))
    warm = jnp.where(improved, embed(result.x), init_flat)
    return jax.lax.stop_gradient(warm)
