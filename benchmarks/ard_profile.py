"""Attribute the ARD slowdown (VERDICT r2 weak #4: 1.00 vs 2.03 steps/s).

Splits one full-width ARD inner problem (d_feat-dim lengthscales, the
reference's --use-ard configuration, fs_mol/models/adaptive_dkt.py ARD
kernels via gp_utils.py) into separately-timed pieces on the real
device, with the honest device->host sync per measurement:

  fwd        compiled L-BFGS fit alone (what BENCH_ARD pays per task,
             forward only), vs the inner iteration budget;
  warmstart  the isotropic subspace pre-fit alone;
  bwd_cg     the IFT backward's f64 CG solve alone, INSTRUMENTED — a
             replica of gp/ift._solve_hessian_system's matrix-free
             branch that also reports the iteration count where the
             residual reached tol (jax.scipy's cg early-exits on tol,
             so the *budget* only binds if convergence is slower);
  bwd_full   the complete custom_vjp backward (CG + mixed-partial
             pullback to the features) via jax.grad of a predictive
             loss through fit_gp_implicit.

Usage: python benchmarks/ard_profile.py [--dims 2048] [--support 64]
       [--inner-iters 48,96] [--cg-iters 10,25,50,100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from dataclasses import replace

from adkf_ift_tpu.gp import ExactGPConfig, KernelConfig, LBFGSConfig
from adkf_ift_tpu.gp.exact import predictive_nll
from adkf_ift_tpu.gp.fit import (
    ard_warmstart_init,
    fit_gp,
    flatten_gp_params,
    make_inner_loss,
    unflatten_gp_params,
)
from adkf_ift_tpu.gp.ift import fit_gp_implicit
from adkf_ift_tpu.gp.kernels import init_raw_params, median_lengthscale_init
from adkf_ift_tpu.gp.transforms import noise_to_raw, positive_to_raw


def _sync(x) -> float:
    """Honest device sync: device->host copy (CLAUDE.md tunnel rule)."""
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def _timed(fn, *a, reps=3):
    out = fn(*a)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
        _sync(out)
    return (time.perf_counter() - t0) / reps, out


def instrumented_cg(hvp, g, maxiter, tol):
    """Plain CG on HVPs that also returns (iterations_run, final residual
    norm). Mirrors jax.scipy.sparse.linalg.cg's stopping rule
    (||r|| <= tol * ||g||) so the reported count is the iterations the
    production backward actually executes."""

    normb = jnp.linalg.norm(g)
    atol = tol * normb

    def cond(state):
        _, r, *_ , k = state
        return jnp.logical_and(jnp.linalg.norm(r) > atol, k < maxiter)

    def body(state):
        x, r, p, rs, k = state
        hp = hvp(p)
        alpha = rs / jnp.vdot(p, hp)
        x = x + alpha * p
        r = r - alpha * hp
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs) * p
        return (x, r, p, rs_new, k + 1)

    x0 = jnp.zeros_like(g)
    state = (x0, g, g, jnp.vdot(g, g), jnp.asarray(0, jnp.int32))
    x, r, _, _, k = jax.lax.while_loop(cond, body, state)
    return x, k, jnp.linalg.norm(r) / normb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=2048)
    ap.add_argument("--support", type=int, default=64)
    ap.add_argument("--query", type=int, default=256)
    ap.add_argument("--signal-dims", type=int, default=32)
    ap.add_argument("--inner-iters", type=str, default="24,48,96")
    ap.add_argument("--cg-iters", type=str, default="10,25,50,100")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    d, sd, n = args.dims, args.signal_dims, args.support
    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    xq = rng.randn(args.query, d).astype(np.float32)
    w = rng.randn(sd)
    y = np.sign(x[:, :sd] @ w + 0.1 * rng.randn(n)).astype(np.float32)
    yq = np.sign(xq[:, :sd] @ w + 0.1 * rng.randn(args.query)).astype(np.float32)
    x, xq, y, yq = map(jnp.asarray, (x, xq, y, yq))

    config = ExactGPConfig(kernel=KernelConfig(kind="matern", ard_dims=d))

    def init_flat():
        params = init_raw_params(config.kernel)
        params["raw_noise"] = noise_to_raw(jnp.asarray(0.01))
        med = median_lengthscale_init(x)
        params["raw_lengthscale"] = positive_to_raw(
            jnp.broadcast_to(med, (d,))
        )
        return flatten_gp_params(config.kernel, params)

    report = {"dims": d, "support": n}

    # --- warm start alone ---
    opt = LBFGSConfig()
    ws_fn = jax.jit(lambda f0: ard_warmstart_init(config, x, y, f0, None, None))
    t_ws, warm = _timed(ws_fn, init_flat(), reps=args.reps)
    report["warmstart_s"] = round(t_ws, 4)

    # --- forward fit vs budget ---
    for iters in [int(v) for v in args.inner_iters.split(",")]:
        o = replace(opt, max_iters=iters)
        fit_fn = jax.jit(lambda f0, o=o: fit_gp(config, x, y, f0, optimizer=o)[0])
        t_fit, theta = _timed(fit_fn, warm, reps=args.reps)
        loss = make_inner_loss(config, x, y)
        gnorm = float(jnp.linalg.norm(jax.jit(jax.grad(loss))(theta)))
        report[f"fwd_fit_s@{iters}"] = round(t_fit, 4)
        report[f"fwd_gradnorm@{iters}"] = f"{gnorm:.2e}"

    # --- instrumented f64 CG on the inner Hessian (the bwd solve) ---
    theta_star = jax.jit(
        lambda f0: fit_gp(config, x, y, f0, optimizer=replace(opt, max_iters=96))[0]
    )(warm)
    _sync(theta_star)

    for budget in [int(v) for v in args.cg_iters.split(",")]:
        @jax.jit
        def cg_probe(theta, g):
            with jax.enable_x64(True):
                x64 = x.astype(jnp.float64)
                y64 = y.astype(jnp.float64)
                theta64 = theta.astype(jnp.float64)
                loss64 = make_inner_loss(config, x64, y64)
                grad_fn = jax.grad(loss64)

                def hvp(v):
                    return jax.jvp(grad_fn, (theta64,), (v,))[1] + 1e-6 * v

                v, k, res = instrumented_cg(hvp, g.astype(jnp.float64), budget, 1e-5)
            return v.astype(jnp.float32), k, res

        gbar = jnp.ones_like(theta_star) / d
        t_cg, (_, k, res) = _timed(lambda th: cg_probe(th, gbar), theta_star,
                                   reps=args.reps)
        report[f"bwd_cg_s@{budget}"] = round(t_cg, 4)
        report[f"bwd_cg_iters@{budget}"] = int(np.asarray(k))
        report[f"bwd_cg_relres@{budget}"] = f"{float(np.asarray(res)):.2e}"

    # --- full backward through fit_gp_implicit ---
    for budget in [int(v) for v in args.cg_iters.split(",")]:
        o = replace(opt, max_iters=96, ift_cg_iters=budget)

        def outer(xf, o=o):
            theta = fit_gp_implicit(config, o, False, xf, y, warm, None, None)
            p = unflatten_gp_params(config.kernel, theta)
            return predictive_nll(config, p, xf, y, xq, yq)

        grad_fn = jax.jit(jax.grad(outer))
        t_bwd, g = _timed(grad_fn, x, reps=args.reps)
        report[f"outer_grad_s@cg{budget}"] = round(t_bwd, 4)
        report[f"outer_gradnorm@cg{budget}"] = f"{float(jnp.linalg.norm(g)):.3e}"

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
