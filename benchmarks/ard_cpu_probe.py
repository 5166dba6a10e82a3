"""CPU probe of the ARD inner problem's HARDWARE-INDEPENDENT facts.

Timings on CPU are meaningless for the TPU tuning question (VERDICT r2
weak #4), but two quantities are pure math and transfer exactly:

  * the f64 CG iteration count at which the IFT backward's residual
    meets ift_cg_tol (does the default 100-iteration budget bind?);
  * the L-BFGS gradient norm reached per iteration budget, with and
    without the isotropic warm start (is 48 iters more than needed?).

Run this on the single-core host while the TPU is busy; feed the
results into the on-device tuning pass (benchmarks/ard_profile.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# MUST be set before importing benchmarks.ard_profile, whose module-level
# setdefault would otherwise point this CPU run at the TPU .jax_cache —
# which contains the remote compile server's machine-mismatched XLA:CPU
# AOT artifacts (cpu_aot_loader warning, silently wrong numerics).
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu")
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.abspath(_cache)

import jax

jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import argparse
import json
from dataclasses import replace

import jax.numpy as jnp
import numpy as np

from adkf_ift_tpu.gp import ExactGPConfig, KernelConfig, LBFGSConfig
from adkf_ift_tpu.gp.fit import (
    ard_warmstart_init,
    fit_gp,
    flatten_gp_params,
    make_inner_loss,
)
from adkf_ift_tpu.gp.kernels import init_raw_params, median_lengthscale_init
from adkf_ift_tpu.gp.transforms import noise_to_raw, positive_to_raw

from benchmarks.ard_profile import instrumented_cg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=2048)
    ap.add_argument("--support", type=int, default=64)
    ap.add_argument("--signal-dims", type=int, default=32)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    d, sd, n = args.dims, args.signal_dims, args.support
    config = ExactGPConfig(kernel=KernelConfig(kind="matern", ard_dims=d))
    opt = LBFGSConfig()
    report = {"dims": d, "support": n, "seeds": args.seeds}

    for seed in range(args.seeds):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(n, d).astype(np.float32))
        w = rng.randn(sd)
        y = jnp.asarray(
            np.sign(np.asarray(x)[:, :sd] @ w + 0.1 * rng.randn(n)).astype(np.float32)
        )

        params = init_raw_params(config.kernel)
        params["raw_noise"] = noise_to_raw(jnp.asarray(0.01))
        med = median_lengthscale_init(x)
        params["raw_lengthscale"] = positive_to_raw(jnp.broadcast_to(med, (d,)))
        flat0 = flatten_gp_params(config.kernel, params)

        warm = jax.jit(lambda f0: ard_warmstart_init(config, x, y, f0, None, None))(flat0)
        loss = make_inner_loss(config, x, y)
        gradnorm = jax.jit(lambda t: jnp.linalg.norm(jax.grad(loss)(t)))

        row = {}
        for label, start in (("cold", flat0), ("warm", warm)):
            for iters in (12, 24, 48, 96):
                o = replace(opt, max_iters=iters)
                theta = jax.jit(
                    lambda f0, o=o: fit_gp(config, x, y, f0, optimizer=o)[0]
                )(start)
                row[f"gradnorm_{label}@{iters}"] = f"{float(gradnorm(theta)):.2e}"

        # CG on the f64 Hessian at the converged point: where does the
        # residual meet tol (the production stopping rule)?
        theta_star = jax.jit(
            lambda f0: fit_gp(config, x, y, f0, optimizer=replace(opt, max_iters=96))[0]
        )(warm)

        @jax.jit
        def cg_probe(theta, g):
            with jax.enable_x64(True):
                loss64 = make_inner_loss(
                    config, x.astype(jnp.float64), y.astype(jnp.float64)
                )
                grad_fn = jax.grad(loss64)

                def hvp(v):
                    return jax.jvp(grad_fn, (theta.astype(jnp.float64),), (v,))[1] + 1e-6 * v

                v, k, res = instrumented_cg(hvp, g.astype(jnp.float64), 400, 1e-5)
            return v.astype(jnp.float32), k, res

        gbar = jnp.ones_like(theta_star) / d
        _, k, res = cg_probe(theta_star, gbar)
        row["cg_iters_to_tol(max400)"] = int(np.asarray(k))
        row["cg_relres"] = f"{float(np.asarray(res)):.2e}"

        # Hypergradient ACCURACY vs CG budget: if a 25-iteration solve
        # already matches the 400-iteration reference to ~1e-3 relative,
        # the production budget can drop (it is ~100 sequential f64 HVPs,
        # the ARD backward's dominant cost on device).
        from adkf_ift_tpu.gp.exact import predictive_nll
        from adkf_ift_tpu.gp.fit import unflatten_gp_params
        from adkf_ift_tpu.gp.ift import fit_gp_implicit

        rngq = np.random.RandomState(seed + 100)
        xq = jnp.asarray(rngq.randn(128, d).astype(np.float32))
        yq = jnp.asarray(
            np.sign(np.asarray(xq)[:, :sd] @ w + 0.1 * rngq.randn(128)).astype(np.float32)
        )

        def outer_grad(budget):
            o = replace(opt, max_iters=96, ift_cg_iters=budget)

            def outer(xf):
                theta = fit_gp_implicit(config, o, False, xf, y, warm, None, None)
                p = unflatten_gp_params(config.kernel, theta)
                return predictive_nll(config, p, xf, y, xq, yq)

            return np.asarray(jax.jit(jax.grad(outer))(x))

        ref = outer_grad(400)
        refn = np.linalg.norm(ref)
        for budget in (10, 25, 50, 100):
            gb = outer_grad(budget)
            row[f"hypergrad_relerr@cg{budget}"] = f"{np.linalg.norm(gb - ref) / refn:.2e}"
        report[f"seed{seed}"] = row

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
