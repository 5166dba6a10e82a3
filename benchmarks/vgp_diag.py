"""ADKT-VGP 'not learning' diagnosis (VERDICT r4 #4, par_diag-style).

Round-4 measured outcome: 600 TPU steps move the ADKT-VGP train loss
0.705 -> 0.693 (~ln 2 throughout) and its zoo row is ~0. Hypotheses:

  H1 (inner under-convergence): the VGP inner problem is much larger
     than ADKF's — flat dim = S + S(S+1)/2 + 2 (m, tril(L), kernel) =
     562 at support 32 vs ADKF's 3 — and the shipped inner L-BFGS
     budget (max_iters=64, history=8) leaves the ELBO far from its
     optimum, so the predictive mean stays near the prior 0, the probit
     outputs ~0.5, the loss ~ln 2 per query point, and the outer
     gradient through the saturated probit is tiny.
  H2 (vanishing outer gradient through the double inner fit): the IFT
     correction through prefit+ELBO kills the encoder gradient even at
     a converged inner optimum.

Protocol: separable synthetic features (two spherical clusters,
distance swept), support 32 / query 64. For each inner budget:
ELBO, |m|, query accuracy, mean per-query NLL, and the outer-gradient
norm wrt the features (total + IFT-only via stop_gradient on theta).
A same-data exact-GP ADKF head is the reference ceiling.

Usage: python benchmarks/vgp_diag.py [--budgets 16,64,128,256,512]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache_cpu")
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from adkf_ift_tpu.gp import LBFGSConfig
from adkf_ift_tpu.gp.variational import (
    bernoulli_marginal_log_prob,
    bernoulli_marginal_probs,
    make_vgp_inner_loss,
    vgp_predict,
)
from adkf_ift_tpu.models import adkf_vgp


def make_data(rng, d=16, s=32, q=64, sep=2.0):
    ys = jnp.asarray(np.repeat([1.0, -1.0], s // 2))
    yq = jnp.asarray(np.repeat([1.0, -1.0], q // 2))
    mu = rng.randn(d)
    mu = mu / np.linalg.norm(mu) * sep / 2
    fs = jnp.asarray(
        np.where(np.asarray(ys)[:, None] > 0, mu, -mu) + rng.randn(s, d) * 0.7,
        jnp.float32,
    )
    fq = jnp.asarray(
        np.where(np.asarray(yq)[:, None] > 0, mu, -mu) + rng.randn(q, d) * 0.7,
        jnp.float32,
    )
    return fs, ys, fq, yq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", default="16,64,128,256,512")
    ap.add_argument("--sep", type=float, default=2.0)
    args = ap.parse_args()
    budgets = [int(b) for b in args.budgets.split(",")]

    rng = np.random.RandomState(0)
    fs, ys, fq, yq = make_data(rng, sep=args.sep)
    s_mask = jnp.ones(fs.shape[0])
    q_mask = jnp.ones(fq.shape[0])

    # Exact-GP (ADKF) ceiling on identical features.
    from adkf_ift_tpu.models import adkf as adkf_mod

    acfg = adkf_mod.ADKFModelConfig()
    theta = adkf_mod.inner_fit(acfg, fs, ys, s_mask)
    from adkf_ift_tpu.gp import posterior, unflatten_gp_params

    post = posterior(
        acfg.gp_config, unflatten_gp_params(acfg.gp_config.kernel, theta),
        fs, ys, fq, support_mask=s_mask,
    )
    acc = float(((post.mean > 0) == (yq > 0)).mean())

    def adkf_outer(fs_):
        th = adkf_mod.inner_fit(acfg, fs_, ys, s_mask)
        from adkf_ift_tpu.gp import predictive_nll

        return predictive_nll(
            acfg.gp_config, unflatten_gp_params(acfg.gp_config.kernel, th),
            fs_, ys, fq, yq, support_mask=s_mask,
        )

    g_adkf = jax.grad(adkf_outer)(fs)
    print(f"exact-GP ADKF head: query acc {acc:.3f}  mean|mu| "
          f"{float(jnp.abs(post.mean).mean()):.3f}  "
          f"|g_outer(fs)| {float(jnp.linalg.norm(g_adkf)):9.2e}")

    for iters in budgets:
        cfg = adkf_vgp.ADKTVGPModelConfig(
            inner_optimizer=LBFGSConfig(max_iters=iters, history=min(iters, 32)),
        )

        def outer(fs_, cfg=cfg, stop_theta=False):
            th = adkf_vgp.inner_fit(cfg, fs_, ys, s_mask)
            if stop_theta:
                th = jax.lax.stop_gradient(th)
            mu, var = vgp_predict(
                adkf_vgp._episode_vgp_config(cfg, fs_), th, fs_, fq, s_mask
            )
            return -jnp.sum(bernoulli_marginal_log_prob(mu, var, yq) * q_mask), (mu, var, th)

        (loss, (mu, var, th)), g_full = jax.value_and_grad(
            lambda f: outer(f), has_aux=True
        )(fs)
        g_direct = jax.grad(lambda f: outer(f, stop_theta=True)[0])(fs)
        # inner ELBO value at the fitted point (lower is better: it is
        # the negated ELBO loss used by the fitter)
        vgp_cfg = adkf_vgp._episode_vgp_config(cfg, fs)
        kernel_raw, ls_loc = adkf_vgp._prefit_kernel(cfg, fs, ys, s_mask)
        inner = make_vgp_inner_loss(vgp_cfg, fs, ys, s_mask, ls_loc)(th)
        probs = bernoulli_marginal_probs(mu, var)
        acc = float((((probs > 0.5) * 2 - 1) == yq).mean())
        print(
            f"iters {iters:4d}: -ELBO {float(inner):9.3f}  mean|mu| "
            f"{float(jnp.abs(mu).mean()):7.4f}  acc {acc:.3f}  "
            f"NLL/q {float(loss) / fq.shape[0]:7.4f}  "
            f"|g_total| {float(jnp.linalg.norm(g_full)):9.2e}  "
            f"|g_direct(no IFT)| {float(jnp.linalg.norm(g_direct)):9.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
