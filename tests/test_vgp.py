"""Variational-GP layer and ADKT-VGP model tests."""

import numpy as np
import jax
import jax.numpy as jnp

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode
from adkf_ift_tpu.gp import KernelConfig, LBFGSConfig
from adkf_ift_tpu.gp.variational import (
    VGPConfig,
    bernoulli_marginal_probs,
    fit_vgp_implicit,
    init_vgp_flat,
    make_vgp_inner_loss,
    vgp_elbo,
    vgp_predict,
)
from adkf_ift_tpu.models import adkf_vgp
from adkf_ift_tpu.utils.synthetic import make_task

_FAST = LBFGSConfig(max_iters=25, history=6, max_growth=3, max_backtrack=10)


def _toy(s=16, d=8, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(s, d).astype(np.float32)
    w = rng.randn(d)
    y = np.sign(x @ w).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_elbo_increases_with_fit_and_classifies():
    x, y = _toy()
    cfg = VGPConfig(kernel=KernelConfig(kind="matern"), num_inducing=16)
    kernel_raw = {"raw_outputscale": jnp.asarray(0.54), "raw_lengthscale": jnp.asarray(1.0)}
    flat0 = init_vgp_flat(cfg, kernel_raw)
    e0 = float(vgp_elbo(cfg, flat0, x, y))
    theta = jax.jit(
        lambda xx, yy: fit_vgp_implicit(cfg, _FAST, False, xx, yy, flat0, None, None)
    )(x, y)
    e1 = float(vgp_elbo(cfg, theta, x, y))
    assert np.isfinite(e0) and np.isfinite(e1)
    assert e1 > e0 + 0.01, (e0, e1)

    # In-sample predictions should separate the classes.
    mu, var = vgp_predict(cfg, theta, x, x)
    probs = np.asarray(bernoulli_marginal_probs(mu, var))
    acc = np.mean((probs > 0.5) == (np.asarray(y) > 0))
    assert acc > 0.8, acc


def test_vgp_ift_hypergradient_finite_nonzero():
    x, y = _toy(s=12, d=6, seed=1)
    cfg = VGPConfig(kernel=KernelConfig(kind="matern"), num_inducing=12)
    kernel_raw = {"raw_outputscale": jnp.asarray(0.54), "raw_lengthscale": jnp.asarray(1.0)}
    flat0 = init_vgp_flat(cfg, kernel_raw)
    xq, yq = _toy(s=8, d=6, seed=2)

    def outer(feats):
        theta = fit_vgp_implicit(cfg, _FAST, False, feats, y, flat0, None, None)
        mu, var = vgp_predict(cfg, theta, feats, xq)
        from adkf_ift_tpu.gp.variational import bernoulli_marginal_log_prob

        return -jnp.sum(bernoulli_marginal_log_prob(mu, var, yq))

    g = jax.jit(jax.grad(outer))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_vgp_inner_loss_masked_padding_invariance():
    """Padded inducing points must not change the ELBO value."""
    x, y = _toy(s=10, d=6, seed=3)
    cfg10 = VGPConfig(kernel=KernelConfig(kind="matern"), num_inducing=10)
    cfg16 = VGPConfig(kernel=KernelConfig(kind="matern"), num_inducing=16)
    kernel_raw = {"raw_outputscale": jnp.asarray(0.3), "raw_lengthscale": jnp.asarray(0.9)}

    e_unpadded = float(vgp_elbo(cfg10, init_vgp_flat(cfg10, kernel_raw), x, y))
    x_pad = jnp.concatenate([x, jnp.zeros((6, x.shape[1]))])
    y_pad = jnp.concatenate([y, jnp.zeros((6,))])
    mask = jnp.concatenate([jnp.ones((10,)), jnp.zeros((6,))])
    e_padded = float(vgp_elbo(cfg16, init_vgp_flat(cfg16, kernel_raw), x_pad, y_pad, mask))
    # Values are per-point averages over n_eff; must match closely.
    assert abs(e_unpadded - e_padded) < 1e-4, (e_unpadded, e_padded)


def test_adkf_vgp_episode_end_to_end():
    from adkf_ift_tpu.modules import (
        CombinedFeatureConfig,
        GNNConfig,
        GraphFeatureExtractorConfig,
        GraphReadoutConfig,
    )

    feats = CombinedFeatureConfig(
        used_features="gnn+ecfp+fc",
        graph_config=GraphFeatureExtractorConfig(
            gnn_config=GNNConfig(num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8, intermediate_dim=64),
            readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16),
        ),
        fc_out_dim=16,
        fc_hidden_dim=64,
    )
    cfg = adkf_vgp.ADKTVGPModelConfig(
        features=feats,
        support_size=16,
        inner_optimizer=_FAST,
        prefit_optimizer=LBFGSConfig(max_iters=10, history=4, max_growth=3, max_backtrack=8),
    )
    spec = EpisodeSpec(support_size=16, query_size=32)
    task = make_task(num_samples=120, seed=5)
    ep = build_episode(StratifiedTaskSampler(16, test_size_or_ratio=32).sample(task, 0), spec)
    params = adkf_vgp.init_encoder_params(cfg, jax.random.PRNGKey(0), ep.support)

    loss, grads = jax.jit(
        jax.value_and_grad(lambda p: adkf_vgp.episode_outer_loss(cfg, p, ep))
    )(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in jax.tree.leaves(grads))

    pred = jax.jit(lambda p: adkf_vgp.episode_predict(cfg, p, ep))(params)
    probs = np.asarray(pred.probs)
    assert np.all((probs >= 0) & (probs <= 1))
