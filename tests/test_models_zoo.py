"""Tests for the baseline model zoo: ProtoNet, CNP, GP-ST, DKL,
multitask GNN, MAML — finite losses, learning signal, above-chance
prediction where the model family should manage it on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from sklearn.metrics import roc_auc_score

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode, stack_episodes
from adkf_ift_tpu.models import cnp, dkl, gpst, maml, protonet
from adkf_ift_tpu.models import gnn_multitask as gmt
from adkf_ift_tpu.modules import (
    CombinedFeatureConfig,
    GNNConfig,
    GraphFeatureExtractorConfig,
    GraphReadoutConfig,
)
from adkf_ift_tpu.utils.synthetic import make_task

SPEC = EpisodeSpec(support_size=16, query_size=32)


def _graph_cfg():
    return GraphFeatureExtractorConfig(
        gnn_config=GNNConfig(num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8, intermediate_dim=64),
        readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16),
    )


def _features(used="gnn+ecfp+fc"):
    return CombinedFeatureConfig(
        used_features=used, graph_config=_graph_cfg(), fc_out_dim=32, fc_hidden_dim=32
    )


def _episode(seed=0, spec=SPEC, regression=False, n=120):
    task = make_task(f"Z{seed}", num_samples=n, seed=seed)
    sampler = StratifiedTaskSampler(spec.support_size, test_size_or_ratio=spec.query_size)
    return build_episode(sampler.sample(task, seed=seed), spec, regression=regression)


@pytest.mark.parametrize("metric", ["mahalanobis", "euclidean"])
def test_protonet_loss_and_predict(metric):
    cfg = protonet.ProtoNetConfig(features=_features(), distance_metric=metric)
    ep = _episode(1)
    params = protonet.init_params(cfg, jax.random.PRNGKey(0), ep.support)
    loss = float(jax.jit(lambda p: protonet.episode_loss(cfg, p, ep))(params))
    assert np.isfinite(loss)
    g = jax.grad(lambda p: protonet.episode_loss(cfg, p, ep))(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))
    probs = protonet.episode_predict(cfg, params, ep)
    assert probs.shape == (32,)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))


def test_protonet_learns():
    cfg = protonet.ProtoNetConfig(features=_features(), distance_metric="euclidean")
    eps = [_episode(s) for s in range(4)]
    batch = stack_episodes(eps)
    params = protonet.init_params(cfg, jax.random.PRNGKey(0), eps[0].support)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(
            lambda p: jnp.mean(jax.vmap(lambda e: protonet.episode_loss(cfg, p, e))(batch))
        )(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    first = None
    for _ in range(10):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    assert float(loss) < first


@pytest.mark.parametrize("regression", [False, True])
def test_cnp_loss_and_predict(regression):
    cfg = cnp.CNPConfig(features=_features(), use_numeric_labels=regression)
    ep = _episode(2, regression=regression)
    params = cnp.init_params(cfg, jax.random.PRNGKey(0), ep)
    loss = float(jax.jit(lambda p: cnp.episode_loss(cfg, p, ep))(params))
    assert np.isfinite(loss)
    preds = cnp.episode_predict(cfg, params, ep)
    assert preds.shape == (32,)
    assert np.all(np.isfinite(np.asarray(preds)))


def test_gpst_beats_chance():
    spec = EpisodeSpec(support_size=64, query_size=64)
    ep = _episode(42, spec=spec, n=256)
    cfg = gpst.GPSTConfig()
    pred = jax.jit(lambda e: gpst.episode_predict(cfg, e))(ep)
    probs = jax.nn.sigmoid(pred.mean)
    mask = np.asarray(ep.query.graph_mask) > 0
    auc = roc_auc_score(np.asarray(ep.query_labels)[mask] > 0, np.asarray(probs)[mask])
    assert auc > 0.6, auc


def test_gpst_regression_finite():
    spec = EpisodeSpec(support_size=32, query_size=32)
    ep = _episode(7, spec=spec, regression=True, n=160)
    cfg = gpst.GPSTConfig(use_numeric_labels=True)
    pred = gpst.episode_predict(cfg, ep)
    assert np.all(np.isfinite(np.asarray(pred.mean)))
    assert np.all(np.asarray(pred.variance) > 0)


def test_dkl_from_scratch_fit_improves_support_mll():
    cfg = dkl.DKLConfig(features=_features(), num_train_steps=20)
    ep = _episode(3)
    init = dkl.init_params(cfg, jax.random.PRNGKey(0), ep.support)
    before = float(dkl._support_mll_loss(cfg, init, ep))
    fitted = jax.jit(lambda p: dkl.fit_task(cfg, p, ep))(init)
    after = float(dkl._support_mll_loss(cfg, fitted, ep))
    assert after < before, (before, after)
    pred = dkl.episode_predict(cfg, init, ep)
    assert np.all(np.isfinite(np.asarray(pred.mean)))


def test_multitask_train_and_finetune():
    cfg = gmt.GNNMultitaskConfig(
        graph_config=_graph_cfg(), num_tasks=4, num_tail_layers=2, finetune_steps=5
    )
    # Mixed batch: one packed set with task ids.
    from adkf_ift_tpu.data import GraphPadSpec, pack_graphs

    tasks = [make_task(f"MT{i}", num_samples=12, seed=50 + i) for i in range(4)]
    samples = [s for t in tasks for s in t.samples[:6]]
    ids = np.repeat(np.arange(4), 6).astype(np.int32)
    packed = pack_graphs(samples, GraphPadSpec.for_graphs(len(samples)))
    labels01 = np.asarray([1.0 if s.bool_label else 0.0 for s in samples], np.float32)

    params = gmt.init_params(cfg, jax.random.PRNGKey(0), packed)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(
            lambda p: gmt.batch_loss(cfg, p, packed, jnp.asarray(ids), jnp.asarray(labels01))
        )(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    first = None
    for _ in range(10):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    assert float(loss) < first

    ep = _episode(4)
    probs = gmt.episode_predict(cfg, params, ep, jax.random.PRNGKey(1))
    assert probs.shape == (32,)
    assert np.all(np.isfinite(np.asarray(probs)))


def test_maml_meta_gradient_and_learning():
    cfg = maml.MAMLConfig(graph_config=_graph_cfg(), inner_steps=2)
    eps = [_episode(60 + s) for s in range(3)]
    batch = stack_episodes(eps)
    params = maml.init_params(cfg, jax.random.PRNGKey(0), eps[0].support)
    opt = maml.make_outer_optimizer(cfg, params)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(
            lambda p: jnp.mean(jax.vmap(lambda e: maml.episode_loss(cfg, p, e))(batch))
        )(params)
        updates, state = opt.update(g, state, params)
        return optax.apply_updates(params, updates), state, loss

    first = None
    for _ in range(15):
        params, state, loss = step(params, state)
        assert np.isfinite(float(loss))
        if first is None:
            first = float(loss)
    assert float(loss) < first

    probs = maml.episode_predict(cfg, params, eps[0])
    assert probs.shape == (32,)


def test_maml_first_order_differs_from_second_order():
    cfg2 = maml.MAMLConfig(graph_config=_graph_cfg(), inner_steps=1)
    cfg1 = maml.MAMLConfig(graph_config=_graph_cfg(), inner_steps=1, first_order=True)
    ep = _episode(70)
    params = maml.init_params(cfg2, jax.random.PRNGKey(0), ep.support)
    g2 = jax.grad(lambda p: maml.episode_loss(cfg2, p, ep))(params)
    g1 = jax.grad(lambda p: maml.episode_loss(cfg1, p, ep))(params)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g2, g1)
    assert max(jax.tree.leaves(diffs)) > 1e-9
