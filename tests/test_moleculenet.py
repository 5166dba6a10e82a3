"""MoleculeNet subsystem tests on synthetic categorical graphs (no RDKit)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adkf_ift_tpu.gp import LBFGSConfig
from adkf_ift_tpu.moleculenet import MolNetADKFConfig, MolNetEncoderConfig
from adkf_ift_tpu.moleculenet import trainer as mt
from adkf_ift_tpu.moleculenet.data import (
    MolNetGraph,
    MolNetTask,
    pack_molnet_graphs,
    sample_episode,
)

_FAST = LBFGSConfig(max_iters=12, history=4, max_growth=3, max_backtrack=10)


def _random_graph(rng, signal_atom=6):
    v = rng.randint(8, 24)
    atom_type = rng.choice([1, 6, 7, 8, 16], size=v).astype(np.int32)
    # Label signal: fraction of 'signal_atom' atoms.
    chirality = rng.randint(0, 3, size=v).astype(np.int32)
    edges = []
    for i in range(v - 1):
        edges.extend([[i, i + 1], [i + 1, i]])
    edge_index = np.asarray(edges, np.int32)
    bond_type = rng.randint(0, 3, size=len(edges)).astype(np.int32)
    bond_dir = np.zeros(len(edges), np.int32)
    return MolNetGraph(atom_type, chirality, edge_index, bond_type, bond_dir)


def _task(name="T", n=80, seed=0):
    rng = np.random.RandomState(seed)
    graphs = [_random_graph(rng) for _ in range(n)]
    labels = np.asarray(
        [1.0 if (g.atom_type == 6).mean() > 0.4 else 0.0 for g in graphs], np.float32
    )
    # Ensure both classes exist.
    if labels.sum() < 12 or labels.sum() > n - 12:
        labels[: n // 2] = 1.0
        labels[n // 2 :] = 0.0
    return MolNetTask(name, graphs, labels)


@pytest.mark.parametrize("gnn_type", ["gin", "gcn", "graphsage"])
def test_molnet_encoder_forward(gnn_type):
    rng = np.random.RandomState(0)
    graphs = [_random_graph(rng) for _ in range(8)]
    packed = pack_molnet_graphs(graphs, 8)
    cfg = MolNetADKFConfig(
        encoder=MolNetEncoderConfig(gnn_type=gnn_type, num_layers=2, emb_dim=32)
    )
    params = mt.init_encoder_params(cfg, jax.random.PRNGKey(0), packed)
    out = mt.make_encoder(cfg).apply(params, packed)
    assert out.shape == (8, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_molnet_adkf_loss_grads_and_auroc():
    cfg = MolNetADKFConfig(
        encoder=MolNetEncoderConfig(num_layers=2, emb_dim=32),
        inner_optimizer=_FAST,
    )
    task = _task(n=80, seed=1)
    ep = sample_episode(task, n_shot=8, query_size=24, seed=0)
    params = mt.init_encoder_params(cfg, jax.random.PRNGKey(0), ep.support)

    loss, grads = jax.jit(
        jax.value_and_grad(lambda p: mt.episode_outer_loss(cfg, p, ep))
    )(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in jax.tree.leaves(grads))

    auroc, scores = mt.evaluate_task_auroc(
        cfg, params, [sample_episode(task, 8, 24, seed=s) for s in range(3)]
    )
    assert np.isfinite(auroc) and 0.0 <= auroc <= 1.0


def test_molnet_test_time_adaptation_reduces_adapt_loss():
    """test_time_adapt (adkfift_trainer.py:230-271 update_step_test path)
    runs ADKF outer steps on the test task's support pool and returns
    adapted ENCODER params that lower the adaptation objective."""
    task = _task(n=96, seed=5)
    cfg = MolNetADKFConfig(
        encoder=MolNetEncoderConfig(num_layers=2, emb_dim=32),
        inner_optimizer=LBFGSConfig(max_iters=10, history=4, max_growth=3, max_backtrack=8),
    )
    adapt_ep = sample_episode(task, n_shot=8, query_size=24, seed=1)
    params = mt.init_encoder_params(cfg, jax.random.PRNGKey(0), adapt_ep.support)

    before = float(mt.episode_outer_loss(cfg, params, adapt_ep))
    adapted = mt.test_time_adapt(cfg, params, adapt_ep, num_steps=5, lr=1e-3)
    after = float(mt.episode_outer_loss(cfg, adapted, adapt_ep))
    assert np.isfinite(after) and after < before, (before, after)
    # Params actually moved, and evaluation still works with them.
    moved = sum(
        float(jnp.linalg.norm(a - b))
        for a, b in zip(jax.tree.leaves(adapted), jax.tree.leaves(params))
    )
    assert moved > 0
    pred = mt.episode_predict(cfg, adapted, adapt_ep)
    assert np.all(np.isfinite(np.asarray(pred.mean)))


def test_sample_episode_protocol():
    task = _task(n=60, seed=2)
    ep = sample_episode(task, n_shot=5, query_size=16, seed=3)
    s_labels = np.asarray(ep.support_labels)
    real = np.asarray(ep.support.graph_mask) > 0
    assert real.sum() == 10  # 2 classes x 5 shots
    assert (s_labels[real] > 0).sum() == 5
    ep2 = sample_episode(task, n_shot=5, query_size=16, seed=3)
    assert np.array_equal(ep.support_labels, ep2.support_labels)  # seeded determinism
