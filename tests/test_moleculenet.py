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


@pytest.mark.parametrize("gnn_type", ["gin", "gcn", "gat", "graphsage"])
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


def test_molnet_gat_torch_parity():
    """Our masked static-padded GAT layer vs an explicit torch replica of
    the reference GATConv (MoleculeNet/chem_lib/models/encoder.py:107-164):
    materialized self-loop edges (bond type 4), per-edge attention logits,
    scatter softmax over the aggregation index, head-mean + bias."""
    import torch

    from adkf_ift_tpu.moleculenet.encoder import MolNetEncoder

    rng = np.random.RandomState(3)
    graphs = [_random_graph(rng) for _ in range(5)]
    packed = pack_molnet_graphs(graphs, 6)  # padded graphs+nodes+edges
    cfg = MolNetADKFConfig(
        encoder=MolNetEncoderConfig(
            gnn_type="gat", num_layers=1, emb_dim=16, batch_norm=False
        )
    )
    params = mt.init_encoder_params(cfg, jax.random.PRNGKey(1), packed)
    ours = np.asarray(mt.make_encoder(cfg).apply(params, packed))

    p = params["params"]
    t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float64)
    atom_e, chir_e = t(p["atom_embedding"]["embedding"]), t(p["chirality_embedding"]["embedding"])
    bond_e, dir_e = t(p["bond_embedding0"]["embedding"]), t(p["bond_dir_embedding0"]["embedding"])
    W, b = t(p["gat_lin0"]["kernel"]), t(p["gat_lin0"]["bias"])
    att, bias = t(p["gat_att0"]), t(p["gat_bias0"])
    H, d = att.shape[0], att.shape[1] // 2

    pooled = []
    for g in graphs:
        v = len(g.atom_type)
        x = atom_e[t(g.atom_type).long()] + chir_e[t(g.chirality).long()]
        # reference: add self-loop edges (i -> i) with bond type 4, dir 0
        ei = np.concatenate([g.edge_index, np.stack([np.arange(v)] * 2, 1)], 0)
        bt = np.concatenate([g.bond_type, np.full(v, 4)], 0)
        bd = np.concatenate([g.bond_dir, np.zeros(v, np.int64)], 0)
        eemb = (bond_e[t(bt).long()] + dir_e[t(bd).long()]).reshape(-1, H, d)
        xp = (x @ W + b).reshape(v, H, d)
        src, tgt = t(ei[:, 0]).long(), t(ei[:, 1]).long()
        msg = xp[src] + eemb
        alpha = torch.nn.functional.leaky_relu(
            (torch.cat([xp[tgt], msg], -1) * att).sum(-1), 0.2
        )  # [E, H]
        # scatter softmax over the aggregation index
        mx = torch.full((v, H), -torch.inf, dtype=torch.float64).scatter_reduce(
            0, tgt[:, None].expand_as(alpha), alpha, "amax"
        )
        ex = torch.exp(alpha - mx[tgt])
        denom = torch.zeros(v, H, dtype=torch.float64).index_add(0, tgt, ex)
        w = ex / denom[tgt]
        out = torch.zeros(v, H, d, dtype=torch.float64).index_add(0, tgt, w[..., None] * msg)
        h = out.mean(1) + bias
        pooled.append(h.mean(0).numpy())
    np.testing.assert_allclose(ours[:5], np.stack(pooled), rtol=2e-4, atol=2e-4)
    # padded graph slots are zero
    np.testing.assert_allclose(ours[5], 0.0, atol=1e-6)


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


def test_molnet_auroc_beats_chance_after_adaptation():
    """End-to-end NUMBER check (not just shapes): on the learnable
    carbon-fraction family, test-time adaptation must push few-shot AUROC
    clearly above chance (the benchmark's headline metric,
    adkfift_trainer.py:297-303)."""
    task = _task(n=96, seed=11)
    cfg = MolNetADKFConfig(
        encoder=MolNetEncoderConfig(num_layers=2, emb_dim=32),
        inner_optimizer=_FAST,
    )
    adapt_ep = sample_episode(task, n_shot=16, query_size=48, seed=0)
    params = mt.init_encoder_params(cfg, jax.random.PRNGKey(2), adapt_ep.support)
    eval_eps = [sample_episode(task, 16, 32, seed=s) for s in range(1, 9)]
    before, _ = mt.evaluate_task_auroc(cfg, params, eval_eps)
    adapted = mt.test_time_adapt(cfg, params, adapt_ep, num_steps=16, lr=3e-3)
    auroc, _ = mt.evaluate_task_auroc(cfg, adapted, eval_eps)
    # measured: untrained ~0.35, adapted ~0.80 at these seeds
    assert auroc > 0.7, (before, auroc)
    assert auroc > before + 0.2, (before, auroc)


def test_molnet_csv_end_to_end():
    """Raw-CSV -> tasks -> episodes -> AUROC on the small checked-in CSV
    (tests/data/molnet_smoke.csv, tox21-style columns). RDKit-gated: the
    SMILES featurizer needs it."""
    pytest.importorskip("rdkit")
    import os

    from adkf_ift_tpu.moleculenet.data import load_moleculenet_csv

    csv = os.path.join(os.path.dirname(__file__), "data", "molnet_smoke.csv")
    tasks = load_moleculenet_csv(csv)
    assert len(tasks) >= 1
    task = max(tasks, key=lambda t: len(t.graphs))
    cfg = MolNetADKFConfig(
        encoder=MolNetEncoderConfig(num_layers=2, emb_dim=32), inner_optimizer=_FAST
    )
    ep = sample_episode(task, n_shot=4, query_size=8, seed=0)
    params = mt.init_encoder_params(cfg, jax.random.PRNGKey(0), ep.support)
    auroc, scores = mt.evaluate_task_auroc(cfg, params, [ep])
    assert np.isfinite(auroc)


def test_sample_episode_protocol():
    task = _task(n=60, seed=2)
    ep = sample_episode(task, n_shot=5, query_size=16, seed=3)
    s_labels = np.asarray(ep.support_labels)
    real = np.asarray(ep.support.graph_mask) > 0
    assert real.sum() == 10  # 2 classes x 5 shots
    assert (s_labels[real] > 0).sum() == 5
    ep2 = sample_episode(task, n_shot=5, query_size=16, seed=3)
    assert np.array_equal(ep.support_labels, ep2.support_labels)  # seeded determinism
