"""PAR (relation net + MAML) and MAT (molecule transformer) model tests."""

import numpy as np
import jax
import jax.numpy as jnp

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode
from adkf_ift_tpu.data.mat import pack_dense_molecules
from adkf_ift_tpu.models import mat, par
from adkf_ift_tpu.modules import (
    CombinedFeatureConfig,
    GNNConfig,
    GraphFeatureExtractorConfig,
    GraphReadoutConfig,
)
from adkf_ift_tpu.utils.synthetic import make_task

from dataclasses import replace


def _tiny_par_config():
    feats = CombinedFeatureConfig(
        used_features="gnn+ecfp+fc",
        graph_config=GraphFeatureExtractorConfig(
            gnn_config=GNNConfig(num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8, intermediate_dim=64),
            readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16),
        ),
        fc_hidden_dim=64,
        fc_out_dim=32,
    )
    return par.PARModelConfig(
        features=feats, emb_dim=32, map_dim=16, rel_hidden_dim=16,
    )


def _episode(spec=EpisodeSpec(support_size=16, query_size=32), seed=0):
    task = make_task(num_samples=120, seed=seed)
    return build_episode(
        StratifiedTaskSampler(spec.support_size, test_size_or_ratio=spec.query_size).sample(task, 0),
        spec,
    )


def test_par_loss_grads_and_predict():
    cfg = _tiny_par_config()
    ep = _episode()
    params = par.init_params(cfg, jax.random.PRNGKey(0), ep)
    loss, grads = jax.jit(jax.value_and_grad(lambda p: par.episode_loss(cfg, p, ep)))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # Encoder receives gradient through the relation net.
    enc_norm = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(grads.encoder))
    assert enc_norm > 0

    probs = jax.jit(lambda p: par.episode_predict(cfg, p, ep))(params)
    probs = np.asarray(probs)
    mask = np.asarray(ep.query.graph_mask) > 0
    assert np.all((probs[mask] >= 0) & (probs[mask] <= 1))


def test_par_second_order_differs_from_first_order():
    cfg2 = _tiny_par_config()
    cfg1 = replace(cfg2, second_order_maml=False)
    ep = _episode(seed=3)
    params = par.init_params(cfg2, jax.random.PRNGKey(0), ep)
    g2 = jax.grad(lambda p: par.episode_loss(cfg2, p, ep))(params)
    g1 = jax.grad(lambda p: par.episode_loss(cfg1, p, ep))(params)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g2, g1)
    assert max(jax.tree.leaves(diffs)) > 1e-9


def test_mat_finetune_and_predict():
    task = make_task(num_samples=64, seed=7)
    support = pack_dense_molecules(task.samples[:16], num_graphs=16, max_atoms=48)
    query = pack_dense_molecules(task.samples[16:48], num_graphs=32, max_atoms=48)
    cfg = mat.MATConfig(hidden_dim=32, num_layers=2, num_heads=4, ff_dim=64, finetune_steps=8)
    params = mat.init_params(cfg, jax.random.PRNGKey(0), support)

    l0 = float(mat.batch_loss(cfg, params, support))
    tuned = jax.jit(lambda p: mat.finetune(cfg, p, support))(params)
    l1 = float(mat.batch_loss(cfg, tuned, support))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, (l0, l1)

    probs = np.asarray(jax.jit(lambda p: mat.episode_predict(cfg, p, support, query))(params))
    assert probs.shape == (32,)
    assert np.all((probs >= 0) & (probs <= 1))


def test_dense_mol_pack_hop_distance():
    task = make_task(num_samples=4, seed=1)
    batch = pack_dense_molecules(task.samples, num_graphs=4, max_atoms=48)
    # Chain structure: dist(0,1)=1 for real molecules; diagonal 0.
    assert batch.distance[0, 0, 0] == 0.0
    v = int(batch.atom_mask[0].sum())
    assert batch.distance[0, 0, 1] == 1.0
    assert batch.adjacency[0, 0, 1] == 1.0
    assert v > 2
