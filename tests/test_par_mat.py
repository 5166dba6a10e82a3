"""PAR (relation net + MAML) and MAT (molecule transformer) model tests."""

import numpy as np
import pytest
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


def _published_mat_state_dict(rng, d_atom, d_model, n_layers, n_heads):
    """A state dict with the published GraphTransformer tensor names
    (the layout fs_mol/models/mat.py:29-100 loads), random values."""
    import torch

    def lin(key, din, dout, sd):
        sd[f"{key}.weight"] = torch.tensor(
            rng.randn(dout, din).astype(np.float32) * 0.2
        )
        sd[f"{key}.bias"] = torch.tensor(rng.randn(dout).astype(np.float32) * 0.1)

    def norm(key, sd):
        sd[f"{key}.a_2"] = torch.tensor(1.0 + 0.1 * rng.randn(d_model).astype(np.float32))
        sd[f"{key}.b_2"] = torch.tensor(0.1 * rng.randn(d_model).astype(np.float32))

    sd = {}
    lin("src_embed.lut", d_atom, d_model, sd)
    for i in range(n_layers):
        base = f"encoder.layers.{i}"
        for j in range(4):
            lin(f"{base}.self_attn.linears.{j}", d_model, d_model, sd)
        lin(f"{base}.feed_forward.linears.0", d_model, d_model, sd)
        norm(f"{base}.sublayer.0.norm", sd)
        norm(f"{base}.sublayer.1.norm", sd)
    norm("encoder.norm", sd)
    lin("generator.proj", d_model, 1, sd)
    return sd


def _torch_mat_forward(sd, cfg, feats, adj, dist, mask):
    """Independent torch mirror of the published MAT forward (pre-norm
    sublayers, annotated-transformer LayerNorm with unbiased std + eps
    outside sqrt, exp distance kernel without renormalization,
    row-normalized adjacency, masked-mean generator)."""
    import torch

    la, ld = cfg.lambda_attention, cfg.lambda_distance
    lg = 1.0 - la - ld
    h = cfg.num_heads
    feats = torch.tensor(feats)
    adj = torch.tensor(adj)
    dist = torch.tensor(dist)
    mask = torch.tensor(mask)

    def layer_norm(x, key):
        mean = x.mean(-1, keepdim=True)
        std = x.std(-1, keepdim=True)  # torch default: unbiased
        return sd[f"{key}.a_2"] * (x - mean) / (std + 1e-6) + sd[f"{key}.b_2"]

    def linear(x, key):
        return x @ sd[f"{key}.weight"].T + sd[f"{key}.bias"]

    x = linear(feats, "src_embed.lut")
    g, a, dm = x.shape
    dk = dm // h
    key_mask = mask[:, None, None, :]  # mask KEYS (published convention)
    for i in range(cfg.num_layers):
        base = f"encoder.layers.{i}"
        xn = layer_norm(x, f"{base}.sublayer.0.norm")
        q, k, v = (
            linear(xn, f"{base}.self_attn.linears.{j}").view(g, a, h, dk).transpose(1, 2)
            for j in range(3)
        )
        scores = q @ k.transpose(-2, -1) / dk**0.5
        scores = scores.masked_fill(key_mask == 0, float("-inf"))
        p_attn = torch.softmax(scores, dim=-1)
        d_masked = dist.masked_fill(mask[:, None, :].expand(-1, a, -1) == 0, float("inf"))
        p_dist = torch.exp(-d_masked)[:, None]
        p_adj = (adj / (adj.sum(-1, keepdim=True) + 1e-6))[:, None]
        mixed = la * p_attn + ld * p_dist + lg * p_adj
        out = (mixed @ v).transpose(1, 2).reshape(g, a, dm)
        x = x + linear(out, f"{base}.self_attn.linears.3")
        xn = layer_norm(x, f"{base}.sublayer.1.norm")
        ff = torch.nn.functional.leaky_relu(
            linear(xn, f"{base}.feed_forward.linears.0"),
            negative_slope=cfg.leaky_relu_slope,
        )
        x = x + ff
    x = layer_norm(x, "encoder.norm")
    m = mask[:, :, None]
    pooled = (x * m).sum(1) / m.sum(1)
    return (linear(pooled, "generator.proj"))[:, 0].numpy()


def test_mat_pretrained_import_matches_torch_mirror():
    """load_pretrained_torch_weights + variant='pretrained' must reproduce
    the published architecture's forward exactly: imported tensors through
    the flax module equal an independent torch implementation of the
    published equations on the same random molecules."""
    import torch

    from adkf_ift_tpu.data.mat import DenseMolBatch

    rng = np.random.RandomState(0)
    d_atom, d_model, n_layers, n_heads, g, a = 12, 32, 2, 4, 5, 10
    cfg = mat.pretrained_mat_config(
        hidden_dim=d_model, num_layers=n_layers, num_heads=n_heads, ff_dim=d_model
    )
    sd = _published_mat_state_dict(rng, d_atom, d_model, n_layers, n_heads)

    feats = rng.rand(g, a, d_atom).astype(np.float32)
    n_atoms = rng.randint(4, a + 1, size=g)
    mask = (np.arange(a)[None] < n_atoms[:, None]).astype(np.float32)
    feats *= mask[:, :, None]
    adj = (rng.rand(g, a, a) > 0.6).astype(np.float32)
    adj = np.maximum(adj, adj.transpose(0, 2, 1)) * mask[:, :, None] * mask[:, None, :]
    dist = np.abs(rng.randn(g, a, a)).astype(np.float32)
    dist = 0.5 * (dist + dist.transpose(0, 2, 1))

    batch = DenseMolBatch(
        node_features=feats, adjacency=adj, distance=dist, atom_mask=mask,
        labels=np.zeros(g, np.float32), graph_mask=np.ones(g, np.float32),
    )
    params = mat.init_params(cfg, jax.random.PRNGKey(0), batch)
    imported = mat.load_pretrained_torch_weights(cfg, params, dict(sd))

    ours = np.asarray(mat.MATModel(cfg).apply(imported, batch))
    theirs = _torch_mat_forward(sd, cfg, feats, adj, dist, mask)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_mat_pretrained_import_rejects_bad_shapes():
    from adkf_ift_tpu.data.mat import DenseMolBatch

    rng = np.random.RandomState(1)
    cfg = mat.pretrained_mat_config(hidden_dim=32, num_layers=1, num_heads=4, ff_dim=32)
    batch = DenseMolBatch(
        node_features=np.zeros((2, 4, 12), np.float32),
        adjacency=np.zeros((2, 4, 4), np.float32),
        distance=np.zeros((2, 4, 4), np.float32),
        atom_mask=np.ones((2, 4), np.float32),
        labels=np.zeros(2, np.float32),
        graph_mask=np.ones(2, np.float32),
    )
    params = mat.init_params(cfg, jax.random.PRNGKey(0), batch)
    sd = _published_mat_state_dict(rng, 12, 32, 1, 4)
    import pytest as _pytest
    import torch

    bad = dict(sd)
    bad["src_embed.lut.weight"] = torch.zeros(32, 13)  # wrong d_atom
    with _pytest.raises(ValueError):
        mat.load_pretrained_torch_weights(cfg, params, bad)
    missing = dict(sd)
    del missing["encoder.norm.a_2"]
    with _pytest.raises(KeyError):
        mat.load_pretrained_torch_weights(cfg, params, missing)


def test_mat_published_featurizer_gated():
    """Published 28-dim featurization (dummy node, 3D/2D distances) —
    runs only when RDKit is available."""
    pytest.importorskip("rdkit")
    from adkf_ift_tpu.data.mat import (
        MAT_ATOM_FDIM, featurize_smiles_mat, pack_dense_mat_features,
    )

    f, a, d = featurize_smiles_mat("CCO")
    assert f.shape == (4, MAT_ATOM_FDIM)  # 3 heavy atoms + dummy node
    assert f[0, 0] == 1.0 and f[0, 1:].sum() == 0.0
    assert a[0].sum() == 0.0  # dummy node disconnected
    assert (d[0, 1:] > 1e5).all()
    batch = pack_dense_mat_features([(f, a, d)], [1.0], num_graphs=2, max_atoms=8)
    assert batch.node_features.shape == (2, 8, MAT_ATOM_FDIM)
    assert batch.graph_mask.tolist() == [1.0, 0.0]
