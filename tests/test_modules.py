"""Encoder tests: segment ops vs numpy, GNN shape/finite checks for all
message-passing families and readouts, permutation invariance, and
padding invariance (same molecules, different pad budgets => identical
embeddings — the property that makes static shapes safe)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adkf_ift_tpu.data import EpisodeSpec, GraphPadSpec, pack_graphs
from adkf_ift_tpu.modules import (
    CombinedFeatureConfig,
    CombinedFeatureExtractor,
    GNNConfig,
    GraphFeatureExtractor,
    GraphFeatureExtractorConfig,
    GraphReadoutConfig,
)
from adkf_ift_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from adkf_ift_tpu.utils.synthetic import make_task


def test_segment_ops_vs_numpy():
    rng = np.random.RandomState(0)
    data = rng.randn(20, 5).astype(np.float32)
    ids = rng.randint(0, 4, 20)
    mask = (rng.rand(20) > 0.3).astype(np.float32)

    got_sum = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), 4, jnp.asarray(mask)))
    got_mean = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), 4, jnp.asarray(mask)))
    got_max = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), 4, jnp.asarray(mask)))
    for s in range(4):
        sel = (ids == s) & (mask > 0)
        if sel.any():
            assert np.allclose(got_sum[s], data[sel].sum(0), atol=1e-5)
            assert np.allclose(got_mean[s], data[sel].mean(0), atol=1e-5)
            assert np.allclose(got_max[s], data[sel].max(0), atol=1e-5)
        else:
            assert np.allclose(got_sum[s], 0)
            assert np.allclose(got_max[s], 0)


def test_segment_softmax_sums_to_one():
    rng = np.random.RandomState(1)
    scores = rng.randn(30, 3).astype(np.float32)
    ids = rng.randint(0, 5, 30)
    mask = (rng.rand(30) > 0.2).astype(np.float32)
    probs = np.asarray(segment_softmax(jnp.asarray(scores), jnp.asarray(ids), 5, jnp.asarray(mask)))
    assert np.all(probs[mask == 0] == 0)
    for s in range(5):
        sel = (ids == s) & (mask > 0)
        if sel.any():
            assert np.allclose(probs[sel].sum(0), 1.0, atol=1e-5)


def _packed(num=6, seed=0, nodes_per_graph=48, edges_per_graph=112):
    task = make_task(num_samples=num, seed=seed)
    spec = GraphPadSpec.for_graphs(num, nodes_per_graph, edges_per_graph)
    return task, pack_graphs(task.samples, spec)


@pytest.mark.parametrize("gnn_type", ["PNA", "MultiAggr", "Plain", "MultiHeadAttention"])
def test_graph_feature_extractor_all_mp_types(gnn_type):
    _, packed = _packed()
    cfg = GraphFeatureExtractorConfig(
        gnn_config=GNNConfig(type=gnn_type, num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8, intermediate_dim=64),
        readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16),
    )
    model = GraphFeatureExtractor(cfg)
    params = model.init(jax.random.PRNGKey(0), packed)
    out = model.apply(params, packed)
    assert out.shape == (6, 16)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("readout", ["combined", "sum", "mean", "max", "min", "weighted_sum", "weighted_mean"])
def test_readout_types(readout):
    _, packed = _packed()
    cfg = GraphFeatureExtractorConfig(
        gnn_config=GNNConfig(num_layers=1, hidden_dim=16, num_heads=2, per_head_dim=4, intermediate_dim=0),
        readout_config=GraphReadoutConfig(readout_type=readout, num_heads=2, head_dim=4, output_dim=8),
    )
    model = GraphFeatureExtractor(cfg)
    params = model.init(jax.random.PRNGKey(0), packed)
    out = model.apply(params, packed)
    assert out.shape == (6, 8)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("gnn_type", ["PNA", "MultiAggr", "Plain", "MultiHeadAttention"])
def test_dense_block_layout_matches_flat(gnn_type):
    """The dense-block layout (ops/dense_block.py: [G, N] node blocks,
    one-hot MXU gathers, masked K-axis aggregation, dense readout
    pooling) computes the SAME function as the flat mega-graph layout
    under the SAME parameters, for every MP family + combined readout."""
    from adkf_ift_tpu.ops.dense_block import flat_to_dense

    _, packed = _packed(num=6, seed=0)
    dense = flat_to_dense(packed, nodes_per_graph=48, k_per_type=(8, 6, 6))
    cfg = GraphFeatureExtractorConfig(
        gnn_config=GNNConfig(
            type=gnn_type, num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8,
            intermediate_dim=64, dtype="float32", remat_blocks=False,
        ),
        readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16, dtype="float32"),
    )
    model = GraphFeatureExtractor(cfg)
    params = model.init(jax.random.PRNGKey(0), packed)
    out_flat = np.asarray(model.apply(params, packed))
    out_dense = np.asarray(model.apply(params, dense))
    assert out_flat.shape == out_dense.shape == (6, 16)
    assert np.allclose(out_flat, out_dense, atol=2e-4), np.abs(out_flat - out_dense).max()


def test_combined_readout_fused_matches_unfused():
    """The fused CombinedReadout (one wide matmul + batched branch
    einsums + single pooled segment_sum) computes EXACTLY the reference
    composition: weighted_mean ++ weighted_sum ++ max -> relu -> linear
    (graph_readout.py:119-177). Map the fused params onto two standalone
    MultiHeadWeightedReadouts and compare."""
    from flax import linen as nn

    from adkf_ift_tpu.modules.readout import (
        CombinedReadout,
        MultiHeadWeightedReadout,
        UnweightedReadout,
    )

    rng = np.random.RandomState(7)
    v, d, g, nh, hd, out = 23, 12, 4, 2, 3, 5
    w = nh * hd
    x = jnp.asarray(rng.randn(v, d).astype(np.float32))
    ids_np = rng.randint(0, g, v)
    mask_np = (rng.rand(v) > 0.25).astype(np.float32)
    ids_np[mask_np == 0] = g  # padded nodes go to the dummy slot
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    fused = CombinedReadout(out, nh, hd, dtype=jnp.float32)
    fp = fused.init(jax.random.PRNGKey(0), x, ids, mask, g)["params"]
    got = np.asarray(fused.apply({"params": fp}, x, ids, mask, g))

    def branch_params(score_idx, value_idx):
        return {
            "scoring": {
                "hidden0": {
                    "kernel": fp["fused_hidden_w"][:, score_idx * w : (score_idx + 1) * w],
                    "bias": fp["fused_hidden_b"][score_idx * w : (score_idx + 1) * w],
                },
                "out": {"kernel": fp["scores_w"][score_idx], "bias": fp["scores_b"][score_idx]},
            },
            "transform": {
                "hidden0": {
                    "kernel": fp["fused_hidden_w"][:, value_idx * w : (value_idx + 1) * w],
                    "bias": fp["fused_hidden_b"][value_idx * w : (value_idx + 1) * w],
                },
                "out": {"kernel": fp["values_w"][score_idx], "bias": fp["values_b"][score_idx]},
            },
            "combination": {"kernel": fp["branch_combination_w"][score_idx]},
        }

    mean_mod = MultiHeadWeightedReadout(out, nh, hd, "weighted_mean", dtype=jnp.float32)
    sum_mod = MultiHeadWeightedReadout(out, nh, hd, "weighted_sum", dtype=jnp.float32)
    max_mod = UnweightedReadout(out, "max")
    mean_r = mean_mod.apply({"params": branch_params(0, 2)}, x, ids, mask, g)
    sum_r = sum_mod.apply({"params": branch_params(1, 3)}, x, ids, mask, g)
    max_r = max_mod.apply({"params": fp["max_pool"]}, x, ids, mask, g)
    raw = nn.relu(jnp.concatenate([mean_r, sum_r, max_r], axis=1))
    want = np.asarray(raw @ fp["combination"]["kernel"])
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_padding_invariance():
    """Same molecules packed under different budgets give identical embeddings."""
    task, packed_small = _packed(num=4, seed=3)
    spec_big = GraphPadSpec.for_graphs(4, nodes_per_graph=96, edges_per_graph=224)
    packed_big = pack_graphs(task.samples, spec_big)

    cfg = GraphFeatureExtractorConfig(
        gnn_config=GNNConfig(num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8, intermediate_dim=64),
        readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16),
    )
    model = GraphFeatureExtractor(cfg)
    params = model.init(jax.random.PRNGKey(0), packed_small)
    out_small = np.asarray(model.apply(params, packed_small))
    out_big = np.asarray(model.apply(params, packed_big))
    assert np.allclose(out_small, out_big, atol=2e-4), np.abs(out_small - out_big).max()


def test_graph_order_permutation_invariance():
    """Permuting the order of molecules in the pack permutes embeddings."""
    task, _ = _packed(num=5, seed=4)
    spec = GraphPadSpec.for_graphs(5)
    packed_a = pack_graphs(task.samples, spec)
    perm = [3, 1, 4, 0, 2]
    packed_b = pack_graphs([task.samples[i] for i in perm], spec)

    cfg = GraphFeatureExtractorConfig(
        gnn_config=GNNConfig(num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8, intermediate_dim=0),
        readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16),
    )
    model = GraphFeatureExtractor(cfg)
    params = model.init(jax.random.PRNGKey(0), packed_a)
    out_a = np.asarray(model.apply(params, packed_a))
    out_b = np.asarray(model.apply(params, packed_b))
    assert np.allclose(out_a[perm], out_b, atol=2e-4)


@pytest.mark.parametrize(
    "used", ["gnn", "ecfp", "gnn+ecfp", "ecfp+fc", "gnn+ecfp+fc", "gnn+ecfp+pc-descs+fc"]
)
def test_combined_feature_extractor(used):
    _, packed = _packed(num=4, seed=5)
    cfg = CombinedFeatureConfig(
        used_features=used,
        graph_config=GraphFeatureExtractorConfig(
            gnn_config=GNNConfig(num_layers=1, hidden_dim=16, num_heads=2, per_head_dim=4, intermediate_dim=0),
            readout_config=GraphReadoutConfig(num_heads=2, head_dim=4, output_dim=8),
        ),
        fc_out_dim=32,
        fc_hidden_dim=32,
    )
    model = CombinedFeatureExtractor(cfg)
    params = model.init(jax.random.PRNGKey(0), packed)
    out = model.apply(params, packed)
    assert out.shape == (4, cfg.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_default_config_dims_match_reference():
    """Reference default architecture: 32 -> 128 hidden, 8 layers, all-state
    concat 9*128=1152 -> combined readout 512; ADKT FC head -> 2048."""
    cfg = CombinedFeatureConfig()
    assert cfg.graph_config.gnn_config.hidden_dim == 128
    assert cfg.graph_config.gnn_config.num_layers == 8
    assert cfg.graph_config.readout_config.output_dim == 512
    assert cfg.output_dim == 2048
