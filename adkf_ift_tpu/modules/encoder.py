"""Molecule feature extractors.

GraphFeatureExtractor (fs_mol/modules/graph_feature_extractor.py:43-98):
node projection (32 -> hidden, no bias) -> GNN -> concat all per-layer
states (use_all_states) -> readout -> optional Layer/BatchNorm -> 512-d
molecule embedding.

CombinedFeatureExtractor (the ADKT/DKT/ProtoNet/CNP front-end,
adaptive_dkt.py:42-65, 137-160): GNN embedding ⊕ ECFP fingerprint ⊕
phys-chem descriptors, optional 2-layer FC projection to 2048-d and
optional L2 normalization (cossim kernel).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
from flax import linen as nn

from adkf_ift_tpu.data.task import DESCRIPTOR_DIM, FINGERPRINT_DIM, NUM_NODE_FEATURES
from adkf_ift_tpu.data.episodes import PackedGraphs
from adkf_ift_tpu.modules.gnn import GNN, GNNConfig
from adkf_ift_tpu.modules.readout import GraphReadoutConfig, make_readout


@dataclass(frozen=True)
class GraphFeatureExtractorConfig:
    initial_node_feature_dim: int = NUM_NODE_FEATURES
    gnn_config: GNNConfig = field(default_factory=GNNConfig)
    readout_config: GraphReadoutConfig = field(default_factory=GraphReadoutConfig)
    output_norm: str = "off"  # off | layer | batch


class GraphFeatureExtractor(nn.Module):
    config: GraphFeatureExtractorConfig

    @nn.compact
    def __call__(self, batch, deterministic: bool = True) -> jnp.ndarray:
        """`batch` is a PackedGraphs (flat mega-graph) or a DenseBlocks
        (per-graph [G, N] blocks, ops/dense_block.py); both layouts share
        one parameter set."""
        cfg = self.config
        dense = batch.node_features.ndim == 3
        x = nn.Dense(cfg.gnn_config.hidden_dim, use_bias=False, name="init_node_proj")(
            batch.node_features
        )
        if dense:
            states = GNN(cfg.gnn_config, name="gnn")(
                x, batch.in_src, None, batch.in_mask, deterministic
            )
        else:
            states = GNN(cfg.gnn_config, name="gnn")(
                x, batch.edge_sources, batch.edge_targets, batch.edge_mask, deterministic
            )
        if cfg.readout_config.use_all_states:
            # The all-states concat is the widest activation in the model
            # ([V, (L+1)*hidden]); store it in the readout's compute dtype.
            node_repr = jnp.concatenate(
                [s.astype(cfg.readout_config.compute_dtype) for s in states], axis=-1
            )
        else:
            node_repr = states[-1]

        num_graphs = batch.num_graphs
        mol = make_readout(cfg.readout_config)(
            node_repr, None if dense else batch.node_to_graph, batch.node_mask, num_graphs
        )
        if cfg.output_norm == "layer":
            mol = nn.LayerNorm(name="final_norm")(mol)
        elif cfg.output_norm == "batch":
            # Masked batch statistics over the real graphs only; padded
            # rows would otherwise skew the batch norm.
            m = batch.graph_mask[:, None]
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(mol * m, axis=0, keepdims=True) / count
            var = jnp.sum(((mol - mean) ** 2) * m, axis=0, keepdims=True) / count
            mol = (mol - mean) / jnp.sqrt(var + 1e-5)
            scale = self.param("bn_scale", nn.initializers.ones, (mol.shape[-1],))
            bias = self.param("bn_bias", nn.initializers.zeros, (mol.shape[-1],))
            mol = mol * scale + bias
        return mol * batch.graph_mask[:, None]


@dataclass(frozen=True)
class CombinedFeatureConfig:
    """used_features grammar of the reference (adaptive_dkt.py:30-33)."""

    used_features: str = "gnn+ecfp+fc"
    graph_config: GraphFeatureExtractorConfig = field(default_factory=GraphFeatureExtractorConfig)
    fc_out_dim: int = 2048
    fc_hidden_dim: int = 2048
    normalize_output: bool = False  # True for cossim kernels

    @property
    def use_gnn(self) -> bool:
        return "gnn" in self.used_features

    @property
    def use_ecfp(self) -> bool:
        return "ecfp" in self.used_features

    @property
    def use_descriptors(self) -> bool:
        return "pc-descs" in self.used_features

    @property
    def use_fc(self) -> bool:
        return self.used_features.endswith("+fc")

    @property
    def output_dim(self) -> int:
        if self.use_fc:
            return self.fc_out_dim
        dim = 0
        if self.use_gnn:
            dim += self.graph_config.readout_config.output_dim
        if self.use_ecfp:
            dim += FINGERPRINT_DIM
        if self.use_descriptors:
            dim += DESCRIPTOR_DIM
        return dim


def flatten_stacked_dense(stacked):
    """Dense-block twin of flatten_stacked: a stacked [C, G, N, ...]
    batch of DenseBlocks IS already disconnected per graph — flattening
    is a pure reshape [C, G, ...] -> [C*G, ...]."""
    from adkf_ift_tpu.ops.dense_block import DenseBlocks

    c, g = stacked.graph_mask.shape[:2]
    flat2 = lambda a: a.reshape((c * g,) + a.shape[2:])
    return DenseBlocks(
        node_features=flat2(stacked.node_features),
        node_mask=flat2(stacked.node_mask),
        in_src=tuple(flat2(s) for s in stacked.in_src),
        in_mask=tuple(flat2(m) for m in stacked.in_mask),
        fingerprints=flat2(stacked.fingerprints),
        descriptors=flat2(stacked.descriptors),
        graph_mask=stacked.graph_mask.reshape(-1),
    )


def combine_dense(support, query):
    """Dense-block twin of combine_packed: concatenate along the graph
    axis (support graphs first)."""
    from adkf_ift_tpu.ops.dense_block import DenseBlocks

    cat = lambda a, b: jnp.concatenate([a, b], axis=0)
    return DenseBlocks(
        node_features=cat(support.node_features, query.node_features),
        node_mask=cat(support.node_mask, query.node_mask),
        in_src=tuple(cat(a, b) for a, b in zip(support.in_src, query.in_src)),
        in_mask=tuple(cat(a, b) for a, b in zip(support.in_mask, query.in_mask)),
        fingerprints=cat(support.fingerprints, query.fingerprints),
        descriptors=cat(support.descriptors, query.descriptors),
        graph_mask=cat(support.graph_mask, query.graph_mask),
    )


def flatten_stacked(stacked: PackedGraphs) -> PackedGraphs:
    """Flatten a stacked [C, ...] batch of packed mega-graphs into ONE
    mega-graph of C× the graphs.

    TPU rationale: vmapping the encoder over episodes puts a batch
    dimension on every gather/scatter, which XLA lowers off the fast
    path (measured 1.5× WORSE than sequential on v5e). Graphs are
    disconnected components, so a task chunk can instead be packed flat
    — the encoder runs with 1-D gathers and constant op count
    regardless of chunk size; only the small dense GP head is vmapped.
    """
    c, nb = stacked.node_features.shape[:2]
    g = stacked.graph_mask.shape[1]
    total_graphs = c * g
    node_off = (jnp.arange(c, dtype=jnp.int32) * nb)[:, None]
    graph_off = (jnp.arange(c, dtype=jnp.int32) * g)[:, None]
    ids = jnp.where(
        stacked.node_mask > 0, stacked.node_to_graph + graph_off, total_graphs
    )
    return PackedGraphs(
        node_features=stacked.node_features.reshape(c * nb, -1),
        node_to_graph=ids.reshape(-1),
        node_mask=stacked.node_mask.reshape(-1),
        edge_sources=tuple((es + node_off).reshape(-1) for es in stacked.edge_sources),
        edge_targets=tuple((et + node_off).reshape(-1) for et in stacked.edge_targets),
        edge_mask=tuple(em.reshape(-1) for em in stacked.edge_mask),
        fingerprints=stacked.fingerprints.reshape(total_graphs, -1),
        descriptors=stacked.descriptors.reshape(total_graphs, -1),
        graph_mask=stacked.graph_mask.reshape(-1),
    )


def combine_packed(support: PackedGraphs, query: PackedGraphs) -> PackedGraphs:
    """Concatenate two packed mega-graphs into one (support graphs first).

    TPU rationale: the reference encodes support and query in two
    separate forwards (adaptive_dkt.py:165-171). One combined pass halves
    the number of launched kernels per episode — on top of identical
    math, since graphs are disconnected components either way. Dummy
    segment ids are remapped to the combined dummy slot.
    """
    s_graphs, q_graphs = support.num_graphs, query.num_graphs
    total = s_graphs + q_graphs
    s_off = support.node_budget

    s_ids = jnp.where(support.node_mask > 0, support.node_to_graph, total)
    q_ids = jnp.where(query.node_mask > 0, query.node_to_graph + s_graphs, total)
    return PackedGraphs(
        node_features=jnp.concatenate([support.node_features, query.node_features]),
        node_to_graph=jnp.concatenate([s_ids, q_ids]),
        node_mask=jnp.concatenate([support.node_mask, query.node_mask]),
        edge_sources=tuple(
            jnp.concatenate([es, eq + s_off])
            for es, eq in zip(support.edge_sources, query.edge_sources)
        ),
        edge_targets=tuple(
            jnp.concatenate([et, eq + s_off])
            for et, eq in zip(support.edge_targets, query.edge_targets)
        ),
        edge_mask=tuple(
            jnp.concatenate([em, eq]) for em, eq in zip(support.edge_mask, query.edge_mask)
        ),
        fingerprints=jnp.concatenate([support.fingerprints, query.fingerprints]),
        descriptors=jnp.concatenate([support.descriptors, query.descriptors]),
        graph_mask=jnp.concatenate([support.graph_mask, query.graph_mask]),
    )


class CombinedFeatureExtractor(nn.Module):
    """GNN ⊕ ECFP ⊕ descriptors -> optional FC head (adaptive_dkt.py:137-160)."""

    config: CombinedFeatureConfig

    def apply_pair(self, params, support, query):
        """Encode support and query in ONE combined forward; returns
        (support_features [S, D], query_features [Q, D]). Accepts either
        layout (PackedGraphs / DenseBlocks)."""
        dense = support.node_features.ndim == 3
        combined = (combine_dense if dense else combine_packed)(support, query)
        feats = self.apply(params, combined)
        return feats[: support.num_graphs], feats[support.num_graphs :]

    def apply_pair_batch(self, params, support, query):
        """Encode a STACKED [C, ...] batch of support/query pairs in one
        flat forward (see flatten_stacked); returns ([C, S, D], [C, Q, D])."""
        c, s = support.graph_mask.shape[:2]
        q = query.graph_mask.shape[1]
        dense = support.node_features.ndim == 4  # stacked dense blocks
        flatten = flatten_stacked_dense if dense else flatten_stacked
        fs, fq = self.apply_pair(params, flatten(support), flatten(query))
        return fs.reshape(c, s, -1), fq.reshape(c, q, -1)

    @nn.compact
    def __call__(self, batch: PackedGraphs, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        feats = []
        if cfg.use_gnn:
            feats.append(
                GraphFeatureExtractor(cfg.graph_config, name="graph_feature_extractor")(
                    batch, deterministic
                )
            )
        if cfg.use_ecfp:
            feats.append(batch.fingerprints)
        if cfg.use_descriptors:
            feats.append(batch.descriptors)
        x = jnp.concatenate(feats, axis=1)
        if cfg.use_fc:
            # Hidden layer in the GNN's compute dtype; final projection in
            # f32 — its output feeds the GP's distance computations.
            x = nn.Dense(
                cfg.fc_hidden_dim, dtype=cfg.graph_config.gnn_config.compute_dtype, name="fc1"
            )(x)
            x = nn.relu(x)
            x = nn.Dense(cfg.fc_out_dim, dtype=jnp.float32, name="fc2")(x)
        if cfg.normalize_output:
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return x * batch.graph_mask[:, None]
