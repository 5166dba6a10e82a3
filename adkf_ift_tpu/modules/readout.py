"""Graph readouts over padded node states.

Parity with fs_mol/modules/graph_readout.py:83-323: Combined
(weighted-mean + weighted-sum + max, concat -> relu -> linear),
MultiHeadWeighted (sigmoid or segment-softmax weights), and Unweighted
(min/max/sum/mean) readouts. Segment ids map padded nodes to a dummy
graph slot which is sliced off, so padding never leaks into molecule
embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax.numpy as jnp
from flax import linen as nn

from adkf_ift_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)


@dataclass(frozen=True)
class GraphReadoutConfig:
    """Defaults mirror graph_readout.py:14-28."""

    readout_type: str = "combined"
    use_all_states: bool = True
    num_heads: int = 12
    head_dim: int = 64
    output_dim: int = 512
    dtype: str = "bfloat16"  # compute dtype; params and outputs stay f32

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class MLP(nn.Module):
    """Linear stack with ReLU between layers (fs_mol/modules/mlp.py:6-22)."""

    hidden_dims: tuple
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.hidden_dims):
            x = nn.relu(nn.Dense(d, dtype=self.dtype, name=f"hidden{i}")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(x)


class MultiHeadWeightedReadout(nn.Module):
    """Scored multi-head pooling (graph_readout.py:180-259)."""

    out_dim: int
    num_heads: int
    head_dim: int
    weighting_type: Literal["weighted_sum", "weighted_mean"]
    num_mlp_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node_embeddings, node_to_graph, node_mask, num_graphs):
        hidden = (self.head_dim * self.num_heads,) * self.num_mlp_layers
        # Scores in f32 (softmax/sigmoid weighting), values in compute dtype.
        scores = MLP(hidden, self.num_heads, dtype=self.dtype, name="scoring")(
            node_embeddings
        ).astype(jnp.float32)
        if self.weighting_type == "weighted_sum":
            weights = nn.sigmoid(scores)
        else:
            weights = segment_softmax(scores, node_to_graph, num_graphs + 1, node_mask)

        values = MLP(hidden, self.num_heads * self.head_dim, dtype=self.dtype, name="transform")(node_embeddings)
        values = values.reshape(-1, self.num_heads, self.head_dim)
        weighted = (weights[..., None].astype(values.dtype) * values).reshape(
            -1, self.num_heads * self.head_dim
        )
        # Pool in f32: graphs sum over up to dozens of nodes.
        pooled = segment_sum(
            weighted.astype(jnp.float32), node_to_graph, num_graphs + 1, node_mask
        )[:num_graphs]
        return nn.Dense(self.out_dim, use_bias=False, name="combination")(pooled)


class UnweightedReadout(nn.Module):
    """min/max/sum/mean pooling (graph_readout.py:262-296)."""

    out_dim: int
    pooling_type: Literal["min", "max", "sum", "mean"]

    @nn.compact
    def __call__(self, node_embeddings, node_to_graph, node_mask, num_graphs):
        op = {
            "sum": segment_sum,
            "mean": segment_mean,
            "max": segment_max,
            "min": segment_min,
        }[self.pooling_type]
        pooled = op(node_embeddings, node_to_graph, num_graphs + 1, node_mask)[:num_graphs]
        return nn.Dense(self.out_dim, use_bias=False, name="combination")(pooled)


class CombinedReadout(nn.Module):
    """weighted_mean ++ weighted_sum ++ max -> relu -> linear
    (graph_readout.py:119-177)."""

    out_dim: int
    num_heads: int
    head_dim: int

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node_embeddings, node_to_graph, node_mask, num_graphs):
        mean_repr = MultiHeadWeightedReadout(
            self.out_dim, self.num_heads, self.head_dim, "weighted_mean",
            dtype=self.dtype, name="weighted_mean",
        )(node_embeddings, node_to_graph, node_mask, num_graphs)
        sum_repr = MultiHeadWeightedReadout(
            self.out_dim, self.num_heads, self.head_dim, "weighted_sum",
            dtype=self.dtype, name="weighted_sum",
        )(node_embeddings, node_to_graph, node_mask, num_graphs)
        max_repr = UnweightedReadout(self.out_dim, "max", name="max_pool")(
            node_embeddings, node_to_graph, node_mask, num_graphs
        )
        raw = jnp.concatenate([mean_repr, sum_repr, max_repr], axis=1)
        return nn.Dense(self.out_dim, use_bias=False, name="combination")(nn.relu(raw))


def make_readout(config: GraphReadoutConfig, name: str = "readout") -> nn.Module:
    """Factory mirroring make_readout_model (graph_readout.py:299-323)."""
    if config.readout_type.startswith("combined"):
        return CombinedReadout(
            config.output_dim, config.num_heads, config.head_dim,
            dtype=config.compute_dtype, name=name,
        )
    if "weighted" in config.readout_type:
        return MultiHeadWeightedReadout(
            config.output_dim, config.num_heads, config.head_dim, config.readout_type,
            dtype=config.compute_dtype, name=name,
        )
    return UnweightedReadout(config.output_dim, config.readout_type, name=name)
