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


def _dense_masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Masked softmax along `axis` of a dense-block tensor; masked slots
    get probability 0 (the dense twin of segment_softmax)."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(jnp.expand_dims(mask, -1) > 0, scores, neg_inf)
    smax = jnp.max(masked, axis=axis, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.where(jnp.isfinite(masked), jnp.exp(masked - smax), 0.0)
    return ex / jnp.maximum(jnp.sum(ex, axis=axis, keepdims=True), 1e-16)


def _dense_masked_pool(x: jnp.ndarray, mask: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Masked min/max/sum/mean over the node axis of [G, N, D] blocks."""
    m = mask[..., None]
    if kind == "sum":
        return jnp.sum(x * m, axis=1)
    if kind == "mean":
        return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    fill = jnp.asarray(-jnp.inf if kind == "max" else jnp.inf, x.dtype)
    red = jnp.max if kind == "max" else jnp.min
    out = red(jnp.where(m > 0, x, fill), axis=1)
    return jnp.where(jnp.isfinite(out), out, 0.0)


class MultiHeadWeightedReadout(nn.Module):
    """Scored multi-head pooling (graph_readout.py:180-259).

    Accepts either the flat layout ([V, D] + node_to_graph segment ids)
    or the dense-block layout ([G, N, D] + [G, N] mask, node_to_graph
    ignored), pooling by segment ops or masked axis reductions
    respectively."""

    out_dim: int
    num_heads: int
    head_dim: int
    weighting_type: Literal["weighted_sum", "weighted_mean"]
    num_mlp_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node_embeddings, node_to_graph, node_mask, num_graphs):
        dense = node_embeddings.ndim == 3
        hidden = (self.head_dim * self.num_heads,) * self.num_mlp_layers
        # Scores in f32 (softmax/sigmoid weighting), values in compute dtype.
        scores = MLP(hidden, self.num_heads, dtype=self.dtype, name="scoring")(
            node_embeddings
        ).astype(jnp.float32)
        if self.weighting_type == "weighted_sum":
            weights = nn.sigmoid(scores)
        elif dense:
            weights = _dense_masked_softmax(scores, node_mask, axis=1)
        else:
            weights = segment_softmax(scores, node_to_graph, num_graphs + 1, node_mask)

        values = MLP(hidden, self.num_heads * self.head_dim, dtype=self.dtype, name="transform")(node_embeddings)
        values = values.reshape(*values.shape[:-1], self.num_heads, self.head_dim)
        weighted = (weights[..., None].astype(values.dtype) * values).reshape(
            *values.shape[:-2], self.num_heads * self.head_dim
        )
        # Pool in f32: graphs sum over up to dozens of nodes.
        if dense:
            pooled = _dense_masked_pool(weighted.astype(jnp.float32), node_mask, "sum")
        else:
            pooled = segment_sum(
                weighted.astype(jnp.float32), node_to_graph, num_graphs + 1, node_mask
            )[:num_graphs]
        return nn.Dense(self.out_dim, use_bias=False, name="combination")(pooled)


class UnweightedReadout(nn.Module):
    """min/max/sum/mean pooling (graph_readout.py:262-296); flat or
    dense-block layout (see MultiHeadWeightedReadout)."""

    out_dim: int
    pooling_type: Literal["min", "max", "sum", "mean"]

    @nn.compact
    def __call__(self, node_embeddings, node_to_graph, node_mask, num_graphs):
        if node_embeddings.ndim == 3:
            pooled = _dense_masked_pool(node_embeddings, node_mask, self.pooling_type)
        else:
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
    (graph_readout.py:119-177), computed FUSED.

    The reference instantiates two independent weighted readouts, i.e.
    four 1-hidden-layer MLPs (scoring + transform, twice) that all read
    the same node representation — the widest activation in the model
    ([V, (L+1)*hidden]). On a bandwidth-bound device re-reading that
    input four times IS the cost, so here:
      * the four first layers are ONE matmul into 4 branch slices,
      * the four second layers are two batched einsums (scores/values),
      * both weighted branches pool with ONE segment_sum (the softmax
        weights of the weighted_mean branch make a plain sum the
        weighted mean, graph_readout.py:238-247).
    Identical math and init distributions (lecun per-branch fan-in)."""

    out_dim: int
    num_heads: int
    head_dim: int

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node_embeddings, node_to_graph, node_mask, num_graphs):
        dense = node_embeddings.ndim == 3
        nh, hd = self.num_heads, self.head_dim
        width = nh * hd  # hidden width of each of the 4 branch MLPs
        x = node_embeddings.astype(self.dtype)
        lead = x.shape[:-1]  # [V] flat / [G, N] dense

        # Branch order along the fused axis: [mean_scores, sum_scores,
        # mean_values, sum_values].
        w1 = self.param(
            "fused_hidden_w", nn.initializers.lecun_normal(), (x.shape[-1], 4 * width), jnp.float32
        )
        b1 = self.param("fused_hidden_b", nn.initializers.zeros, (4 * width,), jnp.float32)
        hidden = nn.relu(x @ w1.astype(self.dtype) + b1.astype(self.dtype))
        hidden = hidden.reshape(*lead, 4, width)

        w_sc = self.param(
            "scores_w", nn.initializers.lecun_normal(batch_axis=(0,)), (2, width, nh), jnp.float32
        )
        b_sc = self.param("scores_b", nn.initializers.zeros, (2, nh), jnp.float32)
        scores = (
            jnp.einsum("...bh,bho->...bo", hidden[..., :2, :], w_sc.astype(self.dtype))
            + b_sc.astype(self.dtype)
        ).astype(jnp.float32)  # f32 softmax/sigmoid weighting

        w_val = self.param(
            "values_w",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (2, width, width),
            jnp.float32,
        )
        b_val = self.param("values_b", nn.initializers.zeros, (2, width), jnp.float32)
        values = jnp.einsum(
            "...bh,bho->...bo", hidden[..., 2:, :], w_val.astype(self.dtype)
        ) + b_val.astype(self.dtype)

        if dense:
            mean_w = _dense_masked_softmax(scores[..., 0, :], node_mask, axis=1)
            sum_w = nn.sigmoid(scores[..., 1, :])
            weights = jnp.stack([mean_w, sum_w], axis=2)  # [G, N, 2, nh]
            weighted = weights[..., None].astype(values.dtype) * values.reshape(
                *lead, 2, nh, hd
            )
            pooled = _dense_masked_pool(
                weighted.reshape(*lead, 2 * width).astype(jnp.float32), node_mask, "sum"
            ).reshape(-1, 2, width)
        else:
            mean_w = segment_softmax(scores[:, 0], node_to_graph, num_graphs + 1, node_mask)
            sum_w = nn.sigmoid(scores[:, 1])
            weights = jnp.stack([mean_w, sum_w], axis=1)  # [V, 2, nh]
            weighted = weights[..., None].astype(values.dtype) * values.reshape(-1, 2, nh, hd)
            # Pool both branches in one f32 segment_sum (graphs sum over
            # up to dozens of nodes).
            pooled = segment_sum(
                weighted.reshape(-1, 2 * width).astype(jnp.float32),
                node_to_graph,
                num_graphs + 1,
                node_mask,
            )[:num_graphs].reshape(-1, 2, width)

        w_comb = self.param(
            "branch_combination_w",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (2, width, self.out_dim),
            jnp.float32,
        )
        branch_repr = jnp.einsum("gbh,bho->gbo", pooled, w_comb)  # [G, 2, out]

        max_repr = UnweightedReadout(self.out_dim, "max", name="max_pool")(
            node_embeddings, node_to_graph, node_mask, num_graphs
        )
        raw = jnp.concatenate([branch_repr[:, 0], branch_repr[:, 1], max_repr], axis=1)
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
