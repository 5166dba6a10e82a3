"""Static-shape padded episode construction — the TPU-side data model.

The reference packs variable-size molecular graphs greedily into
variable-shape mega-batches (fs_mol/data/fsmol_batcher.py:97-243) and
feeds support+query through per-model adapters (fs_mol/data/dkt.py).
That design defeats XLA: every episode would recompile. Here episodes
are padded to a fixed EpisodeSpec so a single compiled program handles
every episode of a given configuration (SURVEY.md §7 design delta #1):

  * All graphs of one set (support or query) are packed into ONE
    disconnected padded mega-graph: a [node_budget] node buffer, per-
    edge-type [edge_budget, 2] adjacency buffers, and a node->graph
    segment-id vector. Padding nodes map to segment `num_graphs` (a
    dummy graph slot) and padding edges point at a dummy node.
  * Edges are pre-bidirectionalized on the host (the reference flips
    adjacency lists on-device every forward, gnn.py:539-544 — doing it
    once at pack time removes a concat from the hot path).
  * Fingerprints/descriptors ride as dense [num_graphs, D] arrays.
  * Bool labels become ±1 floats (adaptive_dkt.py:207-209); numeric
    labels are log-standardized by support-set statistics
    (fs_mol/data/dkt.py:91-97).

Everything returned is a pytree of numpy arrays ready for device_put.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from adkf_ift_tpu.data.task import (
    DESCRIPTOR_DIM,
    FINGERPRINT_DIM,
    NUM_EDGE_TYPES,
    NUM_NODE_FEATURES,
    MoleculeDatapoint,
    TaskSample,
)


class EpisodeOverflowError(Exception):
    """A sample set exceeded the node/edge budget of its EpisodeSpec."""


# Per-edge-type budgets (bidirectional slots per graph). Molecular graphs
# are dominated by single bonds; giving double/triple bonds the same
# budget as single bonds (as a naive [T, E] layout would) wastes ~2.6x
# edge compute in the message-passing hot loop.
DEFAULT_EDGES_PER_GRAPH: Tuple[int, int, int] = (80, 32, 16)


def _edge_budget_tuple(edges_per_graph) -> Tuple[int, ...]:
    if isinstance(edges_per_graph, int):
        return (edges_per_graph,) * NUM_EDGE_TYPES
    return tuple(edges_per_graph)


@dataclass(frozen=True)
class GraphPadSpec:
    """Static pad sizes for one packed graph set."""

    num_graphs: int
    node_budget: int
    edge_budgets: Tuple[int, ...]  # per edge type, bidirectional slots

    @staticmethod
    def for_graphs(
        num_graphs: int,
        nodes_per_graph: int = 48,
        edges_per_graph=DEFAULT_EDGES_PER_GRAPH,
    ) -> "GraphPadSpec":
        def _round(x, m=128):
            return ((x + m - 1) // m) * m

        return GraphPadSpec(
            num_graphs=num_graphs,
            node_budget=_round(num_graphs * nodes_per_graph),
            edge_budgets=tuple(
                _round(num_graphs * e) for e in _edge_budget_tuple(edges_per_graph)
            ),
        )


@dataclass(frozen=True)
class EpisodeSpec:
    """Static shape of one few-shot episode (a support/query pair)."""

    support_size: int
    query_size: int
    nodes_per_graph: int = 48
    edges_per_graph: Tuple[int, ...] = DEFAULT_EDGES_PER_GRAPH

    @property
    def support_pad(self) -> GraphPadSpec:
        return GraphPadSpec.for_graphs(self.support_size, self.nodes_per_graph, self.edges_per_graph)

    @property
    def query_pad(self) -> GraphPadSpec:
        return GraphPadSpec.for_graphs(self.query_size, self.nodes_per_graph, self.edges_per_graph)


class PackedGraphs(NamedTuple):
    """One disconnected padded mega-graph (device pytree).

    node_features: [node_budget, NUM_NODE_FEATURES] f32
    node_to_graph: [node_budget] i32 — padding nodes get id num_graphs.
    node_mask: [node_budget] f32
    edge_sources/edge_targets: per-edge-type tuples of [edge_budget_t]
        i32 — bidirectional; the budgets differ per type (single bonds
        dominate molecules). Padding edges point at node node_budget-1
        of the dummy region with mask 0.
    edge_mask: per-type tuple of [edge_budget_t] f32
    fingerprints: [num_graphs, FINGERPRINT_DIM] f32
    descriptors: [num_graphs, DESCRIPTOR_DIM] f32
    graph_mask: [num_graphs] f32
    """

    node_features: np.ndarray
    node_to_graph: np.ndarray
    node_mask: np.ndarray
    edge_sources: Tuple[np.ndarray, ...]
    edge_targets: Tuple[np.ndarray, ...]
    edge_mask: Tuple[np.ndarray, ...]
    fingerprints: np.ndarray
    descriptors: np.ndarray
    graph_mask: np.ndarray

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def node_budget(self) -> int:
        return self.node_features.shape[0]


class Episode(NamedTuple):
    """A fully padded support/query episode (device pytree)."""

    support: PackedGraphs
    support_labels: np.ndarray  # [S] ±1 f32
    support_numeric_labels: np.ndarray  # [S] f32 (standardized for regression)
    query: PackedGraphs
    query_labels: np.ndarray  # [Q] ±1 f32
    query_numeric_labels: np.ndarray  # [Q] f32


def pack_graphs(samples: List[MoleculeDatapoint], spec: GraphPadSpec) -> PackedGraphs:
    """Pack a list of molecules into one padded mega-graph."""
    g = spec.num_graphs
    if len(samples) > g:
        raise EpisodeOverflowError(f"{len(samples)} graphs > budget {g}")

    node_features = np.zeros((spec.node_budget, NUM_NODE_FEATURES), np.float32)
    node_to_graph = np.full((spec.node_budget,), g, np.int32)
    node_mask = np.zeros((spec.node_budget,), np.float32)
    # Padding edges self-loop on the last (dummy) node slot so gathers stay
    # in bounds and scatters land in masked territory.
    dummy = spec.node_budget - 1
    edge_sources = [np.full((b,), dummy, np.int32) for b in spec.edge_budgets]
    edge_targets = [np.full((b,), dummy, np.int32) for b in spec.edge_budgets]
    edge_mask = [np.zeros((b,), np.float32) for b in spec.edge_budgets]
    fingerprints = np.zeros((g, FINGERPRINT_DIM), np.float32)
    descriptors = np.zeros((g, DESCRIPTOR_DIM), np.float32)
    graph_mask = np.zeros((g,), np.float32)

    node_offset = 0
    edge_offsets = [0] * NUM_EDGE_TYPES
    for gi, sample in enumerate(samples):
        graph = sample.graph
        v = graph.num_nodes
        if node_offset + v > spec.node_budget - 1:  # reserve the dummy slot
            raise EpisodeOverflowError(
                f"node budget {spec.node_budget} exceeded at graph {gi}"
            )
        node_features[node_offset : node_offset + v] = graph.node_features
        node_to_graph[node_offset : node_offset + v] = gi
        node_mask[node_offset : node_offset + v] = 1.0

        for t, adj in enumerate(graph.adjacency_lists[:NUM_EDGE_TYPES]):
            e = adj.shape[0]
            if e == 0:
                continue
            eo = edge_offsets[t]
            if eo + 2 * e > spec.edge_budgets[t]:
                raise EpisodeOverflowError(
                    f"edge budget {spec.edge_budgets[t]} (type {t}) exceeded at graph {gi}"
                )
            src = adj[:, 0].astype(np.int32) + node_offset
            tgt = adj[:, 1].astype(np.int32) + node_offset
            # Both directions at pack time (reference flips per forward).
            edge_sources[t][eo : eo + e] = src
            edge_targets[t][eo : eo + e] = tgt
            edge_sources[t][eo + e : eo + 2 * e] = tgt
            edge_targets[t][eo + e : eo + 2 * e] = src
            edge_mask[t][eo : eo + 2 * e] = 1.0
            edge_offsets[t] = eo + 2 * e

        fp = sample.fingerprint
        if fp is not None:
            fingerprints[gi] = np.asarray(fp, np.float32)
        de = sample.descriptors
        if de is not None:
            descriptors[gi] = np.asarray(de, np.float32)
        graph_mask[gi] = 1.0
        node_offset += v

    return PackedGraphs(
        node_features=node_features,
        node_to_graph=node_to_graph,
        node_mask=node_mask,
        edge_sources=tuple(edge_sources),
        edge_targets=tuple(edge_targets),
        edge_mask=tuple(edge_mask),
        fingerprints=fingerprints,
        descriptors=descriptors,
        graph_mask=graph_mask,
    )


def _labels(samples: List[MoleculeDatapoint], n_pad: int) -> np.ndarray:
    """Bool labels as ±1 with zero padding."""
    out = np.zeros((n_pad,), np.float32)
    for i, s in enumerate(samples):
        out[i] = 1.0 if s.bool_label else -1.0
    return out


def build_episode(
    task_sample: TaskSample,
    spec: EpisodeSpec,
    regression: bool = False,
) -> Episode:
    """Build a padded Episode from a TaskSample.

    For regression (filter_numeric_labels in the reference), numeric
    labels are log-transformed and standardized by SUPPORT-set statistics
    (fs_mol/data/dkt.py:91-97) so the GP sees zero-mean unit-variance
    targets and r2_score_os's zero baseline is exact.
    """
    support = task_sample.train_samples
    query = task_sample.test_samples
    s_pad, q_pad = spec.support_size, spec.query_size
    if len(support) > s_pad:
        raise EpisodeOverflowError(f"support {len(support)} > {s_pad}")
    if len(query) > q_pad:
        raise EpisodeOverflowError(f"query {len(query)} > {q_pad}")

    support_numeric = np.zeros((s_pad,), np.float32)
    query_numeric = np.zeros((q_pad,), np.float32)
    raw_s = np.asarray([s.numeric_label for s in support], np.float64)
    raw_q = np.asarray([s.numeric_label for s in query], np.float64)
    if regression:
        log_s = np.log(raw_s)
        mean, std = log_s.mean(), log_s.std()
        support_numeric[: len(support)] = ((log_s - mean) / std).astype(np.float32)
        query_numeric[: len(query)] = ((np.log(raw_q) - mean) / std).astype(np.float32)
    else:
        support_numeric[: len(support)] = raw_s.astype(np.float32)
        query_numeric[: len(query)] = raw_q.astype(np.float32)

    return Episode(
        support=pack_graphs(support, spec.support_pad),
        support_labels=_labels(support, s_pad),
        support_numeric_labels=support_numeric,
        query=pack_graphs(query, spec.query_pad),
        query_labels=_labels(query, q_pad),
        query_numeric_labels=query_numeric,
    )


def stack_episodes(episodes: List[Episode]) -> Episode:
    """Stack same-spec episodes along a leading task axis (for vmap/pjit)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *episodes)
