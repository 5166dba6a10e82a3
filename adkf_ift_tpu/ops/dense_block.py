"""Per-graph dense-block layout: molecules as fixed [G, N] node blocks.

The flat mega-graph layout (data/episodes.py) drives message passing
with gathers and XLA segment ops. This alternative layout removes ALL
scatter/gather primitives from the encoder hot loop (SURVEY.md §7
design delta #6):

  * node states live in [G, N, D] blocks (N = node slots per molecule);
  * each node stores its incoming edges as K fixed slots per edge type
    (`in_src[G, N, K_t]` = source slot within the molecule, `in_mask`);
  * gathering source states is a ONE-HOT BATCHED MATMUL
    ([G, N*K, N] @ [G, N, D]) — MXU work, not a gather;
  * every aggregation the reference's torch_scatter calls provide
    (sum / mean / std / max, segment softmax for attention) becomes a
    dense masked reduction over the K axis.

Molecular in-degrees are tiny (heavy-atom valence ≤ 4), so K_t of
(6, 4, 4) covers FS-Mol; the converter raises EpisodeOverflowError on
overflow, mirroring the flat packer's budget contract.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

from adkf_ift_tpu.data.episodes import EpisodeOverflowError, PackedGraphs
from adkf_ift_tpu.data.task import NUM_EDGE_TYPES

# Incoming-edge slots per node, per edge type (bidirectional edges).
DEFAULT_K_PER_TYPE: Tuple[int, int, int] = (6, 4, 4)


class DenseBlocks(NamedTuple):
    """Per-graph dense-block episode layout (device pytree).

    node_features: [G, N, F] f32
    node_mask: [G, N] f32
    in_src: per-edge-type tuple of [G, N, K_t] i32 — source node slot
        (within the molecule) of each incoming edge; padded slots are 0
        with in_mask 0.
    in_mask: per-edge-type tuple of [G, N, K_t] f32
    fingerprints / descriptors / graph_mask: as PackedGraphs.
    """

    node_features: np.ndarray
    node_mask: np.ndarray
    in_src: Tuple[np.ndarray, ...]
    in_mask: Tuple[np.ndarray, ...]
    fingerprints: np.ndarray
    descriptors: np.ndarray
    graph_mask: np.ndarray

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def nodes_per_graph(self) -> int:
        return self.node_features.shape[1]


def episode_to_dense(
    episode,
    nodes_per_graph: int = 32,
    k_per_type: Tuple[int, ...] = DEFAULT_K_PER_TYPE,
):
    """Re-lay an Episode's support/query PackedGraphs as DenseBlocks
    (labels unchanged). The encoder dispatches on the layout, so the
    resulting episode feeds the same model/GP/IFT code paths."""
    return episode._replace(
        support=flat_to_dense(episode.support, nodes_per_graph, k_per_type),
        query=flat_to_dense(episode.query, nodes_per_graph, k_per_type),
    )


def flat_to_dense(
    packed: PackedGraphs,
    nodes_per_graph: int = 32,
    k_per_type: Tuple[int, ...] = DEFAULT_K_PER_TYPE,
) -> DenseBlocks:
    """Re-lay a flat packed mega-graph into dense per-graph blocks.

    The flat packer lays nodes contiguously per graph (episodes.py
    pack_graphs), so each graph is one run of `node_to_graph == gi`.
    """
    g = packed.num_graphs
    n = nodes_per_graph
    feat_dim = packed.node_features.shape[-1]

    node_to_graph = np.asarray(packed.node_to_graph)
    node_mask_flat = np.asarray(packed.node_mask)
    features = np.asarray(packed.node_features)

    # Fully vectorized (this runs on the training-loop critical path when
    # the reader converts episodes): valid nodes are laid contiguously
    # with nondecreasing graph ids (pack_graphs), so slot-within-graph is
    # just index − first-index-of-graph.
    valid_idx = np.nonzero((node_mask_flat > 0) & (node_to_graph < g))[0]
    gi_of = node_to_graph[valid_idx]
    counts = np.bincount(gi_of, minlength=g)
    if counts.max(initial=0) > n:
        raise EpisodeOverflowError(f"a graph has >{n} nodes")
    starts = np.zeros(g + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot_valid = np.arange(len(valid_idx)) - starts[gi_of]
    slot_of = np.zeros(node_to_graph.shape[0], np.int64)
    slot_of[valid_idx] = slot_valid

    node_features = np.zeros((g, n, feat_dim), np.float32)
    node_mask = np.zeros((g, n), np.float32)
    node_features[gi_of, slot_valid] = features[valid_idx]
    node_mask[gi_of, slot_valid] = 1.0

    in_src, in_mask = [], []
    for t in range(NUM_EDGE_TYPES):
        k = k_per_type[t]
        src_arr = np.zeros((g, n, k), np.int32)
        mask_arr = np.zeros((g, n, k), np.float32)
        e_mask = np.asarray(packed.edge_mask[t])
        live = np.nonzero(e_mask > 0)[0]
        e_src = np.asarray(packed.edge_sources[t])[live]
        e_tgt = np.asarray(packed.edge_targets[t])[live]
        gi = node_to_graph[e_tgt]
        if live.size and (np.any(gi >= g) or np.any(node_to_graph[e_src] != gi)):
            raise EpisodeOverflowError("edge crosses graph boundary")
        slot_t = slot_of[e_tgt]
        slot_s = slot_of[e_src]
        # Per-(graph, target-node) slot index in original edge order:
        # stable sort by node key, cumcount within equal keys.
        key = gi.astype(np.int64) * n + slot_t
        order = np.argsort(key, kind="stable")
        sk = key[order]
        is_start = np.r_[True, sk[1:] != sk[:-1]] if live.size else np.zeros(0, bool)
        group_start = np.maximum.accumulate(
            np.where(is_start, np.arange(sk.size), 0)
        )
        j = np.empty(sk.size, np.int64)
        j[order] = np.arange(sk.size) - group_start
        if live.size and j.max(initial=0) >= k:
            raise EpisodeOverflowError(f"in-degree budget K={k} (type {t}) exceeded")
        src_arr[gi, slot_t, j] = slot_s
        mask_arr[gi, slot_t, j] = 1.0
        in_src.append(src_arr)
        in_mask.append(mask_arr)

    return DenseBlocks(
        node_features=node_features,
        node_mask=node_mask,
        in_src=tuple(in_src),
        in_mask=tuple(in_mask),
        fingerprints=np.asarray(packed.fingerprints),
        descriptors=np.asarray(packed.descriptors),
        graph_mask=np.asarray(packed.graph_mask),
    )
