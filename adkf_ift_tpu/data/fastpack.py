"""Vectorized cached episode assembly (host fast path).

`data/episodes.pack_graphs` loops over molecules in Python (~15 small
numpy ops each); at bench shapes that is ~50 ms per episode — on a
1-core host it, not the device, bounds real training throughput
(the reference has the same host-side shape of work inside its
multiprocess reader, fs_mol/data/fsmol_batcher.py:174-218; this module
is the TPU pipeline's answer to it).

Two-level structure:

  * `TaskPack.from_task(task)` — ONE pass over the task's molecules into
    concatenated per-molecule arrays (node features, pre-bidirectional
    per-type edge blocks in pack order, fingerprints, descriptors,
    labels) plus span indices. Built once per task visit and reusable
    across every episode sampled from the task.
  * `assemble_episode(pack, sample, spec)` — fully vectorized flat
    episode assembly (~20 numpy ops total): span-gathers rows of the
    concatenated arrays, adds node offsets with `np.repeat`, and writes
    one contiguous slice per buffer. Byte-identical to
    `build_episode(sample, spec)` (tests/test_fastpack.py).
  * `DenseTaskPack.from_task_pack(pack, ...)` — per-molecule dense
    blocks [M, N, ...] (ops/dense_block layout); episode assembly is a
    single fancy-index per leaf. Byte-identical to
    `episode_to_dense(build_episode(...))`.

Index resolution uses the identity of the task's MoleculeDatapoint
objects, so the existing samplers (and their seed contracts) are reused
verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from adkf_ift_tpu.data.episodes import (
    Episode,
    EpisodeOverflowError,
    EpisodeSpec,
    GraphPadSpec,
    PackedGraphs,
)
from adkf_ift_tpu.data.task import (
    DESCRIPTOR_DIM,
    FINGERPRINT_DIM,
    NUM_EDGE_TYPES,
    NUM_NODE_FEATURES,
    Task,
    TaskSample,
)


def _span_gather_idx(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Row indices gathering the concatenation of `arr[starts[i]:starts[i]+counts[i]]`."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    out_ends = np.cumsum(counts)
    out_starts = out_ends - counts
    idx = np.arange(total, dtype=np.int64)
    return np.repeat(starts, counts) + (idx - np.repeat(out_starts, counts))


@dataclass
class TaskPack:
    """Concatenated per-molecule arrays of one task (file order)."""

    num_molecules: int
    node_features: np.ndarray  # [sumV, F] f32
    v_counts: np.ndarray  # [M] i64
    v_starts: np.ndarray  # [M] i64 (into node_features)
    # Per edge type: bidirectional edge block per molecule in pack order
    # (forward run then backward run, matching pack_graphs); local node ids.
    e_src: Tuple[np.ndarray, ...]  # [sum2E_t] i32
    e_tgt: Tuple[np.ndarray, ...]
    e_counts: Tuple[np.ndarray, ...]  # [M] i64 (bidirectional counts)
    e_starts: Tuple[np.ndarray, ...]
    fingerprints: np.ndarray  # [M, FP] f32
    descriptors: np.ndarray  # [M, DESC] f32
    bool_labels: np.ndarray  # [M] f32 (±1)
    numeric_labels: np.ndarray  # [M] f64
    _index_of: Dict[int, int]  # id(datapoint) -> index

    @staticmethod
    def from_task(task: Task) -> "TaskPack":
        samples = task.samples
        m = len(samples)
        nf_list: List[np.ndarray] = []
        v_counts = np.zeros(m, np.int64)
        e_src_lists: List[List[np.ndarray]] = [[] for _ in range(NUM_EDGE_TYPES)]
        e_tgt_lists: List[List[np.ndarray]] = [[] for _ in range(NUM_EDGE_TYPES)]
        e_counts = [np.zeros(m, np.int64) for _ in range(NUM_EDGE_TYPES)]
        fingerprints = np.zeros((m, FINGERPRINT_DIM), np.float32)
        descriptors = np.zeros((m, DESCRIPTOR_DIM), np.float32)
        bool_labels = np.zeros(m, np.float32)
        numeric_labels = np.zeros(m, np.float64)
        index_of: Dict[int, int] = {}

        for i, s in enumerate(samples):
            g = s.graph
            nf_list.append(np.asarray(g.node_features, np.float32))
            v_counts[i] = g.num_nodes
            for t, adj in enumerate(g.adjacency_lists[:NUM_EDGE_TYPES]):
                e = adj.shape[0]
                if e:
                    src = adj[:, 0].astype(np.int32)
                    tgt = adj[:, 1].astype(np.int32)
                    # fwd block then bwd block — pack_graphs order.
                    e_src_lists[t].append(np.concatenate([src, tgt]))
                    e_tgt_lists[t].append(np.concatenate([tgt, src]))
                    e_counts[t][i] = 2 * e
            if s.fingerprint is not None:
                fingerprints[i] = np.asarray(s.fingerprint, np.float32)
            if s.descriptors is not None:
                descriptors[i] = np.asarray(s.descriptors, np.float32)
            bool_labels[i] = 1.0 if s.bool_label else -1.0
            numeric_labels[i] = s.numeric_label if s.numeric_label is not None else 0.0
            index_of[id(s)] = i

        def _cat(lst, dtype):
            return np.concatenate(lst).astype(dtype) if lst else np.zeros(0, dtype)

        v_starts = np.zeros(m, np.int64)
        if m:
            np.cumsum(v_counts[:-1], out=v_starts[1:])
        e_starts = []
        for t in range(NUM_EDGE_TYPES):
            st = np.zeros(m, np.int64)
            if m:
                np.cumsum(e_counts[t][:-1], out=st[1:])
            e_starts.append(st)

        return TaskPack(
            num_molecules=m,
            node_features=_cat(nf_list, np.float32).reshape(-1, NUM_NODE_FEATURES),
            v_counts=v_counts,
            v_starts=v_starts,
            e_src=tuple(_cat(e_src_lists[t], np.int32) for t in range(NUM_EDGE_TYPES)),
            e_tgt=tuple(_cat(e_tgt_lists[t], np.int32) for t in range(NUM_EDGE_TYPES)),
            e_counts=tuple(e_counts),
            e_starts=tuple(e_starts),
            fingerprints=fingerprints,
            descriptors=descriptors,
            bool_labels=bool_labels,
            numeric_labels=numeric_labels,
            _index_of=index_of,
        )

    def indices_of(self, samples: Sequence) -> np.ndarray:
        return np.asarray([self._index_of[id(s)] for s in samples], np.int64)


def assemble_packed(pack: TaskPack, sel: np.ndarray, spec: GraphPadSpec) -> PackedGraphs:
    """Vectorized equivalent of pack_graphs over `pack`'s molecules[sel]."""
    g = spec.num_graphs
    k = len(sel)
    if k > g:
        raise EpisodeOverflowError(f"{k} graphs > budget {g}")

    counts = pack.v_counts[sel]
    total = int(counts.sum())
    if total > spec.node_budget - 1:  # reserve the dummy slot
        raise EpisodeOverflowError(f"node budget {spec.node_budget} exceeded")
    node_offsets = np.zeros(k, np.int64)
    if k:
        np.cumsum(counts[:-1], out=node_offsets[1:])

    node_features = np.zeros((spec.node_budget, NUM_NODE_FEATURES), np.float32)
    node_to_graph = np.full((spec.node_budget,), g, np.int32)
    node_mask = np.zeros((spec.node_budget,), np.float32)
    gidx = _span_gather_idx(pack.v_starts[sel], counts)
    node_features[:total] = pack.node_features[gidx]
    node_to_graph[:total] = np.repeat(np.arange(k, dtype=np.int32), counts)
    node_mask[:total] = 1.0

    dummy = spec.node_budget - 1
    edge_sources, edge_targets, edge_mask = [], [], []
    for t in range(NUM_EDGE_TYPES):
        budget = spec.edge_budgets[t]
        ec = pack.e_counts[t][sel]
        etot = int(ec.sum())
        if etot > budget:
            raise EpisodeOverflowError(f"edge budget {budget} (type {t}) exceeded")
        src = np.full((budget,), dummy, np.int32)
        tgt = np.full((budget,), dummy, np.int32)
        msk = np.zeros((budget,), np.float32)
        eidx = _span_gather_idx(pack.e_starts[t][sel], ec)
        off = np.repeat(node_offsets, ec).astype(np.int32)
        src[:etot] = pack.e_src[t][eidx] + off
        tgt[:etot] = pack.e_tgt[t][eidx] + off
        msk[:etot] = 1.0
        edge_sources.append(src)
        edge_targets.append(tgt)
        edge_mask.append(msk)

    fingerprints = np.zeros((g, FINGERPRINT_DIM), np.float32)
    descriptors = np.zeros((g, DESCRIPTOR_DIM), np.float32)
    graph_mask = np.zeros((g,), np.float32)
    fingerprints[:k] = pack.fingerprints[sel]
    descriptors[:k] = pack.descriptors[sel]
    graph_mask[:k] = 1.0

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


def _episode_labels(pack, s_sel, q_sel, spec: EpisodeSpec, regression: bool):
    s_pad, q_pad = spec.support_size, spec.query_size
    support_labels = np.zeros((s_pad,), np.float32)
    query_labels = np.zeros((q_pad,), np.float32)
    support_labels[: len(s_sel)] = pack.bool_labels[s_sel]
    query_labels[: len(q_sel)] = pack.bool_labels[q_sel]

    support_numeric = np.zeros((s_pad,), np.float32)
    query_numeric = np.zeros((q_pad,), np.float32)
    raw_s = pack.numeric_labels[s_sel]
    raw_q = pack.numeric_labels[q_sel]
    if regression:
        log_s = np.log(raw_s)
        mean, std = log_s.mean(), log_s.std()
        support_numeric[: len(s_sel)] = ((log_s - mean) / std).astype(np.float32)
        query_numeric[: len(q_sel)] = ((np.log(raw_q) - mean) / std).astype(np.float32)
    else:
        support_numeric[: len(s_sel)] = raw_s.astype(np.float32)
        query_numeric[: len(q_sel)] = raw_q.astype(np.float32)
    return support_labels, support_numeric, query_labels, query_numeric


def assemble_episode(
    pack: TaskPack,
    sample: TaskSample,
    spec: EpisodeSpec,
    regression: bool = False,
) -> Episode:
    """Vectorized build_episode (byte-identical output)."""
    s_sel = pack.indices_of(sample.train_samples)
    q_sel = pack.indices_of(sample.test_samples)
    if len(s_sel) > spec.support_size:
        raise EpisodeOverflowError(f"support {len(s_sel)} > {spec.support_size}")
    if len(q_sel) > spec.query_size:
        raise EpisodeOverflowError(f"query {len(q_sel)} > {spec.query_size}")
    sl, sn, ql, qn = _episode_labels(pack, s_sel, q_sel, spec, regression)
    return Episode(
        support=assemble_packed(pack, s_sel, spec.support_pad),
        support_labels=sl,
        support_numeric_labels=sn,
        query=assemble_packed(pack, q_sel, spec.query_pad),
        query_labels=ql,
        query_numeric_labels=qn,
    )


@dataclass
class DenseTaskPack:
    """Per-molecule dense blocks [M, ...] (ops/dense_block layout).

    `wire=True` stores every leaf in its lossless WIRE dtype (the exact
    narrowing utils/wire.WireCodec would apply per batch: one-hot-ish
    node features/masks as uint8, local node ids as int8/int16, and
    fingerprints pre-sparsified to SparseCounts index/value pairs), so
    assembled episodes pass through the codec with NO per-batch scans or
    argsorts and the jitted step's decompress_batch restores float32 on
    device. On the ~1 GB/s single-core host this cuts the per-batch
    assemble+stack+compress cost ~5x (the dominant real-training cost)."""

    node_features: np.ndarray  # [M, N, F] f32 (wire: uint8 when lossless)
    node_mask: np.ndarray  # [M, N]
    in_src: Tuple[np.ndarray, ...]  # [M, N, K_t] i32 (wire: i8/i16)
    in_mask: Tuple[np.ndarray, ...]  # [M, N, K_t] f32 (wire: uint8)
    fingerprints: np.ndarray  # [M, FP] f32 (wire: uint8/16 when lossless)
    descriptors: np.ndarray  # [M, DESC] f32
    bool_labels: np.ndarray  # [M] f32 (±1)
    numeric_labels: np.ndarray  # [M] f64
    nodes_per_graph: int
    k_per_type: Tuple[int, ...]
    pack: Optional[TaskPack] = None  # for object->index resolution
    wire: bool = False
    fp_idx: Optional[np.ndarray] = None  # [M, B] int16 (sparse wire fps)
    fp_vals: Optional[np.ndarray] = None  # [M, B] uint8/uint16
    fp_dense_size: int = 0

    def wireized(self, sparse_fp_budget: int = 0) -> "DenseTaskPack":
        """Copy with every leaf in its wire dtype (see class docstring)."""
        from adkf_ift_tpu.utils.wire import _sparsify_counts

        def _counts_dtype(x):
            if x.size == 0:
                return x.astype(np.uint8)
            mn, mx = x.min(), x.max()
            if mn >= 0.0 and mx <= 65535.0 and np.all(x == np.rint(x)):
                return x.astype(np.uint8 if mx <= 255.0 else np.uint16)
            return x

        fp_idx = fp_vals = None
        fp = self.fingerprints
        fp_dense_size = fp.shape[-1]
        if sparse_fp_budget > 0 and fp.size:
            mn = fp.min()
            if mn >= 0.0 and np.all(fp == np.rint(fp)):
                sp = _sparsify_counts(fp, sparse_fp_budget)
                if sp is not None:
                    fp_idx, fp_vals = sp.indices, sp.values
                    fp = np.zeros((fp.shape[0], 0), np.uint8)  # freed: sparse is canonical
        if fp_idx is None:
            fp = _counts_dtype(fp)
        idx_t = np.int8 if self.nodes_per_graph <= 127 else np.int16
        return DenseTaskPack(
            node_features=_counts_dtype(self.node_features),
            node_mask=self.node_mask.astype(np.uint8),
            in_src=tuple(a.astype(idx_t) for a in self.in_src),
            in_mask=tuple(a.astype(np.uint8) for a in self.in_mask),
            fingerprints=fp,
            descriptors=self.descriptors,
            bool_labels=self.bool_labels,
            numeric_labels=self.numeric_labels,
            nodes_per_graph=self.nodes_per_graph,
            k_per_type=self.k_per_type,
            pack=self.pack,
            wire=True,
            fp_idx=fp_idx,
            fp_vals=fp_vals,
            fp_dense_size=fp_dense_size if fp_idx is not None else 0,
        )

    @staticmethod
    def from_task_pack(
        pack: TaskPack,
        nodes_per_graph: int = 32,
        k_per_type: Tuple[int, ...] = (6, 4, 4),
    ) -> "DenseTaskPack":
        m = pack.num_molecules
        n = nodes_per_graph
        if m and pack.v_counts.max(initial=0) > n:
            raise EpisodeOverflowError(f"a molecule has >{n} nodes")

        node_features = np.zeros((m, n, NUM_NODE_FEATURES), np.float32)
        node_mask = np.zeros((m, n), np.float32)
        total = int(pack.v_counts.sum())
        rows = np.repeat(np.arange(m, dtype=np.int64), pack.v_counts)
        slots = np.arange(total, dtype=np.int64) - np.repeat(pack.v_starts, pack.v_counts)
        node_features[rows, slots] = pack.node_features
        node_mask[rows, slots] = 1.0

        in_src, in_mask = [], []
        for t in range(NUM_EDGE_TYPES):
            k = k_per_type[t]
            src_arr = np.zeros((m, n, k), np.int32)
            mask_arr = np.zeros((m, n, k), np.float32)
            ec = pack.e_counts[t]
            etot = int(ec.sum())
            if etot:
                mol = np.repeat(np.arange(m, dtype=np.int64), ec)
                s_l = pack.e_src[t].astype(np.int64)
                t_l = pack.e_tgt[t].astype(np.int64)
                # Per-(molecule, target) incoming-slot index in pack order —
                # the same stable-sort cumcount as ops/dense_block.flat_to_dense.
                key = mol * n + t_l
                order = np.argsort(key, kind="stable")
                sk = key[order]
                is_start = np.r_[True, sk[1:] != sk[:-1]]
                group_start = np.maximum.accumulate(
                    np.where(is_start, np.arange(sk.size), 0)
                )
                j = np.empty(sk.size, np.int64)
                j[order] = np.arange(sk.size) - group_start
                if j.max(initial=0) >= k:
                    raise EpisodeOverflowError(f"in-degree budget K={k} (type {t}) exceeded")
                src_arr[mol, t_l, j] = s_l.astype(np.int32)
                mask_arr[mol, t_l, j] = 1.0
            in_src.append(src_arr)
            in_mask.append(mask_arr)

        return DenseTaskPack(
            node_features=node_features,
            node_mask=node_mask,
            in_src=tuple(in_src),
            in_mask=tuple(in_mask),
            fingerprints=pack.fingerprints,
            descriptors=pack.descriptors,
            bool_labels=pack.bool_labels,
            numeric_labels=pack.numeric_labels,
            nodes_per_graph=nodes_per_graph,
            k_per_type=tuple(k_per_type),
            pack=pack,
        )

    @staticmethod
    def from_packed_all(
        packed_all: PackedGraphs,
        bool_labels: np.ndarray,
        numeric_labels: np.ndarray,
        nodes_per_graph: int = 32,
        k_per_type: Tuple[int, ...] = (6, 4, 4),
    ) -> "DenseTaskPack":
        """Per-molecule blocks from ONE flat pack of a task's full molecule
        list (e.g. the native C++ packer, data/native.py `NativeTask.pack`
        over all indices) — the vectorized flat->dense re-layout runs once
        per task instead of once per episode."""
        from adkf_ift_tpu.ops.dense_block import flat_to_dense

        blocks = flat_to_dense(packed_all, nodes_per_graph, k_per_type)
        return DenseTaskPack(
            node_features=blocks.node_features,
            node_mask=blocks.node_mask,
            in_src=blocks.in_src,
            in_mask=blocks.in_mask,
            fingerprints=np.asarray(blocks.fingerprints, np.float32),
            descriptors=np.asarray(blocks.descriptors, np.float32),
            bool_labels=np.asarray(bool_labels, np.float32),
            numeric_labels=np.asarray(numeric_labels, np.float64),
            nodes_per_graph=nodes_per_graph,
            k_per_type=tuple(k_per_type),
        )


def _dense_select(dpack: DenseTaskPack, sel: np.ndarray, num_graphs: int):
    from adkf_ift_tpu.ops.dense_block import DenseBlocks

    k = len(sel)
    g = num_graphs

    def pad0(arr):
        out = np.zeros((g,) + arr.shape[1:], arr.dtype)
        out[:k] = arr[sel]
        return out

    if dpack.fp_idx is not None:
        from adkf_ift_tpu.utils.wire import SparseCounts

        fingerprints = SparseCounts(
            pad0(dpack.fp_idx), pad0(dpack.fp_vals), dpack.fp_dense_size
        )
    else:
        fingerprints = pad0(dpack.fingerprints)
    graph_mask = np.zeros((g,), np.uint8 if dpack.wire else np.float32)
    graph_mask[:k] = 1
    return DenseBlocks(
        node_features=pad0(dpack.node_features),
        node_mask=pad0(dpack.node_mask),
        in_src=tuple(pad0(a) for a in dpack.in_src),
        in_mask=tuple(pad0(a) for a in dpack.in_mask),
        fingerprints=fingerprints,
        descriptors=pad0(dpack.descriptors),
        graph_mask=graph_mask,
    )


def assemble_dense_by_idx(
    dpack: DenseTaskPack,
    support_idx: np.ndarray,
    query_idx: np.ndarray,
    spec: EpisodeSpec,
    regression: bool = False,
) -> Episode:
    """Dense episode from molecule indices (file order)."""
    pack = dpack  # carries bool_labels/numeric_labels itself
    s_sel = np.asarray(support_idx, np.int64)
    q_sel = np.asarray(query_idx, np.int64)
    if len(s_sel) > spec.support_size:
        raise EpisodeOverflowError(f"support {len(s_sel)} > {spec.support_size}")
    if len(q_sel) > spec.query_size:
        raise EpisodeOverflowError(f"query {len(q_sel)} > {spec.query_size}")
    sl, sn, ql, qn = _episode_labels(pack, s_sel, q_sel, spec, regression)
    return Episode(
        support=_dense_select(dpack, s_sel, spec.support_size),
        support_labels=sl,
        support_numeric_labels=sn,
        query=_dense_select(dpack, q_sel, spec.query_size),
        query_labels=ql,
        query_numeric_labels=qn,
    )


def assemble_dense_episode(
    dpack: DenseTaskPack,
    sample: TaskSample,
    spec: EpisodeSpec,
    regression: bool = False,
) -> Episode:
    """Vectorized episode_to_dense(build_episode(...)) (identical output)."""
    pack = dpack.pack
    return assemble_dense_by_idx(
        dpack,
        pack.indices_of(sample.train_samples),
        pack.indices_of(sample.test_samples),
        spec,
        regression=regression,
    )


def dense_transform_kwargs(transform) -> Optional[Tuple[int, Tuple[int, ...]]]:
    """(nodes_per_graph, k_per_type) when `transform` is the dense-block
    re-layout (functools.partial(ops.dense_block.episode_to_dense, ...)),
    else None. Lets episode streams/eval swap the per-episode transform
    for the cached per-task fast path transparently."""
    import functools

    if not isinstance(transform, functools.partial):
        return None
    from adkf_ift_tpu.ops.dense_block import episode_to_dense

    if transform.func is not episode_to_dense:
        return None
    kw = transform.keywords
    return int(kw.get("nodes_per_graph", 48)), tuple(kw.get("k_per_type", (8, 6, 6)))


def task_pack_for(task: Task, dense_kw, wire_budget: Optional[int] = None) -> Optional[object]:
    """TaskPack (flat) or DenseTaskPack per `dense_kw`; None when the
    dense budgets can't hold a molecule (callers fall back to the
    per-episode slow path, which can still skip just that molecule).
    `wire_budget` (dense only) stores the pack in wire dtypes — see
    DenseTaskPack.wireized."""
    pack = TaskPack.from_task(task)
    if dense_kw is None:
        return pack
    try:
        dpack = DenseTaskPack.from_task_pack(
            pack, nodes_per_graph=dense_kw[0], k_per_type=dense_kw[1]
        )
    except EpisodeOverflowError:
        return None
    if wire_budget is not None:
        dpack = dpack.wireized(wire_budget)
    return dpack


class EpisodeAssembler:
    """Caching front-end: one TaskPack (+ optional DenseTaskPack) per task,
    episodes assembled by vectorized gathers. Drop-in for
    `transform(build_episode(sample, spec))` in episode streams.

    `dense=(nodes_per_graph, k_per_type)` selects the dense-block layout
    (what episode_to_dense produces); None keeps the flat layout.
    """

    def __init__(self, spec: EpisodeSpec, regression: bool = False,
                 dense: Optional[tuple] = None, cache_tasks: int = 64):
        self.spec = spec
        self.regression = regression
        self.dense = dense
        self._cache: "Dict[int, object]" = {}
        self._order: List[int] = []
        self._max = cache_tasks

    def _pack_for(self, task: Task):
        key = id(task)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        pack = TaskPack.from_task(task)
        if self.dense is not None:
            n, k = self.dense
            pack = DenseTaskPack.from_task_pack(pack, nodes_per_graph=n, k_per_type=k)
        self._cache[key] = pack
        self._order.append(key)
        if len(self._order) > self._max:
            self._cache.pop(self._order.pop(0), None)
        return pack

    def episode(self, task: Task, sample: TaskSample) -> Episode:
        pack = self._pack_for(task)
        if self.dense is not None:
            return assemble_dense_episode(pack, sample, self.spec, self.regression)
        return assemble_episode(pack, sample, self.spec, self.regression)
