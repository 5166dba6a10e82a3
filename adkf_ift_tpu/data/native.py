"""ctypes bindings for the native (C++) task loader / episode packer.

The reference's data plane is forked Python workers gunzipping and
json.loads-ing task files (file_reader_iterable.py + fsmol_task.py);
native/fsmol_loader.cc is the C++ equivalent: single-pass gzip JSON
parsing and PackedGraphs-layout episode packing behind a C ABI.

`load_native()` builds the shared library on first use (g++ -O3 -lz,
cached next to the source) and returns None when no toolchain is
available — callers fall back to the pure-Python path transparently
(`native_available()`, `load_task_native`, `pack_episode_native`).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

from adkf_ift_tpu.data.episodes import (
    Episode,
    EpisodeSpec,
    GraphPadSpec,
    PackedGraphs,
)
from adkf_ift_tpu.data.task import (
    DESCRIPTOR_DIM,
    FINGERPRINT_DIM,
    NUM_EDGE_TYPES,
    NUM_NODE_FEATURES,
)

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfsmol_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "fsmol_loader.cc")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-lz", "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # noqa: BLE001
        logger.info("native loader build failed (%s); using Python fallback", e)
        return False


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        vp, i32 = ctypes.c_void_p, ctypes.c_int32
        lib.fsmol_load_task.restype = vp
        lib.fsmol_load_task.argtypes = [ctypes.c_char_p]
        lib.fsmol_free_task.argtypes = [vp]
        lib.fsmol_num_molecules.restype = i32
        lib.fsmol_num_molecules.argtypes = [vp]
        for name in ("fsmol_num_nodes", "fsmol_feature_dim"):
            fn = getattr(lib, name)
            fn.restype = i32
            fn.argtypes = [vp, i32]
        lib.fsmol_num_edges.restype = i32
        lib.fsmol_num_edges.argtypes = [vp, i32, i32]
        lib.fsmol_bool_label.restype = ctypes.c_float
        lib.fsmol_bool_label.argtypes = [vp, i32]
        lib.fsmol_numeric_label.restype = ctypes.c_double
        lib.fsmol_numeric_label.argtypes = [vp, i32]
        fptr = ctypes.POINTER(ctypes.c_float)
        iptr = ctypes.POINTER(i32)
        dptr = ctypes.POINTER(ctypes.c_double)
        for name in ("fsmol_copy_node_features", "fsmol_copy_fingerprint", "fsmol_copy_descriptors"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [vp, i32, fptr]
        lib.fsmol_copy_edges.restype = None
        lib.fsmol_copy_edges.argtypes = [vp, i32, i32, iptr]
        lib.fsmol_pack.restype = i32
        lib.fsmol_pack.argtypes = [
            vp, iptr, i32, i32, i32, iptr,
            fptr, iptr, fptr,
            ctypes.POINTER(iptr), ctypes.POINTER(iptr), ctypes.POINTER(fptr),
            fptr, fptr, fptr, fptr, dptr, i32,
        ]
        lib.fsmol_task_name.restype = ctypes.c_char_p
        lib.fsmol_task_name.argtypes = [vp]
        lib.fsmol_queue_create.restype = vp
        lib.fsmol_queue_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), i32, i32, i32, i32, i32, ctypes.c_int64,
        ]
        lib.fsmol_queue_next.restype = vp
        lib.fsmol_queue_next.argtypes = [vp, ctypes.POINTER(ctypes.c_int64)]
        lib.fsmol_queue_destroy.restype = None
        lib.fsmol_queue_destroy.argtypes = [vp]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native() is not None


class NativeTask:
    """Handle over a natively parsed task file."""

    def __init__(self, path: Optional[str], _handle=None):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        if _handle is not None:
            self._handle = _handle
            self.name = lib.fsmol_task_name(ctypes.c_void_p(_handle)).decode()
        else:
            self._handle = lib.fsmol_load_task(path.encode())
            if not self._handle:
                raise IOError(f"native loader could not parse {path}")
            self.name = os.path.basename(path).split(".jsonl")[0]
        self.num_molecules = lib.fsmol_num_molecules(ctypes.c_void_p(self._handle))

    @classmethod
    def from_handle(cls, handle) -> "NativeTask":
        """Adopt ownership of a Task handle (e.g. from NativeTaskQueue)."""
        return cls(None, _handle=handle)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.fsmol_free_task(self._handle)
            self._handle = None

    def bool_labels(self) -> np.ndarray:
        return np.asarray(
            [self._lib.fsmol_bool_label(self._handle, i) for i in range(self.num_molecules)],
            np.float32,
        )

    def numeric_labels(self) -> np.ndarray:
        return np.asarray(
            [self._lib.fsmol_numeric_label(self._handle, i) for i in range(self.num_molecules)],
            np.float64,
        )

    def pack(self, indices: List[int], spec: GraphPadSpec):
        """Pack molecules by index into PackedGraphs buffers (plus labels)."""
        lib = self._lib
        g = spec.num_graphs
        f = NUM_NODE_FEATURES
        node_features = np.empty((spec.node_budget, f), np.float32)
        node_to_graph = np.empty((spec.node_budget,), np.int32)
        node_mask = np.empty((spec.node_budget,), np.float32)
        edge_sources = [np.empty((b,), np.int32) for b in spec.edge_budgets]
        edge_targets = [np.empty((b,), np.int32) for b in spec.edge_budgets]
        edge_mask = [np.empty((b,), np.float32) for b in spec.edge_budgets]
        fingerprints = np.empty((g, FINGERPRINT_DIM), np.float32)
        descriptors = np.empty((g, DESCRIPTOR_DIM), np.float32)
        graph_mask = np.empty((g,), np.float32)
        bool_labels = np.empty((g,), np.float32)
        numeric_labels = np.empty((g,), np.float64)

        idx_arr = np.asarray(indices, np.int32)
        budgets = np.asarray(spec.edge_budgets, np.int32)

        def iptr(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

        def fptr(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

        es = (ctypes.POINTER(ctypes.c_int32) * NUM_EDGE_TYPES)(*[iptr(a) for a in edge_sources])
        et = (ctypes.POINTER(ctypes.c_int32) * NUM_EDGE_TYPES)(*[iptr(a) for a in edge_targets])
        em = (ctypes.POINTER(ctypes.c_float) * NUM_EDGE_TYPES)(*[fptr(a) for a in edge_mask])

        rc = lib.fsmol_pack(
            ctypes.c_void_p(self._handle),
            iptr(idx_arr), ctypes.c_int32(len(indices)),
            ctypes.c_int32(g), ctypes.c_int32(spec.node_budget),
            iptr(budgets),
            fptr(node_features), iptr(node_to_graph), fptr(node_mask),
            es, et, em,
            fptr(fingerprints), fptr(descriptors), fptr(graph_mask),
            fptr(bool_labels),
            numeric_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int32(f),
        )
        if rc != 0:
            raise ValueError(f"native pack failed with code {rc} (budget overflow?)")
        packed = PackedGraphs(
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
        return packed, bool_labels, numeric_labels


class NativeTaskQueue:
    """C++ prefetching task queue (native/fsmol_loader.cc fsmol_queue_*):
    worker threads dispense paths, gzip+JSON-parse tasks, and buffer them
    in a bounded queue entirely outside the Python runtime — the
    reference's BufferedFileReaderIterable data plane with no processes,
    no pickling, and no GIL. Iterating yields (NativeTask, idx) pairs
    where idx follows the BackgroundReader contract
    (epoch * num_paths + position) for seeded episode sampling."""

    def __init__(
        self,
        paths: List[str],
        num_workers: int = 4,
        capacity: int = 16,
        repeat: bool = False,
        shuffle: bool = True,
        seed: int = 0,
    ):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        encoded = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        self._handle = lib.fsmol_queue_create(
            arr, len(encoded), num_workers, capacity,
            1 if repeat else 0, 1 if shuffle else 0, seed,
        )
        if not self._handle:
            raise RuntimeError("fsmol_queue_create failed")

    def __iter__(self):
        while True:
            idx = ctypes.c_int64()
            handle = self._lib.fsmol_queue_next(
                ctypes.c_void_p(self._handle), ctypes.byref(idx)
            )
            if not handle:
                return
            yield NativeTask.from_handle(handle), int(idx.value)

    def close(self):
        # ctypes may already be torn down at interpreter shutdown.
        if getattr(self, "_handle", None) and ctypes is not None:
            self._lib.fsmol_queue_destroy(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — never raise from interpreter teardown
            pass


def stratified_indices_from_labels(
    bool_labels: np.ndarray,
    name: str,
    spec: EpisodeSpec,
    seed: int = 0,
    test_size_or_ratio=None,
) -> Tuple[List[int], List[int]]:
    """(support, query) molecule indices with the EXACT seed contract of
    StratifiedTaskSampler (samplers.py:185-256): samples ordered
    negatives-then-positives, sklearn StratifiedShuffleSplit with
    random_state=seed — byte-identical episodes to the Python path.
    Needs only the task's ±1 labels in file order (cacheable: episode
    streams sample revisited tasks without re-parsing the file)."""
    from sklearn.model_selection import StratifiedShuffleSplit

    from adkf_ift_tpu.data.samplers import (
        DatasetTooSmallException,
        FoldTooSmallException,
    )

    neg = np.where(bool_labels < 0)[0]
    pos = np.where(bool_labels > 0)[0]
    order = np.concatenate([neg, pos])  # neg + pos, like the sampler
    labels = np.concatenate([np.zeros(len(neg)), np.ones(len(pos))])
    n = len(order)

    train_size = spec.support_size
    possible_test = n - train_size
    if test_size_or_ratio is None:
        num_test = min(spec.query_size, possible_test)
    elif isinstance(test_size_or_ratio, int):
        num_test = min(test_size_or_ratio, possible_test)
    else:
        num_test = min(int(test_size_or_ratio * n), possible_test)
    if num_test < 2:
        raise DatasetTooSmallException(f"{name}: test fold would have {num_test} < 2")

    splitter = StratifiedShuffleSplit(
        n_splits=1, train_size=train_size, test_size=num_test, random_state=seed
    )
    tr_idx, te_idx = next(iter(splitter.split(X=np.arange(n), y=labels)))
    support_idx = [int(order[i]) for i in tr_idx]
    query_idx = [int(order[i]) for i in te_idx]

    s_labels = bool_labels[support_idx]
    q_labels = bool_labels[query_idx]
    if not (0 < (s_labels > 0).sum() < len(s_labels)):
        raise FoldTooSmallException(f"{name}: train fold single-class")
    if not (0 < (q_labels > 0).sum() < len(q_labels)):
        raise FoldTooSmallException(f"{name}: test fold single-class")
    return support_idx, query_idx


def stratified_indices_native(
    task: NativeTask,
    spec: EpisodeSpec,
    seed: int = 0,
    test_size_or_ratio=None,
) -> Tuple[List[int], List[int]]:
    """stratified_indices_from_labels over a parsed native task."""
    return stratified_indices_from_labels(
        task.bool_labels(), task.name, spec, seed, test_size_or_ratio
    )


def stratified_episode_native(
    task: NativeTask,
    spec: EpisodeSpec,
    seed: int = 0,
    test_size_or_ratio=None,
    regression: bool = False,
) -> Episode:
    """Native-packed stratified episode (see stratified_indices_native)."""
    support_idx, query_idx = stratified_indices_native(task, spec, seed, test_size_or_ratio)
    return build_episode_native(task, support_idx, query_idx, spec, regression=regression)


def whole_task_pad_spec(task: NativeTask) -> GraphPadSpec:
    """Exact-fit pad spec covering ALL molecules of a task (one native
    pack per task feeds fastpack.DenseTaskPack.from_packed_all)."""
    lib, h = task._lib, ctypes.c_void_p(task._handle)
    m = task.num_molecules
    total_nodes = sum(lib.fsmol_num_nodes(h, i) for i in range(m))
    budgets = tuple(
        2 * sum(lib.fsmol_num_edges(h, i, t) for i in range(m))
        for t in range(NUM_EDGE_TYPES)
    )
    return GraphPadSpec(num_graphs=m, node_budget=total_nodes + 1, edge_budgets=budgets)


def dense_task_pack_native(
    task: NativeTask, nodes_per_graph: int, k_per_type, wire_budget: Optional[int] = None
):
    """Per-molecule dense blocks for a native task: ONE C++ pack over all
    molecules + one vectorized flat->dense re-layout (fastpack), reused
    by every episode sampled from the task. `wire_budget` stores the pack
    in wire dtypes (fastpack.DenseTaskPack.wireized)."""
    from adkf_ift_tpu.data.fastpack import DenseTaskPack

    packed_all, bool_labels, numeric_labels = task.pack(
        list(range(task.num_molecules)), whole_task_pad_spec(task)
    )
    dpack = DenseTaskPack.from_packed_all(
        packed_all,
        bool_labels,
        numeric_labels,
        nodes_per_graph=nodes_per_graph,
        k_per_type=tuple(k_per_type),
    )
    if wire_budget is not None:
        dpack = dpack.wireized(wire_budget)
    return dpack


def is_valid_numeric_task_native(task: NativeTask) -> bool:
    """Same filter as train/evaluation.is_valid_numeric_task."""
    labels = task.numeric_labels()
    if np.all(labels >= 0.0) and np.all(labels <= 100.0):
        return False
    if np.any(labels <= 0.0) or np.any(np.isinf(labels)) or np.any(np.isnan(labels)):
        return False
    return True


def build_episode_native(
    task: NativeTask,
    support_indices: List[int],
    query_indices: List[int],
    spec: EpisodeSpec,
    regression: bool = False,
) -> Episode:
    """Native-packed Episode (same semantics as data.episodes.build_episode)."""
    support, s_bool, s_num = task.pack(support_indices, spec.support_pad)
    query, q_bool, q_num = task.pack(query_indices, spec.query_pad)

    ns, nq = len(support_indices), len(query_indices)
    s_out = np.zeros((spec.support_size,), np.float32)
    q_out = np.zeros((spec.query_size,), np.float32)
    if regression:
        log_s = np.log(s_num[:ns])
        mean, std = log_s.mean(), log_s.std() or 1.0
        s_out[:ns] = ((log_s - mean) / std).astype(np.float32)
        q_out[:nq] = ((np.log(q_num[:nq]) - mean) / std).astype(np.float32)
    else:
        s_out[:ns] = s_num[:ns].astype(np.float32)
        q_out[:nq] = q_num[:nq].astype(np.float32)

    return Episode(
        support=support,
        support_labels=s_bool,
        support_numeric_labels=s_out,
        query=query,
        query_labels=q_bool,
        query_numeric_labels=q_out,
    )
