"""Host->device wire compression for episode batches.

The tunnel-attached TPU moves host->device bytes slowly enough that a
training step feeding fresh episodes is TRANSFER-bound: fingerprints
(2048-d f32 counts), one-hot-ish node features, and 0/1 masks dominate
the batch at 4 bytes/value. Both are losslessly representable in 1-2
bytes, and index vectors fit int16.

Compression runs on the HOST (reader/prefetch thread): float32 leaves
whose values are integral and in range become uint8/uint16; int32/int64
leaves whose values fit become int16. decompress_batch is TRACED at the
top of the train step and restores float32/int32 on-device — the
compressed dtypes are unambiguous markers, since episodes natively
contain only float32/int32/int64 leaves.

Dtype stability: a jitted step's input signature must not depend on
per-batch value ranges (a fingerprint count crossing 255 must not flip
uint8->uint16 and trigger a fresh multi-minute remote compile mid-run).
`WireCodec` therefore fixes the schema per leaf PATH on first use and
only ever widens it monotonically (uint8 -> uint16 -> float32 for float
leaves, int16 -> native for index leaves), so a long training run sees
at most two signature changes per leaf, not one per unlucky batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Widening ladders (lossless at every rung). A leaf's schema entry can
# only move right, never left — that is what makes signatures stable.
_FLOAT_LADDER = ("uint8", "uint16", "float32")
_INT_LADDER = ("int8", "int16", "int32", "int64")


def _candidate_dtype(x: np.ndarray) -> str:
    """Narrowest lossless dtype for this value."""
    if x.dtype == np.float32:
        if x.size == 0:
            return "uint8"
        mn = x.min()
        if mn >= 0.0:
            mx = x.max()
            if mx <= 65535.0 and np.all(x == np.rint(x)):
                return "uint8" if mx <= 255.0 else "uint16"
        return "float32"
    if x.dtype in (np.int32, np.int64):
        if x.size == 0:
            return "int8"
        mn, mx = x.min(), x.max()
        if mn >= -128 and mx < 128:
            return "int8"  # node indices on the dense layout fit here
        if mn >= -32768 and mx < 32768:
            return "int16"
        return str(x.dtype)
    return str(x.dtype)


def _widen(recorded: str, candidate: str) -> str:
    for ladder in (_FLOAT_LADDER, _INT_LADDER):
        if recorded in ladder and candidate in ladder:
            return ladder[max(ladder.index(recorded), ladder.index(candidate))]
    # Different families should never happen for a fixed leaf path
    # (episode pytrees have fixed leaf dtypes); fall back to no-compress.
    return candidate


class SparseCounts:
    """Sparse last-axis encoding of a count tensor (fingerprints): the
    positions of (up to) `budget` nonzeros per row + their values. A
    registered pytree whose dense width rides in static aux data, so it
    crosses device_put/jit boundaries and decompresses on-device."""

    def __init__(self, indices, values, dense_size: int):
        self.indices = indices  # [..., K] int16
        self.values = values    # [..., K] uint8/uint16
        self.dense_size = int(dense_size)


jax.tree_util.register_pytree_node(
    SparseCounts,
    lambda sp: ((sp.indices, sp.values), sp.dense_size),
    lambda dense_size, children: SparseCounts(children[0], children[1], dense_size),
)


def _sparsify_counts(x: np.ndarray, budget: int):
    """[..., D] nonnegative integral float array -> SparseCounts, or None
    if any row has more than `budget` nonzeros."""
    nz = x != 0
    if x.size and int(nz.sum(axis=-1).max()) > budget:
        return None
    # stable argsort of (is-zero) puts nonzero positions first, in order.
    order = np.argsort(~nz, axis=-1, kind="stable")[..., :budget]
    vals = np.take_along_axis(x, order, axis=-1)  # pad slots read zeros
    mx = vals.max() if vals.size else 0
    vdtype = np.uint8 if mx <= 255 else np.uint16
    return SparseCounts(order.astype(np.int16), vals.astype(vdtype), x.shape[-1])


def densify_counts_host(sp: SparseCounts) -> np.ndarray:
    """Host-side (numpy) scatter back to the dense [..., D] float32 —
    used to normalize a batch that mixes sparse and dense fingerprint
    episodes (rare: a slow-path fallback episode amid wire-ready ones)."""
    idx = np.asarray(sp.indices, np.int64)
    vals = np.asarray(sp.values, np.float32)
    lead, k = idx.shape[:-1], idx.shape[-1]
    flat_idx = idx.reshape(-1, k)
    flat_vals = vals.reshape(-1, k)
    out = np.zeros((flat_idx.shape[0], sp.dense_size), np.float32)
    # add.at: pad slots (idx 0, value 0) accumulate harmlessly.
    np.add.at(out, (np.arange(flat_idx.shape[0])[:, None], flat_idx), flat_vals)
    return out.reshape(*lead, sp.dense_size)


def _densify_counts(sp: SparseCounts) -> jnp.ndarray:
    """On-device (traced) scatter back to the dense [..., D] float32."""
    idx = sp.indices.astype(jnp.int32)
    vals = sp.values.astype(jnp.float32)
    lead = idx.shape[:-1]
    k = idx.shape[-1]
    flat_idx = idx.reshape(-1, k)
    flat_vals = vals.reshape(-1, k)
    rows = flat_idx.shape[0]
    dense = jnp.zeros((rows, sp.dense_size), jnp.float32)
    # pad slots carry value 0 -> scatter-add of zero is a no-op.
    dense = dense.at[jnp.arange(rows)[:, None], flat_idx].add(flat_vals)
    return dense.reshape(*lead, sp.dense_size)


class WireCodec:
    """Stateful compressor with a monotone per-leaf-path dtype schema.

    sparse_counts_budget: when set, leaves whose path contains
    "fingerprints" additionally go over the wire as SparseCounts
    (indices+values of the nonzeros) — a further ~3.5x on ECFP count
    vectors. The decision is monotone per leaf: the first batch that
    exceeds the nonzero budget demotes that leaf to dense forever, so the
    jitted signature changes at most once."""

    def __init__(self, sparse_counts_budget: int = 0):
        self._schema: dict = {}
        self._sparse_ok: dict = {}
        self._budget = int(sparse_counts_budget)

    def compress(self, batch):
        flat, treedef = jax.tree_util.tree_flatten_with_path(batch)
        out = []
        for path, leaf in flat:
            x = np.asarray(leaf)
            key = jax.tree_util.keystr(path)
            if (
                self._budget > 0
                and "fingerprints" in key
                and x.dtype == np.float32
                and self._sparse_ok.get(key, True)
            ):
                mn = x.min() if x.size else 0.0
                sp = (
                    _sparsify_counts(x, self._budget)
                    if (mn >= 0.0 and (not x.size or np.all(x == np.rint(x))))
                    else None
                )
                if sp is None:
                    self._sparse_ok[key] = False  # dense forever: stable signature
                else:
                    out.append(sp)
                    continue
            cand = _candidate_dtype(x)
            recorded = self._schema.get(key)
            dtype = cand if recorded is None else _widen(recorded, cand)
            self._schema[key] = dtype
            out.append(x if dtype == str(x.dtype) else x.astype(dtype))
        return jax.tree_util.tree_unflatten(treedef, out)


def compress_batch(batch):
    """One-shot host-side lossless narrowing (numpy). Prefer a WireCodec
    for anything feeding a jitted function repeatedly — this stateless
    form picks dtypes per batch and so has a data-dependent signature."""
    return WireCodec().compress(batch)


def _decompress_leaf(x):
    if x.dtype in (jnp.uint8, jnp.uint16):
        return x.astype(jnp.float32)
    if x.dtype in (jnp.int8, jnp.int16):
        return x.astype(jnp.int32)
    return x


def decompress_batch(batch):
    """On-device (traced) restore to the episode's native dtypes
    (including scattering SparseCounts leaves back to dense)."""
    return jax.tree.map(
        lambda x: _densify_counts(x) if isinstance(x, SparseCounts) else _decompress_leaf(x),
        batch,
        is_leaf=lambda x: isinstance(x, SparseCounts),
    )
