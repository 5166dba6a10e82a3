"""Masked segment ops on static padded arrays — the XLA replacement for
torch_scatter (reference GNN/readout dependency, SURVEY.md §2.9 item 1).

All ops take a `num_segments` that is STATIC and a float mask selecting
valid elements, so they compile once per episode spec and lower to XLA
scatter/segment primitives that TPU handles natively. Semantics match
torch_scatter where the reference depends on them:
  * empty segments: sum/mean -> 0, max of relu'd inputs -> 0.
  * segment_softmax: numerically stable (max-shifted), masked entries
    get probability 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if mask is not None:
        data = data * mask[..., None] if data.ndim > mask.ndim else data * mask
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, jnp.float32) if mask is None else mask
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    total = segment_sum(data, segment_ids, num_segments, mask)
    count = segment_count(segment_ids, num_segments, mask)
    denom = jnp.maximum(count, 1.0)
    return total / (denom[:, None] if total.ndim == 2 else denom)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    empty_value: float = 0.0,
) -> jnp.ndarray:
    """Max per segment; empty segments (and fully-masked ones) yield
    `empty_value` (torch_scatter fills empty slots with 0 after the
    reference relu's messages, gnn.py:223-230)."""
    neg_inf = jnp.asarray(-jnp.inf, data.dtype)
    if mask is not None:
        m = mask[..., None] if data.ndim > mask.ndim else mask
        data = jnp.where(m > 0, data, neg_inf)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, empty_value)


def segment_min(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    empty_value: float = 0.0,
) -> jnp.ndarray:
    pos_inf = jnp.asarray(jnp.inf, data.dtype)
    if mask is not None:
        m = mask[..., None] if data.ndim > mask.ndim else mask
        data = jnp.where(m > 0, data, pos_inf)
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, empty_value)


def segment_softmax(
    scores: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax within each segment along axis 0 (the scatter_softmax /
    exp(scatter_log_softmax) of the reference, gnn.py:370-376,
    graph_readout.py:238). Masked entries get probability 0."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    if mask is not None:
        m = mask[..., None] if scores.ndim > mask.ndim else mask
        scores = jnp.where(m > 0, scores, neg_inf)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = scores - seg_max[segment_ids]
    exp = jnp.where(jnp.isfinite(shifted), jnp.exp(shifted), 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]
