"""Host->device wire compression for episode batches.

The tunnel-attached TPU moves host->device bytes slowly enough that a
training step feeding fresh episodes is TRANSFER-bound: fingerprints
(2048-d f32 counts), one-hot-ish node features, and 0/1 masks dominate
the batch at 4 bytes/value. Both are losslessly representable in 1-2
bytes, and index vectors fit int16.

compress_batch runs on the HOST (reader/prefetch thread): float32 leaves
whose values are integral and in range become uint8/uint16; int32/int64
leaves whose values fit become int16. decompress_batch is TRACED at the
top of the train step and restores float32/int32 on-device — the
compressed dtypes are unambiguous markers, since episodes natively
contain only float32/int32/int64 leaves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _compress_leaf(x):
    x = np.asarray(x)
    if x.dtype == np.float32 and x.size:
        mn = x.min()
        if mn >= 0.0:
            mx = x.max()
            if mx <= 65535.0 and np.all(x == np.rint(x)):
                return x.astype(np.uint8 if mx <= 255.0 else np.uint16)
    elif x.dtype in (np.int32, np.int64):
        if x.size == 0 or (x.min() >= -32768 and x.max() < 32768):
            return x.astype(np.int16)
    return x


def compress_batch(batch):
    """Host-side lossless narrowing of an episode batch (numpy)."""
    return jax.tree.map(_compress_leaf, batch)


def _decompress_leaf(x):
    if x.dtype in (jnp.uint8, jnp.uint16):
        return x.astype(jnp.float32)
    if x.dtype == jnp.int16:
        return x.astype(jnp.int32)
    return x


def decompress_batch(batch):
    """On-device (traced) restore to the episode's native dtypes."""
    return jax.tree.map(_decompress_leaf, batch)
