"""Device-mesh utilities for task-batch data parallelism.

The reference accumulates gradients over 16 tasks sequentially in Python
(fs_mol/utils/adaptive_dkt_utils.py:361-403) on a single device. Here a
task batch is a stacked episode pytree with a leading task axis, vmapped
inside one jitted step and sharded over a 1-D "task" mesh axis; XLA
inserts the psum for the gradient mean over ICI (SURVEY.md §2.9). This
is the whole distributed story — there is deliberately no NCCL/MPI-style
plumbing to port.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TASK_AXIS = "task"


def make_task_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or given) devices with a single task axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (TASK_AXIS,))


def episode_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (task) axis of every leaf of a stacked episode."""
    return NamedSharding(mesh, P(TASK_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_episode_batch(mesh: Mesh, episode_batch):
    """device_put a stacked episode pytree with its task axis sharded."""
    sharding = episode_batch_sharding(mesh)
    return jax.device_put(episode_batch, sharding)
