"""Meta-training engine: one jitted, mesh-sharded outer step.

Replaces the reference's sequential 16-task Python loop with per-task
scipy fits and manual grad surgery (adaptive_dkt_utils.py:352-413) by a
single compiled program: vmap(episode loss incl. inner fit + IFT) over
the stacked task batch -> mean -> grad -> optax update. With a mesh,
the task axis shards across devices and XLA reduces gradients over ICI.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from adkf_ift_tpu.data.episodes import Episode
from adkf_ift_tpu.parallel.mesh import episode_batch_sharding, replicated_sharding
from adkf_ift_tpu.utils.compile_opts import xla_compiler_options


class MetaTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(
    learning_rate: float,
    clip_value: Optional[float] = None,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """Adam with optional global-norm clipping and linear warmup
    (reference: Adam + clip_grad_norm_, adaptive_dkt_utils.py:218,409-411)."""
    txs = []
    if clip_value is not None:
        txs.append(optax.clip_by_global_norm(clip_value))
    if warmup_steps > 0:
        schedule = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        txs.append(optax.adam(schedule))
    else:
        txs.append(optax.adam(learning_rate))
    return optax.chain(*txs)


def init_train_state(params, optimizer: optax.GradientTransformation) -> MetaTrainState:
    return MetaTrainState(params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32))


def _make_accumulate(
    episode_loss_fn: Optional[Callable],
    remat: bool,
    batch_loss_fn: Optional[Callable],
) -> Callable:
    """accumulate(params, episode_batch, chunk_size) -> (summed grads,
    per-task losses). The shared core of make_meta_train_step and
    make_meta_grads_fn."""
    if batch_loss_fn is not None:
        chunk_losses = jax.checkpoint(batch_loss_fn) if remat else batch_loss_fn
    else:
        single = jax.checkpoint(episode_loss_fn) if remat else episode_loss_fn

        def chunk_losses(p, chunk):
            return jax.vmap(lambda ep: single(p, ep))(chunk)

    def chunk_grads(params, chunk):
        """Summed grads + per-task losses for one task chunk."""

        def chunk_loss(p):
            losses = chunk_losses(p, chunk)
            return jnp.sum(losses), losses

        (_, losses), grads = jax.value_and_grad(chunk_loss, has_aux=True)(params)
        return grads, losses

    def accumulate(params, episode_batch, chunk_size: Optional[int]):
        """Summed grads + per-task losses, scanning over chunks if needed."""
        n_tasks = jax.tree.leaves(episode_batch)[0].shape[0]
        if chunk_size is None or chunk_size >= n_tasks:
            return chunk_grads(params, episode_batch)
        if n_tasks % chunk_size:
            raise ValueError(f"task batch {n_tasks} not divisible by task_chunk {chunk_size}")
        chunked = jax.tree.map(
            lambda x: x.reshape((n_tasks // chunk_size, chunk_size) + x.shape[1:]),
            episode_batch,
        )

        def body(acc, chunk):
            g, losses = chunk_grads(params, chunk)
            return jax.tree.map(jnp.add, acc, g), losses

        zero = jax.tree.map(jnp.zeros_like, params)
        grad_sum, losses = jax.lax.scan(body, zero, chunked)
        return grad_sum, losses.reshape((n_tasks,))

    return accumulate


def make_meta_train_step(
    episode_loss_fn: Callable[[dict, Episode], jnp.ndarray],
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate_state: bool = True,
    task_chunk: Optional[int] = None,
    remat: bool = True,
    batch_loss_fn: Optional[Callable[[dict, Episode], jnp.ndarray]] = None,
) -> Callable[[MetaTrainState, Episode], Tuple[MetaTrainState, jnp.ndarray]]:
    """Build the jitted outer step.

    episode_loss_fn(params, episode) -> scalar loss for ONE episode.
    The returned step takes a STACKED episode batch (leading task axis)
    and returns (new_state, per-task losses).

    Memory controls (the full-size encoder at query 256 does not fit 16
    concurrent task backwards in one chip's HBM):
      * remat: `jax.checkpoint` the per-episode loss — backward recomputes
        encoder activations instead of storing them for every task.
      * task_chunk: gradient-accumulate over `lax.scan` chunks of the
        task axis (the compiled analogue of the reference's sequential
        16-task accumulation, adaptive_dkt_utils.py:361-403). Peak
        activation memory scales with task_chunk, not batch size.
        With a mesh, task_chunk counts tasks per scan step GLOBALLY and
        must be a multiple of the mesh size.
      * batch_loss_fn(params, stacked_episodes) -> per-task losses [C]:
        models that flatten the chunk into one mega-graph (e.g.
        adkf.batch_outer_loss) avoid batch dims on the encoder's
        gathers/scatters — substantially faster than vmapping
        episode_loss_fn on TPU.
    """
    accumulate = _make_accumulate(episode_loss_fn, remat, batch_loss_fn)

    def apply_update(state, grads, losses, n_tasks):
        grads = jax.tree.map(lambda g: g / n_tasks, grads)
        # Non-finite guard: one NaN/inf task batch must not poison Adam's
        # moments permanently (observed: the first-order regression arm
        # died at step 200 and stayed dead, docs/METAGAIN_REGRESSION.md).
        # The whole update is skipped — params AND opt_state keep their
        # old values — while `step` still advances so schedules/logging
        # stay aligned. Structure-preserving (no optax.apply_if_finite
        # wrapper) so existing checkpointed opt_states keep loading.
        finite = jnp.array(True)
        for g in jax.tree.leaves(grads):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
        safe_grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = optimizer.update(safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        keep = lambda new, old: jnp.where(finite, new, old)
        new_params = jax.tree.map(keep, new_params, state.params)
        new_opt_state = jax.tree.map(keep, new_opt_state, state.opt_state)
        return MetaTrainState(new_params, new_opt_state, state.step + 1), losses

    from adkf_ift_tpu.utils.wire import decompress_batch

    if mesh is None:

        def step(state: MetaTrainState, episode_batch: Episode):
            episode_batch = decompress_batch(episode_batch)
            n_tasks = jax.tree.leaves(episode_batch)[0].shape[0]
            grads, losses = accumulate(state.params, episode_batch, task_chunk)
            return apply_update(state, grads, losses, n_tasks)

        return jax.jit(step, donate_argnums=(0,) if donate_state else (),
                       compiler_options=xla_compiler_options())

    # Mesh path: shard_map over the task axis. Each device accumulates
    # grads over its LOCAL episodes (flat-chunk encoding included — the
    # flattening happens per device so gathers never cross chips), then
    # one psum over ICI reduces the gradient (SURVEY.md §2.9).
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from adkf_ift_tpu.parallel.mesh import TASK_AXIS

    def sharded_step(state: MetaTrainState, episode_batch: Episode):
        n_tasks = jax.tree.leaves(episode_batch)[0].shape[0]
        n_devices = mesh.shape[TASK_AXIS]
        local_chunk = None
        if task_chunk is not None:
            local_chunk = max(task_chunk // n_devices, 1)

        def device_fn(params, local_batch):
            local_batch = decompress_batch(local_batch)
            grads, losses = accumulate(params, local_batch, local_chunk)
            grads = jax.lax.psum(grads, TASK_AXIS)
            return grads, losses

        grads, losses = shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P(), P(TASK_AXIS)),
            out_specs=(P(), P(TASK_AXIS)),
            check_vma=False,
        )(state.params, episode_batch)
        return apply_update(state, grads, losses, n_tasks)

    state_sharding = MetaTrainState(
        params=replicated_sharding(mesh),
        opt_state=replicated_sharding(mesh),
        step=replicated_sharding(mesh),
    )
    return jax.jit(
        sharded_step,
        in_shardings=(state_sharding, episode_batch_sharding(mesh)),
        out_shardings=(state_sharding, episode_batch_sharding(mesh)),
        donate_argnums=(0,) if donate_state else (),
        compiler_options=xla_compiler_options(),
    )


def make_meta_grads_fn(
    episode_loss_fn: Optional[Callable[[dict, Episode], jnp.ndarray]] = None,
    mesh: Optional[Mesh] = None,
    task_chunk: Optional[int] = None,
    remat: bool = True,
    batch_loss_fn: Optional[Callable[[dict, Episode], jnp.ndarray]] = None,
) -> Callable[[dict, Episode], Tuple[dict, jnp.ndarray]]:
    """Jitted (params, episode_batch) -> (MEAN grads, per-task losses).

    Optimizer-free twin of make_meta_train_step, sharing _make_accumulate
    and the identical shard_map/psum structure. Exists so the multi-chip
    equivalence tests (and __graft_entry__.dryrun_multichip) can assert
    the mesh psum path is numerically 1:1 with the single-device step —
    Adam normalizes away gradient SCALE, so a psum that over-counts by
    n_devices would be invisible in an optimizer-trajectory comparison
    (SURVEY.md §2.9: the psum accumulation replaces
    adaptive_dkt_utils.py:361-403 1:1 and must match it numerically).
    """
    accumulate = _make_accumulate(episode_loss_fn, remat, batch_loss_fn)
    from adkf_ift_tpu.utils.wire import decompress_batch

    if mesh is None:

        def grads_fn(params, episode_batch):
            episode_batch = decompress_batch(episode_batch)
            n_tasks = jax.tree.leaves(episode_batch)[0].shape[0]
            grads, losses = accumulate(params, episode_batch, task_chunk)
            return jax.tree.map(lambda g: g / n_tasks, grads), losses

        return jax.jit(grads_fn, compiler_options=xla_compiler_options())

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from adkf_ift_tpu.parallel.mesh import TASK_AXIS

    def sharded_grads(params, episode_batch):
        n_tasks = jax.tree.leaves(episode_batch)[0].shape[0]
        n_devices = mesh.shape[TASK_AXIS]
        local_chunk = None
        if task_chunk is not None:
            local_chunk = max(task_chunk // n_devices, 1)

        def device_fn(params, local_batch):
            local_batch = decompress_batch(local_batch)
            grads, losses = accumulate(params, local_batch, local_chunk)
            grads = jax.lax.psum(grads, TASK_AXIS)
            return grads, losses

        grads, losses = shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P(), P(TASK_AXIS)),
            out_specs=(P(), P(TASK_AXIS)),
            check_vma=False,
        )(params, episode_batch)
        return jax.tree.map(lambda g: g / n_tasks, grads), losses

    return jax.jit(
        sharded_grads,
        in_shardings=(replicated_sharding(mesh), episode_batch_sharding(mesh)),
        out_shardings=(replicated_sharding(mesh), episode_batch_sharding(mesh)),
        compiler_options=xla_compiler_options(),
    )
