"""Host-side training loop for episodic meta-training.

The equivalent of ADKTModelTrainer.train_loop (adaptive_dkt_utils.py:329-458)
and its DKT sibling: stream episodes from the background reader, stack
task batches, run the jitted mesh-sharded outer step, validate every
`validate_every_num_steps` by full few-shot evaluation on the validation
fold, and checkpoint the best model (best_validation/ + fully_trained/).

Differences by design:
  * episode packing happens in reader threads; the device only ever sees
    static padded pytrees;
  * the trainer supports mid-run resume (step counter + optimizer state
    ride in the checkpoint) — the reference cannot resume (SURVEY.md §5).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import Callable, Iterator, Optional

import numpy as np

from adkf_ift_tpu.data import fastpack
from adkf_ift_tpu.data.dataset import DataFold, FSMolDataset
from adkf_ift_tpu.data.episodes import (
    Episode,
    EpisodeOverflowError,
    EpisodeSpec,
    build_episode,
    stack_episodes,
)
from adkf_ift_tpu.data.samplers import SamplingException, StratifiedTaskSampler
from adkf_ift_tpu.data.task import Task
from adkf_ift_tpu.train.evaluation import is_valid_numeric_task
from adkf_ift_tpu.train.meta import MetaTrainState
from adkf_ift_tpu.utils.checkpoints import save_checkpoint, wait_for_async

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class TrainLoopConfig:
    num_train_steps: int = 10000
    tasks_per_batch: int = 16
    support_set_size: int = 64
    query_set_size: int = 256
    validate_every_num_steps: int = 50
    log_every_num_steps: int = 10
    num_reader_workers: int = 4
    nodes_per_graph: int = 48
    edges_per_graph: tuple = (80, 32, 16)  # per-edge-type budgets
    # "flax" (host-local msgpack) or "orbax" (sharded-array aware, saves
    # async so validation-time checkpointing never stalls the device).
    checkpoint_backend: str = "flax"
    # Optional per-episode re-layout (e.g. ops/dense_block.episode_to_dense
    # for the fused Pallas MP encoder); runs in the reader threads.
    episode_transform: Optional[Callable] = None
    # Host->device pipeline: losslessly narrow wire dtypes (utils/wire:
    # fingerprints/masks/features to uint8/16, indices to int16 — the
    # step decompresses on-device) and device_put the NEXT batch from a
    # background thread while the current step computes. On the
    # transfer-bound tunnel this is the difference between 0.42 and
    # ~1.3 steps/s at the bench configuration.
    compress_wire: bool = True
    prefetch_batches: int = 2
    # Nonzero budget for the sparse fingerprint wire (utils/wire.SparseCounts,
    # ~3.5x fewer fp bytes); 0 disables. Leaves exceeding the budget fall
    # back to dense permanently (stable jit signature).
    sparse_fp_budget: int = 192


def episode_stream(
    dataset: FSMolDataset,
    fold: DataFold,
    spec: EpisodeSpec,
    regression: bool = False,
    repeat: bool = True,
    num_workers: int = 4,
    samples_per_task: int = 1,
    shard: Optional[tuple] = None,
    episode_transform: Optional[Callable] = None,
    wire_budget: Optional[int] = None,
) -> Iterator[Episode]:
    """Stream padded episodes from per-task files (the analogue of
    get_dkt_task_sample_iterable, data/dkt.py:156-207)."""
    sampler = StratifiedTaskSampler(
        train_size_or_ratio=spec.support_size, test_size_or_ratio=spec.query_size
    )
    from adkf_ift_tpu.data import native as native_loader

    use_native = native_loader.native_available()

    transform = episode_transform or (lambda ep: ep)

    # Dense-layout fast path: when the transform is the dense re-layout
    # (ops/dense_block.episode_to_dense), skip the per-episode Python
    # packer + per-episode re-layout entirely — build ONE per-task dense
    # pack (fastpack.DenseTaskPack) and assemble episodes by fancy-index.
    # Byte-identical episodes (tests/test_fastpack.py); ~10x less host
    # work per episode, which is what bounds real training throughput on
    # this deployment (CLAUDE.md: host side, not the device, is the
    # bottleneck once transfers are compressed).
    dense_kw = fastpack.dense_transform_kwargs(episode_transform)

    # Dense packs + labels cached ACROSS task revisits (repeat=True
    # re-reads every task each epoch) keyed by stable task name;
    # LRU-capped. A cache HIT serves episodes with NO file parse at all
    # — measured: re-parsing the gzip JSONL was 59 of the 63 ms/episode
    # on revisits, capping real training at ~1.0 steps/s. False = task
    # needs the slow path (oversized molecule).
    pack_cache: "dict" = {}
    pack_order: "list" = []
    _PACK_CACHE_MAX = 256  # ~1 MB/task in wire dtypes

    def _cache_put(name, entry):
        pack_cache[name] = entry
        pack_order.append(name)
        if len(pack_order) > _PACK_CACHE_MAX:
            pack_cache.pop(pack_order.pop(0), None)
        return entry

    def _task_name_of(path):
        return os.path.basename(path).split(".jsonl")[0]

    def _build_entry(name, dpack_builder, labels, numeric_ok):
        try:
            dpack = dpack_builder()
        except EpisodeOverflowError:
            # A molecule exceeds the dense budgets: fall back to
            # per-episode packing so episodes not containing it still
            # stream (slow-path parity).
            dpack = None
        if dpack is None:
            return _cache_put(name, False)
        return _cache_put(
            name,
            {"dpack": dpack, "labels": np.asarray(labels), "numeric_ok": bool(numeric_ok)},
        )

    def cached_episodes(name, ent, idx):
        """Episodes from a cache entry — no file IO, no parsing."""
        if regression and not ent["numeric_ok"]:
            return
        for k in range(samples_per_task):
            try:
                s_idx, q_idx = native_loader.stratified_indices_from_labels(
                    ent["labels"], name, spec, seed=idx + k
                )
                yield fastpack.assemble_dense_by_idx(
                    ent["dpack"], s_idx, q_idx, spec, regression=regression
                )
            except (SamplingException, ValueError) as e:
                logger.debug("%s: sampling failed (%s)", name, e)

    def native_task_episodes(task, idx):
        numeric_ok = not regression or native_loader.is_valid_numeric_task_native(task)
        if regression and not numeric_ok:
            if dense_kw is not None:
                _cache_put(task.name, {"dpack": None, "labels": None, "numeric_ok": False})
            return
        if dense_kw is not None and task.name not in pack_cache:
            _build_entry(
                task.name,
                lambda: native_loader.dense_task_pack_native(
                    task, dense_kw[0], dense_kw[1], wire_budget=wire_budget
                ),
                task.bool_labels(),
                numeric_ok,
            )
        ent = pack_cache.get(task.name) if dense_kw is not None else None
        if ent:
            yield from cached_episodes(task.name, ent, idx)
            return
        for k in range(samples_per_task):
            try:
                yield transform(
                    native_loader.stratified_episode_native(
                        task, spec, seed=idx + k, regression=regression
                    )
                )
            except (SamplingException, ValueError) as e:
                logger.debug("%s: native sampling failed (%s)", task.name, e)

    def native_episodes(path, idx):
        if dense_kw is not None:
            ent = pack_cache.get(_task_name_of(path))
            if ent is not None and ent is not False:
                yield from cached_episodes(_task_name_of(path), ent, idx)
                return
        yield from native_task_episodes(native_loader.NativeTask(path), idx)

    def python_episodes(path, idx):
        if dense_kw is not None:
            name = _task_name_of(path)
            ent = pack_cache.get(name)
            if ent is not None and ent is not False:
                yield from cached_episodes(name, ent, idx)
                return
        task = Task.load_from_file(path)
        numeric_ok = not regression or is_valid_numeric_task(task)
        if regression and not numeric_ok:
            if dense_kw is not None:
                _cache_put(task.name, {"dpack": None, "labels": None, "numeric_ok": False})
            return
        if dense_kw is not None and task.name not in pack_cache:
            _build_entry(
                task.name,
                lambda: fastpack.task_pack_for(task, dense_kw, wire_budget=wire_budget),
                [1.0 if s.bool_label else -1.0 for s in task.samples],
                numeric_ok,
            )
        ent = pack_cache.get(task.name) if dense_kw is not None else None
        if ent:
            yield from cached_episodes(task.name, ent, idx)
            return
        for k in range(samples_per_task):
            try:
                sample = sampler.sample(task, seed=idx + k)
            except (SamplingException, ValueError) as e:
                logger.debug("%s: sampling failed (%s)", task.name, e)
                continue
            try:
                yield transform(build_episode(sample, spec, regression=regression))
            except Exception as e:  # noqa: BLE001 — budget overflows etc.
                logger.debug("%s: packing failed (%s)", task.name, e)

    if use_native and num_workers > 0 and dense_kw is None:
        # Fully-native data plane: path dispensing + gzip/JSON parse +
        # bounded buffering in C++ worker threads (fsmol_queue_*), the
        # Python side only samples/packs episodes from parsed tasks.
        # (Dense-layout streams go through the path-based reader below
        # instead: the pack cache makes revisits parse-free, and the
        # queue would re-parse every visit — the single host core's
        # dominant cost.)
        paths = dataset.get_fold_paths(fold, shard)

        def native_queue_stream():
            queue = native_loader.NativeTaskQueue(
                paths, num_workers=num_workers, repeat=repeat
            )
            try:
                for task, idx in queue:
                    try:
                        yield from native_task_episodes(task, idx)
                    except Exception:  # noqa: BLE001 — skip bad tasks, keep streaming
                        logger.exception("Failed episodes for task %s", task.name)
            finally:
                queue.close()

        return native_queue_stream()

    def reader_fn(paths, idx):
        for path in paths:
            try:
                # C++ loader (native/fsmol_loader.cc) when built; identical
                # episodes (same seed contract) via the Python path otherwise.
                yield from (native_episodes if use_native else python_episodes)(path, idx)
            except Exception:  # noqa: BLE001
                logger.exception("Unreadable task file %s", path)
                continue

    return iter(
        dataset.get_task_reading_iterable(
            fold, task_reader_fn=reader_fn, repeat=repeat, num_workers=num_workers, shard=shard
        )
    )


def normalize_fp(episodes):
    """A batch that mixes SparseCounts and dense fingerprint episodes
    (a slow-path fallback amid wire-ready ones) cannot stack; densify
    the sparse minority so the codec re-decides uniformly."""
    from adkf_ift_tpu.utils.wire import SparseCounts, densify_counts_host

    def has_sparse(ep):
        return isinstance(ep.support.fingerprints, SparseCounts)

    kinds = {has_sparse(ep) for ep in episodes}
    if len(kinds) <= 1:
        return episodes
    return [
        ep._replace(
            support=ep.support._replace(
                fingerprints=densify_counts_host(ep.support.fingerprints)
            ),
            query=ep.query._replace(
                fingerprints=densify_counts_host(ep.query.fingerprints)
            ),
        )
        if has_sparse(ep)
        else ep
        for ep in episodes
    ]


def _device_batch_pipeline(
    stream: Iterator[Episode],
    tasks_per_batch: int,
    shard_batch: Optional[Callable],
    compress: bool,
    depth: int,
    sparse_fp_budget: int = 0,
    stats: Optional[dict] = None,
):
    """Background thread: stack + (optionally) compress + device_put the
    next `depth` batches so the host->device transfer overlaps the
    running step. Returns (next_fn, stop_fn).

    `stats`, when given, accumulates wall-clock per pipeline stage
    (episodes_s / stack_compress_s / upload_s / batches) for profiling
    (benchmarks/train_pipeline_profile.py); read it only after stop_fn
    returns — stop_fn joins both threads, so the dict is quiescent."""
    import queue as pyqueue
    import threading

    import jax

    from adkf_ift_tpu.utils.wire import WireCodec

    out: "pyqueue.Queue" = pyqueue.Queue(maxsize=max(1, depth))
    stop = threading.Event()
    # Stable per-leaf dtype schema across the whole run: a batch-dependent
    # signature would recompile the step mid-training (ADVICE r1).
    codec = WireCodec(sparse_counts_budget=sparse_fp_budget)

    def blocking_put(item):
        """Stop-aware put that never silently drops `item`."""
        while not stop.is_set():
            try:
                out.put(item, timeout=0.2)
                return
            except pyqueue.Full:
                continue

    # Two pipeline threads: the assembler's numpy work holds the (single)
    # host core while the uploader's device_put mostly waits on the
    # tunnel network (GIL released) — overlapping them hides the smaller
    # of the two behind the larger. Measured on adkf-train at bench
    # shapes: host chain ~0.55 s + transfer ~0.34 s serialized in one
    # thread capped training at ~1.1 steps/s with the device at ~0.5 s.
    hq: "pyqueue.Queue" = pyqueue.Queue(maxsize=max(1, depth))

    def blocking_put_to(q, item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return
            except pyqueue.Full:
                continue

    def assembler():
        sentinel = None  # StopIteration -> None; error -> the exception
        try:
            while not stop.is_set():
                t0 = time.perf_counter()
                episodes = normalize_fp([next(stream) for _ in range(tasks_per_batch)])
                t1 = time.perf_counter()
                batch = stack_episodes(episodes)
                if compress:
                    batch = codec.compress(batch)
                if stats is not None:
                    stats["episodes_s"] = stats.get("episodes_s", 0.0) + (t1 - t0)
                    stats["stack_compress_s"] = stats.get("stack_compress_s", 0.0) + (
                        time.perf_counter() - t1
                    )
                    stats["batches"] = stats.get("batches", 0) + 1
                blocking_put_to(hq, batch)
        except StopIteration:
            pass
        except Exception as e:  # noqa: BLE001 — re-raised in next_batch
            logger.exception("prefetch assembler failed")
            sentinel = e
        finally:
            blocking_put_to(hq, sentinel)

    def uploader():
        sentinel = None
        try:
            while not stop.is_set():
                try:
                    # Timeout so a stop() with an idle assembler can't
                    # leave this thread parked on get() forever (stop_fn
                    # joins both threads).
                    item = hq.get(timeout=0.2)
                except pyqueue.Empty:
                    continue
                if item is None or isinstance(item, Exception):
                    sentinel = item
                    return
                t0 = time.perf_counter()
                batch = (
                    shard_batch(item) if shard_batch is not None else jax.device_put(item)
                )
                if stats is not None:
                    stats["upload_s"] = stats.get("upload_s", 0.0) + (
                        time.perf_counter() - t0
                    )
                blocking_put(batch)
        except Exception as e:  # noqa: BLE001
            logger.exception("prefetch uploader failed")
            sentinel = e
        finally:
            blocking_put(sentinel)

    threads = [
        threading.Thread(target=assembler, daemon=True, name="batch-assembler"),
        threading.Thread(target=uploader, daemon=True, name="device-uploader"),
    ]
    for t in threads:
        t.start()

    def next_batch():
        item = out.get()
        if item is None:
            raise StopIteration("episode stream exhausted")
        if isinstance(item, Exception):
            raise item
        return item

    def _drain(q):
        try:
            while True:
                q.get_nowait()
        except pyqueue.Empty:
            pass

    def stop_fn():
        stop.set()
        # Drain so threads blocked on a full queue observe the stop flag,
        # then join (bounded) so `stats` is quiescent when we return.
        deadline = time.perf_counter() + 10.0
        for t in threads:
            while t.is_alive() and time.perf_counter() < deadline:
                _drain(hq)
                _drain(out)
                t.join(timeout=0.2)
        _drain(hq)
        _drain(out)

    return next_batch, stop_fn


def current_host_shard() -> Optional[tuple]:
    """(process_index, process_count) when running multi-process, else
    None — the multi-host data-striping selector (SURVEY.md §2.9)."""
    import jax

    if jax.process_count() > 1:
        return (jax.process_index(), jax.process_count())
    return None


def train_loop(
    state: MetaTrainState,
    step_fn: Callable,
    dataset: FSMolDataset,
    out_dir: str,
    loop_config: TrainLoopConfig,
    model_config,
    validate_fn: Optional[Callable[[MetaTrainState], float]] = None,
    regression: bool = False,
    shard_batch: Optional[Callable] = None,
    start_step: int = 0,
) -> MetaTrainState:
    """Run the outer loop; returns the final state. `validate_fn` maps a
    train state to a scalar validation score (higher is better)."""
    os.makedirs(out_dir, exist_ok=True)
    spec = EpisodeSpec(
        support_size=loop_config.support_set_size,
        query_size=loop_config.query_set_size,
        nodes_per_graph=loop_config.nodes_per_graph,
        edges_per_graph=loop_config.edges_per_graph,
    )
    # Multi-host: each process streams a disjoint stripe of task files.
    shard = current_host_shard()
    stream = episode_stream(
        dataset,
        DataFold.TRAIN,
        spec,
        regression=regression,
        repeat=True,
        num_workers=loop_config.num_reader_workers,
        shard=shard,
        episode_transform=loop_config.episode_transform,
        # Assemble directly in wire dtypes (sparse fps, uint8 features)
        # when the batches go over the compressed wire anyway: the codec
        # then passes leaves through with no per-batch scans.
        wire_budget=(
            loop_config.sparse_fp_budget if loop_config.compress_wire else None
        ),
    )

    backend = loop_config.checkpoint_backend
    use_async = backend == "orbax"
    best_validation_score = -np.inf
    save_checkpoint(
        os.path.join(out_dir, "best_validation"), model_config, state.params, backend=backend
    )

    next_batch, stop_prefetch = _device_batch_pipeline(
        stream,
        loop_config.tasks_per_batch,
        shard_batch,
        compress=loop_config.compress_wire,
        depth=loop_config.prefetch_batches,
        sparse_fp_budget=loop_config.sparse_fp_budget,
    )

    window_losses = []
    t_window = time.perf_counter()
    for step in range(start_step + 1, loop_config.num_train_steps + 1):
        batch = next_batch()
        state, losses = step_fn(state, batch)
        # Per-sample reporting like the reference (task_loss / |query|).
        window_losses.append(float(np.mean(np.asarray(losses))) / spec.query_size)

        if step % loop_config.log_every_num_steps == 0:
            dt = time.perf_counter() - t_window
            logger.info(
                "step %d/%d: loss %.4f (%.2f steps/s)",
                step,
                loop_config.num_train_steps,
                float(np.mean(window_losses)),
                len(window_losses) / max(dt, 1e-9),
            )
            window_losses = []
            t_window = time.perf_counter()

        if validate_fn is not None and step % loop_config.validate_every_num_steps == 0:
            score = validate_fn(state)
            logger.info("validated at step %d: %.4f", step, score)
            if score > best_validation_score:
                best_validation_score = score
                wait_for_async()  # never two in-flight saves to one dir
                save_checkpoint(
                    os.path.join(out_dir, "best_validation"),
                    model_config,
                    state.params,
                    opt_state=state.opt_state,
                    step=step,
                    backend=backend,
                    async_save=use_async,
                )
                logger.info("new best model at step %d (%.4f)", step, score)

    stop_prefetch()
    wait_for_async()  # drain in-flight async saves before the final overwrite
    save_checkpoint(
        os.path.join(out_dir, "fully_trained"),
        model_config,
        state.params,
        opt_state=state.opt_state,
        step=loop_config.num_train_steps,
        backend=backend,
    )
    wait_for_async()
    return state
