"""Shared machinery for episodic train / test / walltime CLIs.

The reference repeats this structure per model family ({model}_train.py,
{model}_test.py, {model}_walltime.py + *ModelTrainer classes); here the
per-model CLIs are thin wrappers over these runners.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import time
from typing import Callable, List, Optional

import jax
import numpy as np

from adkf_ift_tpu.data.dataset import DataFold, FSMolDataset
from adkf_ift_tpu.data.episodes import EpisodeSpec, build_episode
from adkf_ift_tpu.data.samplers import SamplingException, StratifiedTaskSampler
from adkf_ift_tpu.train.evaluation import eval_model
from adkf_ift_tpu.train.evaluators import bind_evaluator, make_predict_fn
from adkf_ift_tpu.train.loop import TrainLoopConfig, episode_stream, train_loop
from adkf_ift_tpu.train.meta import init_train_state, make_meta_train_step, make_optimizer
from adkf_ift_tpu.utils.checkpoints import load_checkpoint, save_checkpoint

logger = logging.getLogger(__name__)


def add_episodic_train_args(parser: argparse.ArgumentParser, defaults=None) -> None:
    d = defaults or {}
    parser.add_argument("--support_set_size", type=int, default=d.get("support", 64))
    parser.add_argument("--query_set_size", type=int, default=d.get("query", 256))
    parser.add_argument("--tasks_per_batch", type=int, default=d.get("tasks_per_batch", 16))
    parser.add_argument("--num_train_steps", type=int, default=d.get("steps", 10000))
    parser.add_argument("--lr", type=float, default=d.get("lr", 1e-4), help="Learning rate")
    parser.add_argument("--clip_value", type=float, default=d.get("clip", 1.0))
    parser.add_argument("--validate-every", type=int, default=50)
    parser.add_argument(
        "--validation-support-set-sizes", type=lambda s: [int(x) for x in s.strip("[]").split(",")],
        default=d.get("val_support", [16, 64]),
    )
    parser.add_argument("--validation-query-set-size", type=int, default=256)
    parser.add_argument("--validation-num-samples", type=int, default=5)
    parser.add_argument(
        "--task-chunk", type=int, default=d.get("task_chunk", 2),
        help="Tasks per gradient-accumulation chunk (memory/throughput knob).",
    )
    parser.add_argument(
        "--no-remat", action="store_true",
        help="Disable per-episode rematerialization (faster when the "
        "chunk fits HBM; small chunks without remat measured fastest on v5e).",
    )
    parser.add_argument(
        "--resume-from", type=str, default=None,
        help="Checkpoint directory to resume mid-run (params + optimizer "
        "state + step counter; capability the reference lacks, SURVEY.md §5).",
    )
    parser.add_argument(
        "--init-encoder-from", type=str, default=None,
        help="Checkpoint directory whose ENCODER weights warm-start this "
        "run (optimizer state starts fresh; the reference's "
        "--pretrained_gnn / MoleculeNet Pre-ADKF initialization, "
        "adaptive_dkt_train.py CLI). Donor and target encoder configs "
        "must match; works across model families that share the "
        "CombinedFeatureExtractor (e.g. DKT -> ADKF-IFT warm-start).",
    )
    parser.add_argument("--num-reader-workers", type=int, default=4)
    parser.add_argument(
        "--checkpoint-backend", type=str, default="flax", choices=["flax", "orbax"],
        help="Array serialization backend; orbax saves async and "
        "understands sharded jax.Arrays (multi-host).",
    )
    add_layout_args(parser)


def add_layout_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--encoder-layout", type=str, default=None, choices=["flat", "dense"],
        help="Episode layout; 'dense' re-lays molecules as fixed [G, N] "
        "blocks (required by --mp-impl pallas; defaults to dense "
        "automatically when the model config uses the Pallas kernel).",
    )
    parser.add_argument(
        "--nodes-per-graph", type=int, default=48,
        help="Flat-packing node budget per molecule (bytes on the wire "
        "are proportional; tune to the dataset's molecule sizes).",
    )
    parser.add_argument(
        "--edges-per-graph",
        type=lambda v: tuple(int(x) for x in v.split(",")),
        default=(80, 32, 16),
        help="Flat-packing bidirectional edge budgets per bond type.",
    )
    parser.add_argument("--dense-nodes-per-graph", type=int, default=48)
    parser.add_argument(
        "--dense-k-per-type",
        type=lambda v: tuple(int(x) for x in v.split(",")),
        default=(8, 6, 6),
        help="Incoming-edge slots per node, per bond type (dense layout).",
    )


def episode_transform_for(config, args=None):
    """Dense-block re-layout when the model's encoder wants it (Pallas MP)
    or the user asked for it; None otherwise."""
    import functools

    layout = getattr(args, "encoder_layout", None) if args is not None else None
    gnn_cfg = getattr(
        getattr(getattr(config, "features", None), "graph_config", None), "gnn_config", None
    )
    wants_dense = layout == "dense" or (gnn_cfg is not None and gnn_cfg.mp_impl == "pallas")
    if layout == "flat" or not wants_dense:
        return None
    from adkf_ift_tpu.ops.dense_block import episode_to_dense

    return functools.partial(
        episode_to_dense,
        nodes_per_graph=int(getattr(args, "dense_nodes_per_graph", 48) or 48),
        k_per_type=tuple(getattr(args, "dense_k_per_type", (8, 6, 6)) or (8, 6, 6)),
    )


def make_validation_fn(
    kind: str,
    config,
    dataset: FSMolDataset,
    support_sizes: List[int],
    query_budget: int,
    num_samples: int,
    regression: bool,
    episode_transform=None,
):
    """Few-shot eval on the validation fold -> scalar score (mean
    delta-AUPRC for classification, mean R2 for regression); the
    reference's validate_by_finetuning_on_tasks (adaptive_dkt_utils.py:178-211)."""
    predict = make_predict_fn(kind, config, regression)

    def validate(state) -> float:
        evaluator = bind_evaluator(predict, state.params, regression)
        results = eval_model(
            evaluator,
            dataset,
            support_sizes=support_sizes,
            num_samples=num_samples,
            fold=DataFold.VALIDATION,
            filter_numeric_labels=regression,
            query_budget=query_budget,
            episode_transform=episode_transform,
            wire_budget=192,  # predict fns decompress on device
        )
        scores = []
        for task_results in results.values():
            for r in task_results:
                if regression:
                    scores.append(r.r2)
                else:
                    scores.append(r.avg_precision - r.fraction_pos_test)
        return float(np.mean(scores)) if scores else -np.inf
    return validate


def graft_encoder(params, init_encoder_from: str):
    """Warm-start `params`' encoder from another family's checkpoint.

    Donor params are either a bare encoder tree (ADKF) or a NamedTuple
    with an `encoder` field (DKT/DKL-style). Grafts the whole encoder
    when architectures match; otherwise falls back to the GNN
    feature-extractor subtree only (the reference's --pretrained_gnn
    semantics: FC heads differ across families, e.g. ADKT-VGP's
    1024-wide head). Any residual mismatch fails loudly here, not at
    training step 1."""
    template = params.encoder if hasattr(params, "encoder") else params
    _, donor, _, _ = load_checkpoint(init_encoder_from)
    donor_encoder = donor.encoder if hasattr(donor, "encoder") else donor

    def _shapes_match(a, b):
        if jax.tree.structure(a) != jax.tree.structure(b):
            return False
        return all(
            jax.numpy.shape(x) == jax.numpy.shape(y)
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    def _cast_like(t, d):
        return jax.tree.map(lambda ti, di: jax.numpy.asarray(di, ti.dtype), t, d)

    if _shapes_match(donor_encoder, template):
        grafted = _cast_like(template, donor_encoder)
        logger.info("encoder warm-started (full) from %s", init_encoder_from)
    else:
        t_in = template.get("params", template)
        d_in = donor_encoder.get("params", donor_encoder)
        sub = "graph_feature_extractor"
        if (
            isinstance(t_in, dict) and sub in t_in and isinstance(d_in, dict)
            and sub in d_in and _shapes_match(d_in[sub], t_in[sub])
        ):
            new_in = dict(t_in)
            new_in[sub] = _cast_like(t_in[sub], d_in[sub])
            grafted = (
                {**template, "params": new_in} if "params" in template else new_in
            )
            logger.info(
                "encoder warm-started (GNN subtree only; FC heads differ) from %s",
                init_encoder_from,
            )
        else:
            raise ValueError(
                f"--init-encoder-from {init_encoder_from}: donor encoder matches "
                "neither the full encoder nor the GNN subtree (different "
                "GNN architecture config?)"
            )
    return params._replace(encoder=grafted) if hasattr(params, "encoder") else grafted


def run_episodic_training(
    kind: str,
    config,
    init_params_fn: Callable,
    episode_loss_fn: Callable,
    args: argparse.Namespace,
    out_dir: str,
    dataset: FSMolDataset,
    regression: bool = False,
    optimizer=None,
    optimizer_factory: Optional[Callable] = None,
    batch_loss_fn: Optional[Callable] = None,
):
    """Wire the full meta-training stack and run it. `optimizer_factory`
    maps initialized params to an optax transformation (for param-group
    optimizers like MAML's); `batch_loss_fn(config, params, stacked)`
    enables flat-chunk encoding (train/meta.py)."""
    transform = episode_transform_for(config, args)
    loop_cfg = TrainLoopConfig(
        num_train_steps=args.num_train_steps,
        tasks_per_batch=args.tasks_per_batch,
        support_set_size=args.support_set_size,
        query_set_size=args.query_set_size,
        validate_every_num_steps=args.validate_every,
        num_reader_workers=args.num_reader_workers,
        checkpoint_backend=getattr(args, "checkpoint_backend", "flax"),
        episode_transform=transform,
        nodes_per_graph=getattr(args, "nodes_per_graph", 48) or 48,
        edges_per_graph=tuple(getattr(args, "edges_per_graph", (80, 32, 16))),
    )
    spec = EpisodeSpec(
        support_size=loop_cfg.support_set_size,
        query_size=loop_cfg.query_set_size,
        nodes_per_graph=loop_cfg.nodes_per_graph,
        edges_per_graph=loop_cfg.edges_per_graph,
    )
    # Init params from the first train episode's shapes.
    probe = next(
        episode_stream(
            dataset, DataFold.TRAIN, spec, regression=regression, repeat=True,
            num_workers=0, episode_transform=transform,
        )
    )
    params = init_params_fn(config, jax.random.PRNGKey(args.seed), probe)

    init_encoder_from = getattr(args, "init_encoder_from", None)
    if init_encoder_from:
        params = graft_encoder(params, init_encoder_from)

    start_step = 0
    resume_opt_state = None
    resume_from = getattr(args, "resume_from", None)
    if resume_from:
        config, params, resume_opt_state, saved_step = load_checkpoint(resume_from, params)
        start_step = saved_step or 0
        logger.info("resuming from %s at step %d", resume_from, start_step)

    if optimizer_factory is not None:
        optimizer = optimizer_factory(params)
    optimizer = optimizer or make_optimizer(args.lr, clip_value=args.clip_value)
    step_fn = make_meta_train_step(
        lambda p, e: episode_loss_fn(config, p, e),
        optimizer,
        task_chunk=args.task_chunk,
        remat=not getattr(args, "no_remat", False),
        batch_loss_fn=(
            (lambda p, e: batch_loss_fn(config, p, e)) if batch_loss_fn is not None else None
        ),
    )
    state = init_train_state(params, optimizer)
    if resume_opt_state is not None:
        import jax.numpy as jnp

        state = state._replace(
            opt_state=resume_opt_state, step=jnp.asarray(start_step, jnp.int32)
        )

    validate_fn = None
    if dataset.get_num_fold_tasks(DataFold.VALIDATION) > 0:
        validate_fn = make_validation_fn(
            kind,
            config,
            dataset,
            support_sizes=args.validation_support_set_sizes,
            query_budget=args.validation_query_set_size,
            num_samples=args.validation_num_samples,
            regression=regression,
            episode_transform=transform,
        )

    return train_loop(
        state,
        step_fn,
        dataset,
        out_dir,
        loop_cfg,
        config,
        validate_fn=validate_fn,
        regression=regression,
        start_step=start_step,
    )


def add_episodic_test_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "TRAINED_MODEL",
        type=str,
        nargs="?",
        default=None,
        help="Checkpoint directory of the trained model (omit with --use-fresh-param-init).",
    )
    parser.add_argument(
        "--use-fresh-param-init",
        action="store_true",
        help="Do not load a trained model; use fresh random init (control).",
    )
    parser.add_argument("--query-budget", type=int, default=256)
    add_layout_args(parser)


def run_episodic_test(
    kind: str,
    args: argparse.Namespace,
    out_dir: str,
    dataset: FSMolDataset,
    default_config=None,
    init_params_fn: Optional[Callable] = None,
    regression: bool = False,
):
    """Load checkpoint (or fresh init), evaluate over the test fold with
    the reference protocol, write per-task CSVs."""
    if args.TRAINED_MODEL is not None and not args.use_fresh_param_init:
        config, params, _, _ = load_checkpoint(args.TRAINED_MODEL)
    else:
        if default_config is None:
            raise ValueError("need TRAINED_MODEL or a default config for fresh init")
        config = default_config
        params = None
        if init_params_fn is not None:
            spec = EpisodeSpec(support_size=args.train_sizes[0], query_size=args.query_budget)
            probe_task = _first_task(dataset, DataFold.TEST)
            sampler = StratifiedTaskSampler(
                args.train_sizes[0], test_size_or_ratio=args.query_budget, allow_smaller_test=True
            )
            sample = sampler.sample(probe_task, seed=args.seed)
            probe = build_episode(sample, spec, regression=regression)
            params = init_params_fn(config, jax.random.PRNGKey(args.seed), probe)

    predict = make_predict_fn(kind, config, regression)
    evaluator = bind_evaluator(predict, params, regression)
    results = eval_model(
        evaluator,
        dataset,
        support_sizes=args.train_sizes,
        num_samples=args.num_runs,
        test_size_or_ratio=args.test_size,
        out_dir=out_dir,
        seed=args.seed,
        filter_numeric_labels=regression,
        query_budget=args.query_budget,
        episode_transform=episode_transform_for(config, args),
        wire_budget=192,  # predict fns decompress on device
        skip_existing=bool(getattr(args, "reuse_run_dir", None)),
    )
    _log_aggregate(results, regression)
    return results


def run_episodic_walltime(
    kind: str,
    args: argparse.Namespace,
    out_dir: str,
    dataset: FSMolDataset,
    regression: bool = False,
):
    """Per-episode adaptation walltime (reference *_walltime.py:100-115):
    time test_model_fn per task sample, write a CSV of seconds. The first
    (compile) episode is reported separately from steady-state."""
    import csv
    import os

    config, params, _, _ = load_checkpoint(args.TRAINED_MODEL)
    predict = make_predict_fn(kind, config, regression)
    evaluator = bind_evaluator(predict, params, regression)
    transform = episode_transform_for(config, args)

    rows = []
    for task in dataset.get_task_reading_iterable(DataFold.TEST):
        for train_size in args.train_sizes:
            sampler = StratifiedTaskSampler(
                train_size_or_ratio=train_size,
                test_size_or_ratio=args.test_size,
                allow_smaller_test=True,
            )
            for run_idx in range(args.num_runs):
                try:
                    sample = sampler.sample(task, seed=args.seed + run_idx)
                except (SamplingException, ValueError):
                    continue
                spec = EpisodeSpec(support_size=train_size, query_size=args.query_budget)
                n = min(len(sample.test_samples), spec.query_size)
                episode = build_episode(
                    dataclasses.replace(sample, test_samples=sample.test_samples[:n]),
                    spec,
                    regression=regression,
                )
                if transform is not None:
                    episode = transform(episode)
                t0 = time.perf_counter()
                preds, _ = evaluator(episode, args.seed + run_idx)
                np.asarray(preds)
                rows.append(
                    {"task": task.name, "train_size": train_size, "run": run_idx,
                     "walltime_s": time.perf_counter() - t0}
                )
    path = os.path.join(out_dir, f"{kind}_walltimes.csv")
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["task", "train_size", "run", "walltime_s"])
        writer.writeheader()
        writer.writerows(rows)
    steady = [r["walltime_s"] for r in rows[1:]] or [r["walltime_s"] for r in rows]
    logger.info(
        "walltime: %d episodes, first (incl. compile) %.3fs, steady median %.4fs",
        len(rows), rows[0]["walltime_s"] if rows else float("nan"), float(np.median(steady)),
    )
    return rows


def _first_task(dataset: FSMolDataset, fold: DataFold):
    for task in dataset.get_task_reading_iterable(fold):
        return task
    raise ValueError(f"no tasks in fold {fold}")


def _log_aggregate(results, regression: bool) -> None:
    scores = []
    for task_results in results.values():
        for r in task_results:
            scores.append(r.r2 if regression else r.avg_precision - r.fraction_pos_test)
    if scores:
        name = "R2" if regression else "delta AUPRC"
        logger.info("mean %s over %d episodes: %.4f", name, len(scores), float(np.mean(scores)))
