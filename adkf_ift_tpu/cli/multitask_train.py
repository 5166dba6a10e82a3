"""Pretrain the multitask GNN over all train tasks — the reference's
multitask_train.py (GNNMultitaskModel + per-task output heads)."""

from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np
import optax

from adkf_ift_tpu.cli.cli_utils import add_train_cli_args, set_up_train_run
from adkf_ift_tpu.cli.encoder_args import add_encoder_cli_args, encoder_config_from_args
from adkf_ift_tpu.data.dataset import DataFold
from adkf_ift_tpu.data.multitask import MultitaskTaskSampleBatchIterable
from adkf_ift_tpu.models import gnn_multitask
from adkf_ift_tpu.utils.checkpoints import save_checkpoint
from adkf_ift_tpu.utils.metric_logger import MetricLogger

logger = logging.getLogger(__name__)


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Pretrain a multitask GNN on molecules (reference multitask_train.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_train_cli_args(parser)
    add_encoder_cli_args(parser)
    parser.add_argument("--batch_size", type=int, default=128, help="Graphs per batch.")
    parser.add_argument("--num_train_steps", type=int, default=10000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--clip_value", type=float, default=1.0)
    parser.add_argument("--task-chunk-size", type=int, default=8)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_train_run("GNNMultitask", args)

    iterable = MultitaskTaskSampleBatchIterable(
        dataset,
        DataFold.TRAIN,
        max_num_graphs=args.batch_size,
        task_chunk_size=args.task_chunk_size,
        seed=args.seed,
    )
    config = gnn_multitask.GNNMultitaskConfig(
        graph_config=encoder_config_from_args(args).graph_config,
        num_tasks=iterable.num_tasks,
    )
    stream = iter(iterable)
    probe = next(stream)
    params = gnn_multitask.init_params(config, jax.random.PRNGKey(args.seed), probe.graphs)
    optimizer = optax.chain(
        optax.clip_by_global_norm(args.clip_value), optax.adam(args.lr)
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: gnn_multitask.batch_loss(
                config, p, batch.graphs, batch.sample_to_task_id, batch.labels
            )
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    metrics = MetricLogger(logger.info, window_size=50)
    for i in range(1, args.num_train_steps + 1):
        batch = probe if i == 1 else next(stream)
        params, opt_state, loss = step(params, opt_state, batch)
        metrics.log_metrics(loss=float(loss))

    save_checkpoint(os.path.join(out_dir, "fully_trained"), config, params, step=args.num_train_steps)
    logger.info("saved multitask model to %s", os.path.join(out_dir, "fully_trained"))


if __name__ == "__main__":
    main()
