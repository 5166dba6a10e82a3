"""MoleculeNet ADKF-IFT entry point — the reference's
MoleculeNet/main_adkf.py + adkf_parser.py: meta-train on one MoleculeNet
dataset's train tasks, report AUROC on the test tasks. Pass
--pre-adkf-ift to skip meta-training (frozen encoder + per-task GP
refit, adkf_trainer.py:350-456)."""

from __future__ import annotations

import argparse
import logging
import os

import jax
import numpy as np

from adkf_ift_tpu.cli.cli_utils import set_seed
from adkf_ift_tpu.gp import LBFGSConfig
from adkf_ift_tpu.moleculenet import MolNetADKFConfig, MolNetEncoderConfig
from adkf_ift_tpu.moleculenet import trainer as mt
from adkf_ift_tpu.moleculenet.data import load_moleculenet_csv, sample_episode
from adkf_ift_tpu.moleculenet.encoder import load_pretrained_torch_weights
from adkf_ift_tpu.train.meta import init_train_state, make_meta_train_step, make_optimizer
from adkf_ift_tpu.utils.checkpoints import save_checkpoint
from adkf_ift_tpu.utils.logging import set_up_logging

logger = logging.getLogger(__name__)


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="ADKF-IFT on MoleculeNet (reference main_adkf.py).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("CSV", type=str, help="Raw MoleculeNet csv (tox21.csv style).")
    parser.add_argument("--test-tasks", type=int, default=3,
                        help="Last N label columns become test tasks (PAR protocol).")
    parser.add_argument("--n-shot", type=int, default=10)
    parser.add_argument("--query-size", type=int, default=32)
    parser.add_argument("--enc-gnn", type=str, default="gin", choices=["gin", "gcn", "graphsage"])
    parser.add_argument("--enc-layer", type=int, default=5)
    parser.add_argument("--emb-dim", type=int, default=300)
    parser.add_argument("--pretrained-weight-path", type=str, default=None)
    parser.add_argument("--meta-lr", type=float, default=1e-4)
    parser.add_argument("--epochs", type=int, default=200, help="Outer steps.")
    parser.add_argument("--tasks-per-batch", type=int, default=4)
    parser.add_argument("--eval-episodes", type=int, default=10)
    parser.add_argument("--update-step-test", type=int, default=0,
                        help="Test-time outer-loop adaptation steps on each "
                        "test task's support pool before the GP refit "
                        "(adkfift_trainer.py update_step_test).")
    parser.add_argument("--pre-adkf-ift", action="store_true",
                        help="No meta-training: frozen encoder + GP refit only.")
    parser.add_argument("--ignore-grad-correction", action="store_true")
    parser.add_argument("--save-dir", type=str, default="outputs/moleculenet")
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    set_seed(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    set_up_logging(os.path.join(args.save_dir, "train.log"))

    tasks = load_moleculenet_csv(args.CSV)
    train_tasks, test_tasks = tasks[: -args.test_tasks], tasks[-args.test_tasks :]
    logger.info("%d train tasks, %d test tasks", len(train_tasks), len(test_tasks))

    config = MolNetADKFConfig(
        encoder=MolNetEncoderConfig(
            gnn_type=args.enc_gnn, num_layers=args.enc_layer, emb_dim=args.emb_dim
        ),
        ignore_grad_correction=args.ignore_grad_correction,
        inner_optimizer=LBFGSConfig(max_iters=48),
    )

    probe = sample_episode(train_tasks[0], args.n_shot, args.query_size, seed=0)
    params = mt.init_encoder_params(config, jax.random.PRNGKey(args.seed), probe.support)
    if args.pretrained_weight_path:
        params = load_pretrained_torch_weights(params, args.pretrained_weight_path)
        logger.info("loaded pretrained encoder weights from %s", args.pretrained_weight_path)

    if not args.pre_adkf_ift:
        optimizer = make_optimizer(args.meta_lr, clip_value=1.0)
        step_fn = make_meta_train_step(
            lambda p, e: mt.episode_outer_loss(config, p, e), optimizer, task_chunk=2
        )
        state = init_train_state(params, optimizer)
        rng = np.random.RandomState(args.seed)
        from adkf_ift_tpu.data.episodes import stack_episodes

        for step in range(1, args.epochs + 1):
            chosen = rng.choice(len(train_tasks), size=args.tasks_per_batch)
            episodes = [
                sample_episode(train_tasks[t], args.n_shot, args.query_size, seed=int(rng.randint(1 << 31)))
                for t in chosen
            ]
            state, losses = step_fn(state, stack_episodes(episodes))
            if step % 20 == 0:
                logger.info("step %d: loss %.4f", step, float(np.mean(np.asarray(losses))))
        params = state.params
        save_checkpoint(os.path.join(args.save_dir, "fully_trained"), config, params)

    for task in test_tasks:
        task_params = params
        if args.update_step_test > 0:
            # Per-task test-time adaptation from the shared meta-trained
            # params (the reference restores the saved state per task).
            adapt_ep = sample_episode(task, args.n_shot, args.query_size, seed=10_000)
            task_params = mt.test_time_adapt(
                config, params, adapt_ep, num_steps=args.update_step_test, lr=args.meta_lr
            )
        episodes = [
            sample_episode(task, args.n_shot, args.query_size, seed=s)
            for s in range(args.eval_episodes)
        ]
        auroc, _ = mt.evaluate_task_auroc(config, task_params, episodes)
        logger.info("test task %s: AUROC %.4f over %d episodes", task.name, auroc, len(episodes))


if __name__ == "__main__":
    main()
