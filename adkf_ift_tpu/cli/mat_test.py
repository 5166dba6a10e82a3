"""MAT per-task fine-tune evaluation — the reference's mat_test.py
(models/mat.py:29-100 over the generic finetune loop). Operates on dense
molecule batches; optionally starts from a converted pretrained
checkpoint instead of fresh parameters."""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import jax
import numpy as np

from adkf_ift_tpu.cli.cli_utils import add_eval_cli_args, set_up_test_run
from adkf_ift_tpu.data.dataset import DataFold
from adkf_ift_tpu.data.mat import pack_dense_molecules
from adkf_ift_tpu.data.samplers import SamplingException, StratifiedTaskSampler
from adkf_ift_tpu.models import mat
from adkf_ift_tpu.train.evaluation import TaskSampleEvalResults, write_csv_summary
from adkf_ift_tpu.utils.checkpoints import load_checkpoint
from adkf_ift_tpu.utils.metrics import compute_binary_task_metrics

logger = logging.getLogger(__name__)


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Test the MAT baseline by per-task fine-tuning.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_eval_cli_args(parser)
    parser.add_argument("--trained-model", type=str, default=None,
                        help="Optional checkpoint dir (fresh init otherwise).")
    parser.add_argument(
        "--pretrained-weights", type=str, default=None,
        help="Published MAT .pth checkpoint: fine-tune from the pretrained "
        "artifact instead of fresh parameters (the reference's default, "
        "fs_mol/models/mat.py:29-100). Requires RDKit for the published "
        "featurization (featurize_smiles_mat).",
    )
    parser.add_argument("--max-atoms", type=int, default=64)
    parser.add_argument("--query-budget", type=int, default=256)
    parser.add_argument("--finetune-steps", type=int, default=60)
    return parser.parse_args(argv)


def _pretrained_setup(args):
    """(config, params, pack_fn) for the published-checkpoint path: the
    pretrained architecture + imported tensors + the published 28-dim
    dummy-node featurization computed from each sample's SMILES."""
    from adkf_ift_tpu.data.mat import featurize_smiles_mat, pack_dense_mat_features

    config = mat.pretrained_mat_config(finetune_steps=args.finetune_steps)
    feat_cache = {}

    def pack(samples, num_graphs, max_atoms):
        mols, labels = [], []
        for s in samples:
            if s.smiles not in feat_cache:
                feat_cache[s.smiles] = featurize_smiles_mat(s.smiles)
            mols.append(feat_cache[s.smiles])
            labels.append(1.0 if s.bool_label else 0.0)
        return pack_dense_mat_features(mols, labels, num_graphs, max_atoms)

    return config, pack


def main(argv=None):
    args = parse_command_line(argv)
    out_dir, dataset = set_up_test_run("MATModel", args)

    pack_fn = pack_dense_molecules
    pretrained_src = None
    if args.pretrained_weights:
        config, pack_fn = _pretrained_setup(args)
        params = None
        pretrained_src = args.pretrained_weights
    elif args.trained_model:
        config, params, _, _ = load_checkpoint(args.trained_model)
    else:
        config = mat.MATConfig(finetune_steps=args.finetune_steps)
        params = None

    predict = jax.jit(lambda p, s, q: mat.episode_predict(config, p, s, q))

    skip_existing = bool(getattr(args, "reuse_run_dir", None))
    for task in dataset.get_task_reading_iterable(DataFold.TEST):
        csv_path = os.path.join(out_dir, f"{task.name}_eval_results.csv")
        if skip_existing and os.path.exists(csv_path) and os.path.getsize(csv_path) > 0:
            logger.info("resume: %s already evaluated, skipping", task.name)
            continue
        results = []
        for train_size in args.train_sizes:
            sampler = StratifiedTaskSampler(
                train_size_or_ratio=train_size,
                test_size_or_ratio=args.test_size,
                allow_smaller_test=True,
            )
            for run_idx in range(args.num_runs):
                seed = args.seed + run_idx
                try:
                    sample = sampler.sample(task, seed=seed)
                except (SamplingException, ValueError):
                    continue
                support = pack_fn(
                    sample.train_samples, train_size, args.max_atoms
                )
                if params is None:
                    params = mat.init_params(config, jax.random.PRNGKey(args.seed), support)
                    if pretrained_src is not None:
                        params = mat.load_pretrained_torch_weights(
                            config, params, pretrained_src
                        )
                        logger.info("loaded pretrained MAT tensors from %s", pretrained_src)
                preds, labels = [], []
                test = sample.test_samples
                for start in range(0, len(test), args.query_budget):
                    chunk = test[start : start + args.query_budget]
                    query = pack_fn(chunk, args.query_budget, args.max_atoms)
                    probs = np.asarray(predict(params, support, query))
                    preds.append(probs[: len(chunk)])
                    labels.append([1.0 if s.bool_label else 0.0 for s in chunk])
                metrics = compute_binary_task_metrics(
                    np.concatenate(preds), np.concatenate([np.asarray(l) for l in labels])
                )
                results.append(
                    TaskSampleEvalResults(
                        task_name=task.name, seed=seed, num_train=train_size,
                        num_test=len(test),
                        fraction_pos_train=sample.train_pos_label_ratio,
                        fraction_pos_test=sample.test_pos_label_ratio,
                        **dataclasses.asdict(metrics),
                    )
                )
        write_csv_summary(csv_path, results)
        if results:
            deltas = [r.avg_precision - r.fraction_pos_test for r in results]
            logger.info("%s: mean delta AUPRC %.4f", task.name, float(np.mean(deltas)))


if __name__ == "__main__":
    main()
