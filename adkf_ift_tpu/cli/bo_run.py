"""GP-EI Bayesian-optimization run over a design dataset — the CLI face
of the reference's bayes_opt notebooks (bayes_opt/{antibiotics,
covid_moonshot,dockstring,organic_photovoltaics}/*.ipynb)."""

from __future__ import annotations

import argparse
import csv
import logging
import os

import numpy as np

from adkf_ift_tpu.bo.bo_utils import BOGPConfig, min_so_far, run_gp_ei_bo
from adkf_ift_tpu.cli.cli_utils import set_seed
from adkf_ift_tpu.utils.logging import set_up_logging

logger = logging.getLogger(__name__)

LOADERS = {
    "antibiotics": "load_antibiotics_dataset",
    "covid": "load_covid_moonshot_dataset",
    "dockstring": "load_dockstring_dataset",
    "cep": "load_cep_dataset",
}


def parse_command_line(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Run GP-EI molecule-design BO on a public dataset.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("TASK", choices=sorted(LOADERS), help="Design task.")
    parser.add_argument("DATA_FILE", type=str, help="Task csv/xlsx file.")
    parser.add_argument(
        "--trained-model", type=str, default=None,
        help="Checkpoint dir of a meta-trained model whose frozen encoder "
        "embeds molecules; default uses raw fingerprints with a Tanimoto GP.",
    )
    parser.add_argument("--model-kind", type=str, default="adkf")
    parser.add_argument("--kernel-type", type=str, default=None, choices=[None, "matern", "tanimoto"])
    parser.add_argument("--num-init-points", type=int, default=10)
    parser.add_argument("--query-batch-size", type=int, default=5)
    parser.add_argument("--num-bo-iters", type=int, default=20)
    parser.add_argument("--maximize", action="store_true",
                        help="Negate labels (e.g. CEP PCE: higher is better).")
    parser.add_argument("--save-dir", type=str, default="outputs")
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    set_seed(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    set_up_logging(os.path.join(args.save_dir, "bo.log"))

    from adkf_ift_tpu.bo import loaders

    task = getattr(loaders, LOADERS[args.TASK])(args.DATA_FILE)
    y = np.asarray([s.numeric_label for s in task.samples], np.float64)
    if args.maximize:
        y = -y

    if args.trained_model is not None:
        from adkf_ift_tpu.bo.predictive import embed_task
        from adkf_ift_tpu.utils.checkpoints import load_checkpoint

        config, params, _, _ = load_checkpoint(args.trained_model)
        x = embed_task(args.model_kind, config, params, task)
        kernel = args.kernel_type or "matern"
    else:
        x = np.stack([np.asarray(s.get_fingerprint() > 0, np.float32) for s in task.samples])
        kernel = args.kernel_type or "tanimoto"

    record = run_gp_ei_bo(
        x, y,
        num_init_points=args.num_init_points,
        query_batch_size=args.query_batch_size,
        num_bo_iters=args.num_bo_iters,
        config=BOGPConfig(kernel_type=kernel),
        seed=args.seed,
    )
    best_trace = min_so_far(y[record])
    out_csv = os.path.join(args.save_dir, f"bo_{args.TASK}_record.csv")
    with open(out_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["step", "queried_index", "y", "best_so_far"])
        for i, (idx, best) in enumerate(zip(record, best_trace)):
            writer.writerow([i, idx, y[idx], best])
    logger.info("BO finished: best y %.4f, record in %s", best_trace[-1], out_csv)


if __name__ == "__main__":
    main()
