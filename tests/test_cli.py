"""CLI smoke tests: each entry point runs end-to-end on a tiny synthetic
dataset directory (train -> checkpoint -> test -> CSVs)."""

import glob
import json
import os

import numpy as np
import pytest

from adkf_ift_tpu.utils.synthetic import make_dataset_dir

TINY_ENCODER_FLAGS = [
    "--num-gnn-layers", "2", "--gnn-hidden-dim", "32", "--num-heads", "2",
    "--per-head-dim", "8", "--intermediate-dim", "64", "--readout-num-heads", "2",
    "--readout-head-dim", "8", "--readout-dim", "16", "--fc-out-dim", "32",
    "--fc-hidden-dim", "32",
]
TINY_TRAIN_FLAGS = [
    "--support_set_size", "16", "--query_set_size", "32", "--tasks_per_batch", "2",
    "--num_train_steps", "3", "--validate-every", "2", "--task-chunk", "2",
    "--validation-support-set-sizes", "[16]", "--validation-num-samples", "1",
    "--validation-query-set-size", "32", "--num-reader-workers", "0",
]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fsmol")
    return make_dataset_dir(str(root), num_train=3, num_valid=1, num_test=1, samples_per_task=96)


def _latest_ckpt(save_dir, which="fully_trained"):
    runs = sorted(glob.glob(os.path.join(save_dir, "FSMol_train_*")))
    assert runs, f"no training run dirs in {save_dir}"
    ckpt = os.path.join(runs[-1], which)
    assert os.path.isdir(ckpt)
    return ckpt


def _assert_eval_csvs(save_dir):
    runs = sorted(glob.glob(os.path.join(save_dir, "FSMol_eval_*")))
    csvs = glob.glob(os.path.join(runs[-1], "*_eval_results.csv"))
    assert csvs, "no per-task eval CSVs written"
    return csvs


def test_dkt_train_then_test(data_root, tmp_path):
    from adkf_ift_tpu.cli import dkt_test, dkt_train

    save = str(tmp_path / "out")
    dkt_train.main([data_root, "--save-dir", save, "--lr", "1e-3"]
                   + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS)
    ckpt = _latest_ckpt(save)
    dkt_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                   "--train-sizes", "[16]", "--query-budget", "32"])
    _assert_eval_csvs(save)


def test_adkf_train_then_test(data_root, tmp_path):
    from adkf_ift_tpu.cli import adkf_test, adkf_train

    save = str(tmp_path / "out")
    adkf_train.main([data_root, "--save-dir", save, "--inner-max-iters", "8"]
                    + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS)
    ckpt = _latest_ckpt(save)
    adkf_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                    "--train-sizes", "[16]", "--query-budget", "32"])
    _assert_eval_csvs(save)


def test_adkf_train_then_test_pallas_dense(data_root, tmp_path):
    """ADKF end-to-end with --mp-impl pallas on the dense-block layout
    (interpreter mode on CPU): train -> checkpoint -> test; the
    checkpoint config selects the dense transform at test time."""
    from adkf_ift_tpu.cli import adkf_test, adkf_train

    save = str(tmp_path / "out")
    # Interpreter-mode Pallas is slow: 1 step, no validation eval.
    adkf_train.main(
        [data_root, "--save-dir", save, "--inner-max-iters", "8",
         "--mp-impl", "pallas", "--pallas-interpret", "--no-block-remat",
         "--dense-k-per-type", "8,6,6"]
        + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS
        + ["--num_train_steps", "1", "--validate-every", "99"]
    )
    ckpt = _latest_ckpt(save)
    adkf_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                    "--train-sizes", "[16]", "--query-budget", "32",
                    "--dense-k-per-type", "8,6,6"])
    _assert_eval_csvs(save)


def test_gpst_test_cli(data_root, tmp_path):
    from adkf_ift_tpu.cli import gpst_test

    save = str(tmp_path / "out")
    gpst_test.main([data_root, "--save-dir", save, "--num-runs", "1",
                    "--train-sizes", "[16]", "--query-budget", "32"])
    _assert_eval_csvs(save)


def test_baseline_test_cli(data_root, tmp_path):
    from adkf_ift_tpu.cli import baseline_test

    save = str(tmp_path / "out")
    baseline_test.main(["--model", "kNN", data_root, "--save-dir", save,
                        "--num-runs", "1", "--train-sizes", "[16]"])
    _assert_eval_csvs(save)


def test_multitask_train_then_test(data_root, tmp_path):
    from adkf_ift_tpu.cli import multitask_test, multitask_train

    save = str(tmp_path / "out")
    multitask_train.main([data_root, "--save-dir", save, "--batch_size", "32",
                          "--num_train_steps", "3"] + TINY_ENCODER_FLAGS)
    ckpt = _latest_ckpt(save)
    multitask_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                         "--train-sizes", "[16]", "--query-budget", "32"])
    _assert_eval_csvs(save)


def test_compute_stats_cli(data_root, tmp_path):
    from adkf_ift_tpu.cli import compute_stats

    out = str(tmp_path / "stats.json")
    compute_stats.main([data_root, out])
    with open(out) as f:
        stats = json.load(f)
    assert stats["train"]["num_tasks"] == 3
    assert stats["test"]["num_tasks"] == 1
    assert stats["num_unique_molecules"] > 0


def test_dkt_train_resume(data_root, tmp_path):
    """Mid-run resume: continue from fully_trained and produce a later
    fully_trained checkpoint (capability the reference lacks)."""
    import json

    from adkf_ift_tpu.cli import dkt_train

    save = str(tmp_path / "out")
    dkt_train.main([data_root, "--save-dir", save, "--lr", "1e-3"]
                   + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS)
    ckpt = _latest_ckpt(save)
    with open(os.path.join(ckpt, "meta.json")) as f:
        step0 = json.load(f)["step"]

    # Strip the fixture's --num_train_steps so our later value wins.
    tail = list(TINY_TRAIN_FLAGS)
    i = tail.index("--num_train_steps")
    del tail[i : i + 2]
    save2 = str(tmp_path / "out2")
    dkt_train.main([data_root, "--save-dir", save2, "--lr", "1e-3",
                    "--resume-from", ckpt, "--num_train_steps", str(step0 + 2)]
                   + TINY_ENCODER_FLAGS + tail)
    ckpt2 = _latest_ckpt(save2)
    with open(os.path.join(ckpt2, "meta.json")) as f:
        assert json.load(f)["step"] == step0 + 2


def test_protonet_train_then_test(data_root, tmp_path):
    """Mirrors the zoo_bench PN arm's flag set (incl. --features gnn+fc)."""
    from adkf_ift_tpu.cli import protonet_test, protonet_train

    save = str(tmp_path / "out")
    protonet_train.main([data_root, "--save-dir", save, "--lr", "1e-3",
                         "--features", "gnn+fc"]
                        + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS)
    ckpt = _latest_ckpt(save)
    protonet_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                        "--train-sizes", "[16]", "--query-budget", "32"])
    _assert_eval_csvs(save)


def test_cnp_train_then_test(data_root, tmp_path):
    from adkf_ift_tpu.cli import cnp_test, cnp_train

    save = str(tmp_path / "out")
    cnp_train.main([data_root, "--save-dir", save, "--lr", "1e-3",
                    "--features", "gnn+fc"]
                   + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS)
    ckpt = _latest_ckpt(save)
    cnp_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                   "--train-sizes", "[16]", "--query-budget", "32"])
    _assert_eval_csvs(save)


def test_maml_train_then_test(data_root, tmp_path):
    from adkf_ift_tpu.cli import maml_test, maml_train

    save = str(tmp_path / "out")
    maml_train.main([data_root, "--save-dir", save, "--lr", "1e-3",
                     "--features", "gnn+fc"]
                    + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS)
    ckpt = _latest_ckpt(save)
    maml_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                    "--train-sizes", "[16]", "--query-budget", "32"])
    _assert_eval_csvs(save)


def test_adkf_vgp_train_then_test(data_root, tmp_path):
    from adkf_ift_tpu.cli import adkf_vgp_test, adkf_vgp_train

    save = str(tmp_path / "out")
    adkf_vgp_train.main([data_root, "--save-dir", save, "--lr", "1e-3",
                         "--features", "gnn+fc", "--inner-max-iters", "4"]
                        + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS)
    ckpt = _latest_ckpt(save)
    adkf_vgp_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                        "--train-sizes", "[16]", "--query-budget", "32"])
    _assert_eval_csvs(save)


def test_dkt_test_time_adaptation_cli(data_root, tmp_path):
    """DKT+ (per-episode GP refit at test time) through the CLI flag."""
    from adkf_ift_tpu.cli import dkt_test, dkt_train

    save = str(tmp_path / "out")
    dkt_train.main([data_root, "--save-dir", save, "--lr", "1e-3"]
                   + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS)
    ckpt = _latest_ckpt(save)
    dkt_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                   "--train-sizes", "[16]", "--query-budget", "32",
                   "--test-time-adaptation"])
    _assert_eval_csvs(save)


def test_mat_test_cli(data_root, tmp_path):
    """MAT from-scratch per-task finetune eval (the zoo MAT arm)."""
    from adkf_ift_tpu.cli import mat_test

    save = str(tmp_path / "out")
    mat_test.main([data_root, "--save-dir", save, "--num-runs", "1",
                   "--train-sizes", "[16]", "--query-budget", "32",
                   "--finetune-steps", "2", "--max-atoms", "48"])
    _assert_eval_csvs(save)


def test_dkl_test_cli(data_root, tmp_path):
    """DKL from-scratch per-task fit (the zoo DKL arm)."""
    from adkf_ift_tpu.cli import dkl_test

    save = str(tmp_path / "out")
    dkl_test.main([data_root, "--save-dir", save, "--num-runs", "1",
                   "--train-sizes", "[16]", "--query-budget", "32",
                   "--num-train-steps", "2"] + TINY_ENCODER_FLAGS)
    _assert_eval_csvs(save)


def test_multitask_from_scratch_cli(data_root, tmp_path):
    """GNN-ST: single-task model trained per support set from random init."""
    from adkf_ift_tpu.cli import multitask_test

    save = str(tmp_path / "out")
    multitask_test.main([data_root, "--save-dir", save, "--num-runs", "1",
                         "--train-sizes", "[16]", "--query-budget", "32",
                         "--from-scratch"])
    _assert_eval_csvs(save)


def test_par_train_then_test(data_root, tmp_path):
    from adkf_ift_tpu.cli import par_test, par_train

    save = str(tmp_path / "out")
    par_train.main([data_root, "--save-dir", save, "--emb-dim", "16",
                    "--map-dim", "8", "--rel-hidden-dim", "8"]
                   + TINY_ENCODER_FLAGS + TINY_TRAIN_FLAGS)
    ckpt = _latest_ckpt(save)
    par_test.main([ckpt, data_root, "--save-dir", save, "--num-runs", "1",
                   "--train-sizes", "[16]", "--query-budget", "32"])
    _assert_eval_csvs(save)
