"""End-to-end Bayesian optimization with a META-TRAINED encoder
(VERDICT r2 weak #7 / next-step #8): load the zoo's ADKF-IFT checkpoint,
embed a large synthetic teacher-GNN design task with the frozen encoder
(the reference's *ModelFeatureExtractor path, bayes_opt/bo_utils.py:475-698),
run the batched-EI loop (bo_utils.py:342-397) up to a 512-point support
buffer, and compare the found-optimum trajectory against random search
and raw-fingerprint features. Also records the frozen-encoder predictive
R² (predictive_performance/adkt.py:1-60) and per-iteration walltime on
the tunnel-attached v5e.

Usage: python benchmarks/bo_e2e.py [--ckpt .zoo/train/ADKF-IFT/**/best_validation]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="ADKF checkpoint dir (default: newest zoo ADKF-IFT best_validation)")
    ap.add_argument("--num-molecules", type=int, default=2048)
    ap.add_argument("--num-init", type=int, default=16)
    ap.add_argument("--query-batch", type=int, default=16)
    ap.add_argument("--num-iters", type=int, default=31)  # 16 + 16*31 = 512
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "docs", "BO_E2E.md"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    from adkf_ift_tpu.bo.bo_utils import BOGPConfig, min_so_far, run_gp_ei_bo
    from adkf_ift_tpu.bo.predictive import embed_task, predictive_r2
    from adkf_ift_tpu.utils.checkpoints import load_checkpoint
    from adkf_ift_tpu.utils.synthetic import make_teacher_task

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    ckpt = args.ckpt
    if ckpt is None:
        cands = sorted(glob.glob(os.path.join(
            repo, ".zoo", "train", "ADKF-IFT", "FSMol_train_*", "best_validation")))
        if not cands:
            raise SystemExit("no zoo ADKF-IFT checkpoint found; pass --ckpt")
        ckpt = cands[-1]
    config, params, _, _ = load_checkpoint(ckpt)
    print(f"encoder checkpoint: {ckpt}", flush=True)

    # Design task: one large teacher-GNN assay; minimize y = -signal
    # (lognormal numeric labels; log puts it back on the signal scale).
    task = make_teacher_task("DESIGN", num_samples=args.num_molecules, seed=777)
    y = -np.log(np.asarray([s.numeric_label for s in task.samples], np.float64))

    t0 = time.perf_counter()
    reps = embed_task("adkf", config, params, task)
    embed_s = time.perf_counter() - t0
    print(f"embedded {len(y)} molecules in {embed_s:.1f}s -> {reps.shape}", flush=True)
    fps = np.stack([s.get_fingerprint() for s in task.samples]).astype(np.float32)

    arms = {"adkf_reps": reps, "raw_fp": fps}
    results = {}
    y_std = (y - y.mean()) / y.std()

    for name, x in arms.items():
        best_curves, iter_times = [], []
        for seed in range(args.seeds):
            t0 = time.perf_counter()
            record = run_gp_ei_bo(
                x, y, num_init_points=args.num_init,
                query_batch_size=args.query_batch, num_bo_iters=args.num_iters,
                budget=args.budget, seed=seed,
            )
            dt = time.perf_counter() - t0
            iter_times.append(dt / args.num_iters)
            best_curves.append(min_so_far(y_std[record])[-1])
        results[name] = dict(
            best_std_y=float(np.mean(best_curves)),
            best_std_y_sem=float(np.std(best_curves) / np.sqrt(len(best_curves))),
            s_per_bo_iter=float(np.median(iter_times)),
        )
        print(f"{name}: best standardized y {results[name]['best_std_y']:.3f} "
              f"± {results[name]['best_std_y_sem']:.3f}, "
              f"{results[name]['s_per_bo_iter']:.2f}s/iter", flush=True)

    # Random-search baseline: same query counts, uniform.
    rng_bests = []
    n_queries = args.num_init + args.query_batch * args.num_iters
    for seed in range(64):
        r = np.random.RandomState(seed)
        rng_bests.append(y_std[r.choice(len(y), size=n_queries, replace=False)].min())
    results["random_search"] = dict(
        best_std_y=float(np.mean(rng_bests)),
        best_std_y_sem=float(np.std(rng_bests) / np.sqrt(len(rng_bests))),
        s_per_bo_iter=0.0,
    )
    oracle = float(y_std.min())

    # Frozen-encoder predictive R² (predictive_performance protocol).
    r2_adkf, _ = predictive_r2(reps, y, num_train=64, num_repeats=5)
    r2_fp, _ = predictive_r2(fps, y, num_train=64, num_repeats=5)

    lines = [
        "# BO end-to-end with a meta-trained encoder\n",
        f"Checkpoint: `{os.path.relpath(ckpt, repo)}` (zoo ADKF-IFT arm).",
        f"Design task: {args.num_molecules} teacher-GNN molecules, minimize",
        "y = −teacher signal. EI loop: "
        f"{args.num_init} init + {args.query_batch}×{args.num_iters} queried",
        f"into a padded {args.budget}-point support buffer (the BO-regime",
        "support size), GP refit every iteration on the v5e via the",
        "compiled padded fit (bo/bo_utils.py). Generated by",
        "`benchmarks/bo_e2e.py`.\n",
        "| Arm | best standardized y (lower better) | SEM | s / BO iter |",
        "|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['best_std_y']:.3f} | {r['best_std_y_sem']:.3f} "
            f"| {r['s_per_bo_iter']:.2f} |"
        )
    lines += [
        f"| oracle (dataset min) | {oracle:.3f} | — | — |",
        "",
        f"Frozen-encoder predictive R² (64-train GP, 5 splits): "
        f"**{r2_adkf:.3f}** with ADKF representations vs {r2_fp:.3f} on raw",
        f"fingerprints (noise in this family). Embedding walltime: "
        f"{embed_s:.1f}s for {args.num_molecules} molecules.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"results": results, "oracle": oracle,
                      "r2_adkf": r2_adkf, "r2_fp": r2_fp}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
