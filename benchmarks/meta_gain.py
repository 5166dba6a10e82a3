"""Meta-gain experiment: does ADKF-IFT meta-training beat a fresh-init
encoder on held-out synthetic tasks?

The synthetic generator (utils/synthetic.py) gives every task the same
nonlinear featurization (tanh of a fixed projection of fingerprint bits)
with task-specific weights — the structure meta-training is supposed to
extract. This script trains the ADKF outer loop on a pool of train
tasks, then evaluates few-shot ΔAUPRC on held-out test tasks with
(a) the meta-trained encoder and (b) a fresh-init control (the
reference's --use-fresh-param-init ablation, adaptive_dkt_test.py:44-48).

Writes docs/METAGAIN.md with the result table.

Usage: python benchmarks/meta_gain.py [--steps 600] [--train-tasks 24]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode, stack_episodes
from adkf_ift_tpu.gp import LBFGSConfig
from adkf_ift_tpu.models import adkf
from adkf_ift_tpu.train.evaluators import make_predict_fn
from adkf_ift_tpu.train.meta import init_train_state, make_meta_train_step, make_optimizer
from adkf_ift_tpu.utils.metrics import compute_binary_task_metrics
from adkf_ift_tpu.utils.synthetic import make_task


def evaluate(predict, outer_loss, params, test_tasks, spec, num_samples=8):
    """(mean ΔAUPRC, SEM, mean per-query-point predictive NLL) over
    held-out episodes. The NLL is the quantity the outer loop optimizes
    (negative log predictive probability of the query under the fitted
    GP posterior, adaptive_dkt.py:183-189)."""
    sampler = StratifiedTaskSampler(spec.support_size, test_size_or_ratio=spec.query_size)
    deltas, nlls = [], []
    for task in test_tasks:
        for run in range(num_samples):
            try:
                ep = build_episode(sampler.sample(task, seed=5000 + run), spec)
            except Exception:
                continue
            probs = predict(params, ep)
            qmask = np.asarray(ep.query.graph_mask) > 0
            y = (np.asarray(ep.query_labels)[qmask] > 0).astype(np.float64)
            m = compute_binary_task_metrics(probs[qmask], y)
            deltas.append(m.avg_precision - y.mean())
            nlls.append(float(np.asarray(outer_loss(params, ep))) / qmask.sum())
    return (
        float(np.mean(deltas)),
        float(np.std(deltas) / np.sqrt(len(deltas))),
        float(np.mean(nlls)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--train-tasks", type=int, default=24)
    ap.add_argument("--test-tasks", type=int, default=8)
    ap.add_argument("--tasks-per-batch", type=int, default=8)
    ap.add_argument("--support", type=int, default=16)
    ap.add_argument("--query", type=int, default=64)
    ap.add_argument("--samples-per-task", type=int, default=160)
    args = ap.parse_args()

    train_tasks = [
        make_task(f"TR{i}", num_samples=args.samples_per_task, seed=100 + i)
        for i in range(args.train_tasks)
    ]
    test_tasks = [
        make_task(f"TE{i}", num_samples=args.samples_per_task, seed=9000 + i)
        for i in range(args.test_tasks)
    ]

    spec = EpisodeSpec(
        support_size=args.support, query_size=args.query,
        nodes_per_graph=48, edges_per_graph=(80, 32, 16),
    )
    config = adkf.ADKFModelConfig(
        inner_optimizer=LBFGSConfig(max_iters=48, history=8, method="newton"),
    )
    sampler = StratifiedTaskSampler(args.support, test_size_or_ratio=args.query)

    probe = build_episode(sampler.sample(train_tasks[0], seed=0), spec)
    fresh = adkf.init_encoder_params(config, jax.random.PRNGKey(0), probe.support)
    # The jitted train step donates its state buffers; keep a host copy
    # of the fresh init for the control evaluation.
    fresh = jax.tree.map(np.asarray, fresh)

    optimizer = make_optimizer(1e-4, clip_value=1.0)
    state = init_train_state(fresh, optimizer)
    step_fn = make_meta_train_step(
        lambda p, e: adkf.episode_outer_loss(config, p, e),
        optimizer,
        task_chunk=1,
        remat=False,
        batch_loss_fn=lambda p, e: adkf.batch_outer_loss(config, p, e),
    )

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        picks = rng.choice(len(train_tasks), size=args.tasks_per_batch, replace=False)
        episodes = []
        for j, ti in enumerate(picks):
            episodes.append(
                build_episode(sampler.sample(train_tasks[ti], seed=step * 31 + j), spec)
            )
        state, losses = step_fn(state, jax.device_put(stack_episodes(episodes)))
        if step % 50 == 0:
            loss = float(np.mean(np.asarray(losses))) / args.query
            print(f"step {step}: loss {loss:.4f} ({time.perf_counter()-t0:.0f}s)", flush=True)

    predict = make_predict_fn("adkf", config)
    outer_loss = jax.jit(lambda p, e: adkf.episode_outer_loss(config, p, e))
    d_fresh, se_fresh, nll_fresh = evaluate(predict, outer_loss, fresh, test_tasks, spec)
    d_trained, se_trained, nll_trained = evaluate(
        predict, outer_loss, state.params, test_tasks, spec
    )
    print(f"fresh-init:   ΔAUPRC {d_fresh:.4f} ± {se_fresh:.4f}, query NLL {nll_fresh:.4f}")
    print(f"meta-trained: ΔAUPRC {d_trained:.4f} ± {se_trained:.4f}, query NLL {nll_trained:.4f}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "docs", "METAGAIN.md")
    with open(out, "w") as f:
        f.write(
            "# Synthetic meta-gain (ADKF-IFT)\n\n"
            "Meta-trained vs fresh-init encoder on held-out synthetic tasks\n"
            "(shared nonlinear featurization, task-specific weights; the\n"
            "reference's --use-fresh-param-init control). Generated by\n"
            "`benchmarks/meta_gain.py` on the tunnel-attached TPU v5e.\n\n"
            f"- config: {args.steps} steps x {args.tasks_per_batch} tasks/batch, "
            f"support {args.support}, query {args.query}, "
            f"{args.train_tasks} train / {args.test_tasks} test tasks\n"
            f"- fresh-init:   ΔAUPRC **{d_fresh:.4f} ± {se_fresh:.4f}** (SEM), "
            f"query predictive NLL **{nll_fresh:.4f}**\n"
            f"- meta-trained: ΔAUPRC **{d_trained:.4f} ± {se_trained:.4f}** (SEM), "
            f"query predictive NLL **{nll_trained:.4f}**\n\n"
            "The query predictive NLL is the outer objective itself\n"
            "(negative log predictive probability under the per-task fitted\n"
            "GP posterior); the synthetic labels carry heavy flip noise, so\n"
            "rank metrics saturate while the calibrated NLL shows the\n"
            "meta-learned featurization directly.\n"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
