"""Diagnose ADKF-IFT hypergradient stability on the teacher-GNN family.

Round-2 observation (docs/METAGAIN.md runs): with identical episode
streams and inits, the first-order arm's outer loss falls monotonically
while the full-IFT arm's loss jumps (40 -> 98 between steps 300-400) and
its validation dAUPRC trails. The IFT correction is exact at a strict
local minimum (tests/test_gp_ift.py), so the suspects are (a) inner fits
stopping short of stationarity as the encoder sharpens, and (b) a
near-singular inner Hessian amplifying the H^{-1} solve
(gp/ift.py:_solve_hessian_system; the reference only asserts
invertibility, cauchy_hypergradient.py:66-75).

For a training trajectory this script logs, per probe episode:
  * stationarity ||grad L_in(theta*)||  (should be ~0)
  * eigenvalues of the inner Hessian (min/max; min<=0 => not a minimum)
  * norm of the IFT correction vs the direct (first-order) feature grad

Usage: python benchmarks/ift_stability.py [--steps 400] [--probe-every 25]
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
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode, stack_episodes
from adkf_ift_tpu.gp import LBFGSConfig
from adkf_ift_tpu.gp.fit import make_inner_loss
from adkf_ift_tpu.models import adkf
from adkf_ift_tpu.train.meta import init_train_state, make_meta_train_step, make_optimizer
from adkf_ift_tpu.utils.synthetic import make_teacher_task


def make_probe(config):
    """Jitted diagnostics for one episode at given encoder params."""
    from dataclasses import replace as dc_replace

    gp_cfg = config.gp_config

    def probe(params, episode):
        encoder = adkf.make_encoder(config)
        feats, _ = encoder.apply_pair(params, episode.support, episode.query)
        mask = episode.support.graph_mask
        labels = episode.support_labels
        _, ls_loc = adkf._gp_init(config, feats)
        theta = adkf.inner_fit(config, feats, labels, mask)
        inner = make_inner_loss(gp_cfg, feats, labels, mask, ls_loc)
        g_stat = jax.grad(inner)(theta)
        h = jax.jacfwd(jax.grad(inner))(theta)
        eig = jnp.linalg.eigvalsh(h)

        # Split the episode outer-loss feature gradient into direct +
        # IFT-correction parts by running the same loss with
        # first_order toggled.
        def outer(first_order):
            cfg2 = dc_replace(config, ignore_grad_correction=first_order)
            def loss_fn(p):
                return adkf.episode_outer_loss(cfg2, p, episode)
            return jax.grad(loss_fn)(params)

        g_full = outer(False)
        g_fo = outer(True)
        def norm(t):
            return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in jax.tree.leaves(t)))
        corr = jax.tree.map(lambda a, b: a - b, g_full, g_fo)
        return dict(
            stationarity=jnp.linalg.norm(g_stat),
            eig_min=eig.min(),
            eig_max=eig.max(),
            fo_grad_norm=norm(g_fo),
            corr_norm=norm(corr),
        )

    return jax.jit(probe)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--probe-every", type=int, default=25)
    ap.add_argument("--tasks", type=int, default=64)
    ap.add_argument("--tasks-per-batch", type=int, default=8)
    ap.add_argument("--support", type=int, default=32)
    ap.add_argument("--query", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--features", type=str, default="gnn+fc")
    args = ap.parse_args()

    tasks = [
        make_teacher_task(f"TR{i}", num_samples=160, seed=100 + i)
        for i in range(args.tasks)
    ]
    spec = EpisodeSpec(
        support_size=args.support, query_size=args.query,
        nodes_per_graph=48, edges_per_graph=(80, 32, 16),
    )
    sampler = StratifiedTaskSampler(args.support, test_size_or_ratio=args.query)
    from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig

    config = adkf.ADKFModelConfig(
        inner_optimizer=LBFGSConfig(max_iters=48, history=8, method="newton"),
        features=CombinedFeatureConfig(used_features=args.features),
    )

    def episodes_for(step):
        r = np.random.RandomState(10_000 + step)
        picks = r.choice(len(tasks), size=args.tasks_per_batch, replace=False)
        return stack_episodes([
            build_episode(sampler.sample(tasks[ti], seed=step * 31 + j), spec)
            for j, ti in enumerate(picks)
        ])

    probe_ep = build_episode(sampler.sample(tasks[0], seed=999), spec)
    probe = make_probe(config)

    params = adkf.init_encoder_params(config, jax.random.PRNGKey(0), probe_ep.support)
    optimizer = make_optimizer(args.lr, clip_value=1.0)
    state = init_train_state(params, optimizer)
    step_fn = make_meta_train_step(
        lambda p, e: adkf.episode_outer_loss(config, p, e), optimizer,
        task_chunk=1, remat=False,
        batch_loss_fn=lambda p, e: adkf.batch_outer_loss(config, p, e),
    )

    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        state, losses = step_fn(state, jax.device_put(episodes_for(step)))
        if step % args.probe_every == 0 or step == 1:
            loss = float(np.mean(np.asarray(losses)))
            d = {k: float(np.asarray(v)) for k, v in probe(state.params, probe_ep).items()}
            print(
                f"step {step:4d}: loss {loss:8.2f} | stat {d['stationarity']:.2e} "
                f"| eig [{d['eig_min']:.3e}, {d['eig_max']:.3e}] "
                f"| fo-grad {d['fo_grad_norm']:.3e} corr {d['corr_norm']:.3e} "
                f"({time.perf_counter()-t0:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
