"""Feature-spectrum probe: is a meta-trained encoder rank/norm collapsed?

Round-4 finding (docs/ZOO_BENCH_V2.md analysis): the CLI-meta-trained
ADKF-IFT encoder on teacher-family v2 lands BELOW the fresh-init control
because its features collapse — measured here as effective rank
exp(entropy of the query-feature covariance spectrum) and feature std:

    v2-trained: effective rank 1.0, std ~653     (rank-1 explosion)
    v1-trained: effective rank 2.2, std ~330     (partial)
    fresh init: effective rank ~3.5, std ~1.2

Mechanism: the GP head refits lengthscale/outputscale per episode, so
feature SCALE is gradient-free for the outer objective and the encoder
is free to blow up a single discriminative direction (same degeneracy
class as the ProtoNet-mahalanobis diagnosis, benchmarks/pn_diag.py).
The reference's real-data regime (5k diverse assays) does not surface
this; few-task synthetic regimes do. Counter-experiment: the cossim
kernel (unit-norm features by construction — a reference-supported
config, adaptive_dkt.py kernel choices).

Usage:
  python benchmarks/feature_collapse_probe.py CKPT_DIR [--family v2]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache_cpu"))

import jax
import numpy as np

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode
from adkf_ift_tpu.models import adkf
from adkf_ift_tpu.utils.checkpoints import load_checkpoint
from adkf_ift_tpu.utils.synthetic import make_teacher_task


def spectrum(feats: np.ndarray):
    x = feats - feats.mean(0)
    s = np.linalg.svd(x, compute_uv=False)
    ev = s**2 / max((s**2).sum(), 1e-30)
    eff_rank = float(np.exp(-(ev * np.log(ev + 1e-12)).sum()))
    return eff_rank, float(ev[:5].sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--family", choices=["v1", "v2"], default="v2")
    ap.add_argument("--tasks", type=int, default=3)
    args = ap.parse_args()

    config, params, _, _ = load_checkpoint(args.checkpoint)
    spec = EpisodeSpec(support_size=64, query_size=128, nodes_per_graph=48,
                       edges_per_graph=(80, 32, 16))
    sampler = StratifiedTaskSampler(64, test_size_or_ratio=128)
    enc = adkf.make_encoder(config)

    for t in range(args.tasks):
        seed = 9000 + t
        kwargs = {}
        if args.family == "v2":
            q = np.random.RandomState(seed ^ 0x5EED).uniform(0.35, 0.65)
            kwargs = dict(readout="quadratic", flip_prob=0.10,
                          balance_quantile=float(q))
        task = make_teacher_task(f"TE{t}", num_samples=288, seed=seed, **kwargs)
        ep = build_episode(sampler.sample(task, seed=0), spec)
        fresh = adkf.init_encoder_params(config, jax.random.PRNGKey(t), ep.support)
        for name, p in (("trained", params), ("fresh", fresh)):
            _, fq = enc.apply_pair(p, ep.support, ep.query)
            x = np.asarray(fq)[np.asarray(ep.query.graph_mask) > 0]
            r, top5 = spectrum(x)
            print(f"task {t} {name:7s}: eff_rank {r:6.1f}  top5 var {top5:.3f}  "
                  f"std {x.std():10.3f}")


if __name__ == "__main__":
    main()
