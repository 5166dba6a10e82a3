"""PAR zero-score diagnosis (VERDICT r3 weak #6 / next-step #8).

The round-3 zoo PAR row was statistically ZERO (−0.005…−0.002 across
sizes) while the reference's PAR is weak-but-positive (0.1344@16,
BASELINE.md). Mechanism question: in PAR, support-label information
reaches the query prediction ONLY through the MAML inner step (the
relation module's inputs are unlabeled embeddings; par_utils.py:179-236
uses softmax(q_logits), not the q_pred_adj path). If one inner SGD step
at the configured inner lr cannot move the adaptable weights, the
predictor is support-label-INDEPENDENT and ΔAUPRC must be ~0 regardless
of training.

This probe measures that directly: label-sensitivity
    sens(lr) = mean |p(query | labels) − p(query | flipped labels)|
on synthetic episodes at the round-3 default (1e-3) vs the reference's
effective default (1e-1 — par_train.py:102 --lr_inner overrides the
dataclass 1e-3; our CLI copied the dataclass value, which is the port
defect this probe pins).

CPU-pinned; runs in ~1 min.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache_cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from dataclasses import replace

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode
from adkf_ift_tpu.models import par
from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig
from adkf_ift_tpu.utils.synthetic import make_teacher_task


def main():
    # Small encoder for CPU speed; the mechanism is in the relation head.
    feats = CombinedFeatureConfig()
    feats = replace(feats, fc_hidden_dim=128, fc_out_dim=64)
    spec = EpisodeSpec(support_size=16, query_size=32, nodes_per_graph=48,
                       edges_per_graph=(80, 32, 16))
    sampler = StratifiedTaskSampler(16, test_size_or_ratio=32)
    episodes = []
    for t in range(4):
        task = make_teacher_task(f"D{t}", num_samples=96, seed=300 + t)
        episodes.append(build_episode(sampler.sample(task, seed=t), spec))

    for lr in (1e-3, 1e-2, 1e-1, 5e-1):
        cfg = par.PARModelConfig(
            features=feats, emb_dim=64, map_dim=64, rel_hidden_dim=64,
            inner_learning_rate=lr,
        )
        sens, auc_gap = [], []
        for i, ep in enumerate(episodes):
            params = par.init_params(cfg, jax.random.PRNGKey(i), ep)
            p_true = np.asarray(par.episode_predict(cfg, params, ep))
            flipped = ep._replace(support_labels=-ep.support_labels)
            p_flip = np.asarray(par.episode_predict(cfg, params, flipped))
            m = np.asarray(ep.query.graph_mask) > 0
            sens.append(np.abs(p_true - p_flip)[m].mean())
        print(f"inner_lr {lr:7.0e}: label-sensitivity "
              f"{np.mean(sens):.5f} (fresh params, 4 episodes)")


if __name__ == "__main__":
    main()
