"""Frozen-encoder predictive performance on design tasks — parity with
bayes_opt/predictive_performance/*.py: embed all molecules with a frozen
meta-trained encoder, fit a GP on a train split of the representations,
and report out-of-sample R² against the train-mean baseline."""

from __future__ import annotations

import logging
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from adkf_ift_tpu.bo.bo_utils import BOGPConfig, fit_bo_gp, get_representation
from adkf_ift_tpu.data.episodes import GraphPadSpec, pack_graphs
from adkf_ift_tpu.data.task import Task
from adkf_ift_tpu.gp import posterior, unflatten_gp_params
from adkf_ift_tpu.utils.metrics import r2_score_os

logger = logging.getLogger(__name__)


def embed_task(kind: str, config, params, task: Task, batch_graphs: int = 100) -> np.ndarray:
    """Frozen representations for every molecule (task_to_batches +
    get_representation, bo_utils.py:326-339, 475-698)."""
    represent = get_representation(kind, config, params)
    reps: List[np.ndarray] = []
    samples = task.samples
    for start in range(0, len(samples), batch_graphs):
        chunk = samples[start : start + batch_graphs]
        spec = GraphPadSpec.for_graphs(batch_graphs, nodes_per_graph=64, edges_per_graph=(120, 48, 24))
        packed = pack_graphs(chunk, spec)
        out = np.asarray(represent(packed))
        reps.append(out[: len(chunk)])
    return np.concatenate(reps, axis=0)


def predictive_r2(
    features: np.ndarray,
    y: np.ndarray,
    num_train: int = 64,
    num_repeats: int = 5,
    config: BOGPConfig = BOGPConfig(),
    seed: int = 0,
) -> Tuple[float, List[float]]:
    """GP fit on `num_train` random points, R² (vs train-mean baseline)
    on the rest; repeated with different splits."""
    rng = np.random.RandomState(seed)
    y = np.asarray(y, np.float64)
    y_std = (y - y.mean()) / y.std()
    scores: List[float] = []
    for _ in range(num_repeats):
        perm = rng.permutation(len(y_std))
        train_idx, test_idx = perm[:num_train], perm[num_train:]
        x_train = jnp.asarray(features[train_idx].astype(np.float32))
        y_train = jnp.asarray(y_std[train_idx].astype(np.float32))
        mask = jnp.ones((num_train,), jnp.float32)
        theta = fit_bo_gp(config, x_train, y_train, mask)
        params = unflatten_gp_params(config.gp_config.kernel, theta)
        post = posterior(
            config.gp_config, params, x_train, y_train,
            jnp.asarray(features[test_idx].astype(np.float32)), noisy=True,
        )
        score = r2_score_os(
            y_std[test_idx], np.asarray(post.mean), y_train_mean=float(y_std[train_idx].mean())
        )
        scores.append(float(score))
    return float(np.mean(scores)), scores
