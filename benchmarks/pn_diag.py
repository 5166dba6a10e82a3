"""Diagnose the zoo PN arm: logit scales + AUPRC of the trained
ProtoNet checkpoint under mahalanobis vs euclidean heads (CPU-only)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""

import numpy as np
from dataclasses import replace

from adkf_ift_tpu.data.dataset import FSMolDataset, DataFold
from adkf_ift_tpu.data.episodes import EpisodeSpec
from adkf_ift_tpu.train.loop import episode_stream
from adkf_ift_tpu.utils.checkpoints import load_checkpoint
from adkf_ift_tpu.utils.metrics import compute_binary_task_metrics
from adkf_ift_tpu.models import protonet

CKPT = sorted(__import__("glob").glob(
    "/root/repo/.zoo/train/PN/FSMol_train_*/best_validation"))[-1]
config, params, _, step = load_checkpoint(CKPT)
print("checkpoint:", CKPT, "step", step, "metric", config.distance_metric)

ds = FSMolDataset.from_directory("/root/repo/.zoo/data")
spec = EpisodeSpec(support_size=32, query_size=64, nodes_per_graph=48,
                   edges_per_graph=(80, 32, 16))
stream = episode_stream(ds, DataFold.VALIDATION, spec, repeat=False, num_workers=0)

import jax.numpy as jnp

for metric in ("mahalanobis", "euclidean"):
    cfg = replace(config, distance_metric=metric)
    logits_fn = jax.jit(lambda p, e: protonet.episode_logits(cfg, p, e))
    auprcs, gaps, losses = [], [], []
    stream = episode_stream(ds, DataFold.VALIDATION, spec, repeat=False, num_workers=0)
    for i, ep in enumerate(stream):
        if i >= 6:
            break
        logits, y, m = logits_fn(params, ep)
        logits, y, m = np.asarray(logits), np.asarray(y), np.asarray(m).astype(bool)
        gap = logits[:, 1] - logits[:, 0]
        p = 1.0 / (1.0 + np.exp(-np.clip(gap, -30, 30)))
        res = compute_binary_task_metrics(p[m], y[m])
        auprcs.append(res.avg_precision - np.mean(y[m]))
        gaps.append(np.abs(gap[m]))
        ce = np.mean(np.log1p(np.exp(-np.clip(np.where(y[m] > 0, gap[m], -gap[m]), -700, 700))))
        losses.append(ce)
    g = np.concatenate(gaps)
    print(f"{metric:12s} dAUPRC {np.mean(auprcs):+.4f}  |gap| med {np.median(g):9.2f} "
          f"max {np.max(g):9.2f}  CE {np.mean(losses):.3f}")
