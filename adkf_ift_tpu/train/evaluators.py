"""Per-model episode evaluators for the shared eval harness.

The reference wires each model into eval_model() with a bespoke
`test_model_fn` closure (e.g. adaptive_dkt_utils.py:119-175,
dkt_utils.py, protonet_utils.py). Here a single registry maps a model
kind to a prediction function jitted ONCE with params as a traced
argument, so both one-shot testing and validate-every-50-steps reuse the
same executable. Episodes are padded to static specs, so one compilation
covers a whole eval sweep per (support, query) bucket.

Predictions are positive-class probabilities for classification and
standardized means for regression; the harness (train/evaluation.py)
slices off padding.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import numpy as np

from adkf_ift_tpu.data.episodes import Episode

MODEL_KINDS = (
    "adkf", "adkf_vgp", "dkt", "dkl", "gpst", "protonet", "cnp", "maml",
    "multitask", "par",
)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def make_predict_fn(kind: str, config, regression: bool = False) -> Callable:
    """Jitted (params, episode) -> predictions over the (padded) query.
    For GP-backed models in classification mode, the posterior mean is
    squashed by a sigmoid (reference eval path, adaptive_dkt_utils.py:94-114).
    """
    from adkf_ift_tpu.models import adkf, cnp, dkl, dkt, gnn_multitask, gpst, maml, protonet

    if kind == "adkf":
        raw = lambda p, e: adkf.episode_predict(config, p, e).mean
        gp = True
    elif kind == "adkf_vgp":
        from adkf_ift_tpu.models import adkf_vgp

        raw = lambda p, e: adkf_vgp.episode_predict(config, p, e).probs
        gp = False
    elif kind == "dkt":
        raw = lambda p, e: dkt.episode_predict(config, p, e).mean
        gp = True
    elif kind == "dkl":
        # `p` is the FIXED random init the per-task fit restarts from
        # (reference resets to init params per task, dkl_utils.py:56-121).
        raw = lambda p, e: dkl.episode_predict(config, p, e).mean
        gp = True
    elif kind == "gpst":
        raw = lambda p, e: gpst.episode_predict(config, e).mean
        gp = True
    elif kind == "protonet":
        raw = lambda p, e: protonet.episode_predict(config, p, e)
        gp = False
    elif kind == "cnp":
        raw = lambda p, e: cnp.episode_predict(config, p, e)
        gp = False
    elif kind == "maml":
        raw = lambda p, e: maml.episode_predict(config, p, e)
        gp = False
    elif kind == "par":
        from adkf_ift_tpu.models import par as par_model

        raw = lambda p, e: par_model.episode_predict(config, p, e)
        gp = False
    elif kind == "multitask":
        raw = lambda p, e: gnn_multitask.episode_predict(config, p, e)
        gp = False
    else:
        raise ValueError(f"unknown model kind: {kind}")

    from adkf_ift_tpu.utils.wire import WireCodec, decompress_batch

    # Compress the episode on the host and restore dtypes inside the jit:
    # eval episodes ship fingerprints/features/masks as f32 otherwise and
    # the tunnel's host->device path dominates per-episode latency. One
    # codec per predict_fn keeps the jitted signature stable across
    # episodes (value-dependent dtypes would recompile mid-sweep).
    codec = WireCodec(sparse_counts_budget=192)
    from adkf_ift_tpu.utils.compile_opts import xla_compiler_options
    jitted = jax.jit(lambda p, e: raw(p, decompress_batch(e)),
                     compiler_options=xla_compiler_options())

    def predict(params, episode: Episode) -> np.ndarray:
        out = np.asarray(jitted(params, codec.compress(episode)), np.float64)
        if gp and not regression:
            return _sigmoid(out)
        return out

    return predict


def _query_labels(episode: Episode, regression: bool) -> np.ndarray:
    if regression:
        return np.asarray(episode.query_numeric_labels, np.float64)
    return (np.asarray(episode.query_labels) > 0).astype(np.float64)


def bind_evaluator(predict: Callable, params, regression: bool = False):
    """Bind params into an EpisodeEvaluator for train/evaluation.eval_model.

    Params are device-committed ONCE here: checkpoint leaves are host
    numpy arrays, and passing them to the jitted predict re-ships the
    whole encoder (~60 MB) on EVERY episode chunk call. On the tunnel —
    which permanently pins each h2d staging buffer
    (docs/TUNNEL_LEAK.md) — that both leaked ~params-bytes x chunk-calls
    of host RSS per eval (the round-4 '32 GB eval' incident: measured
    ~190 MB/episode by ADKF_EVAL_MEMLOG with zero live arrays) and set
    the per-episode latency floor (~2 s per 61 MB transfer at tunnel
    bandwidth). A committed jax.Array is transferred once and reused;
    for already-device-resident training params this is a no-op."""
    if params is not None:
        params = jax.device_put(params)

    def evaluate(episode: Episode, seed: int):
        return predict(params, episode), _query_labels(episode, regression)

    return evaluate


def make_evaluator(kind: str, config, params=None, regression: bool = False):
    """One-shot convenience: jit + bind in one call."""
    return bind_evaluator(make_predict_fn(kind, config, regression), params, regression)
