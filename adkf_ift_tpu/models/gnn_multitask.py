"""GNN-MT: multitask pretraining + per-task head fine-tuning.

Parity with fs_mol/models/gnn_multitask.py + the generic finetune loop
in abstract_torch_fsmol_model.py:442-541: a GraphFeatureExtractor shared
across all training tasks with an MLP tail producing one logit per task,
selected by each sample's task id; binary cross-entropy training over
mixed-task batches; few-shot evaluation re-initializes a fresh
single-task head (optionally unfreezing the encoder) and fine-tunes on
the support set.

TPU notes: mixed-task batches are PackedGraphs + a [G] task-id vector;
the per-task fine-tune is a lax.scan'd Adam loop like DKL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from adkf_ift_tpu.data.episodes import Episode, PackedGraphs
from adkf_ift_tpu.modules.encoder import GraphFeatureExtractor, GraphFeatureExtractorConfig
from adkf_ift_tpu.modules.readout import MLP


@dataclass(frozen=True)
class GNNMultitaskConfig:
    graph_config: GraphFeatureExtractorConfig = field(default_factory=GraphFeatureExtractorConfig)
    num_tasks: int = 1
    num_tail_layers: int = 1
    # Fine-tune settings for few-shot eval (abstract loop defaults).
    finetune_steps: int = 50
    finetune_lr: float = 5e-5
    finetune_task_specific_lr: float = 1e-4
    finetune_encoder: bool = True


class GNNMultitaskModel(nn.Module):
    config: GNNMultitaskConfig

    @nn.compact
    def __call__(self, batch: PackedGraphs, sample_to_task_id: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        mol = GraphFeatureExtractor(cfg.graph_config, name="graph_feature_extractor")(batch)
        out_dim = cfg.graph_config.readout_config.output_dim
        logits_all = MLP(
            hidden_dims=(out_dim,) * (cfg.num_tail_layers - 1),
            out_dim=cfg.num_tasks,
            name="tail_mlp",
        )(mol)
        return jnp.take_along_axis(logits_all, sample_to_task_id[:, None], axis=1)[:, 0]


def make_model(config: GNNMultitaskConfig) -> GNNMultitaskModel:
    return GNNMultitaskModel(config)


def init_params(config: GNNMultitaskConfig, rng: jax.Array, example: PackedGraphs):
    ids = jnp.zeros((example.num_graphs,), jnp.int32)
    return make_model(config).init(rng, example, ids)


def batch_loss(
    config: GNNMultitaskConfig,
    params,
    batch: PackedGraphs,
    sample_to_task_id: jnp.ndarray,
    labels01: jnp.ndarray,
) -> jnp.ndarray:
    """Masked binary cross-entropy over a mixed-task batch."""
    logits = make_model(config).apply(params, batch, sample_to_task_id)
    mask = batch.graph_mask
    nll = optax.sigmoid_binary_cross_entropy(logits, labels01)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _single_task_config(config: GNNMultitaskConfig) -> GNNMultitaskConfig:
    from dataclasses import replace

    return replace(config, num_tasks=1)


def finetune_on_support(
    config: GNNMultitaskConfig,
    pretrained_params,
    episode: Episode,
    rng: jax.Array,
) -> Tuple[GNNMultitaskConfig, dict]:
    """Fresh single-task head + fine-tune on the support set
    (eval_model_by_finetuning_on_task semantics with per-group LRs:
    task-specific head at a higher LR than the shared encoder,
    abstract_torch_fsmol_model.py:169-207)."""
    st_config = _single_task_config(config)
    fresh = init_params(st_config, rng, episode.support)
    params = {
        "params": {
            "graph_feature_extractor": pretrained_params["params"]["graph_feature_extractor"],
            "tail_mlp": fresh["params"]["tail_mlp"],
        }
    }

    def label_fn(path, _):
        is_head = any(getattr(p, "key", None) == "tail_mlp" for p in path)
        return "head" if is_head else "encoder"

    encoder_lr = config.finetune_lr if config.finetune_encoder else 0.0
    optimizer = optax.multi_transform(
        {
            "head": optax.adam(config.finetune_task_specific_lr),
            "encoder": optax.adam(encoder_lr) if encoder_lr > 0 else optax.set_to_zero(),
        },
        jax.tree_util.Partial(lambda tree: jax.tree_util.tree_map_with_path(label_fn, tree)),
    )
    opt_state = optimizer.init(params)
    ids = jnp.zeros((episode.support.num_graphs,), jnp.int32)
    labels01 = (episode.support_labels > 0).astype(jnp.float32)

    grad_fn = jax.grad(
        lambda p: batch_loss(st_config, p, episode.support, ids, labels01)
    )

    def step(carry, _):
        p, s = carry
        g = grad_fn(p)
        updates, s = optimizer.update(g, s, p)
        return (optax.apply_updates(p, updates), s), None

    (params, _), _ = jax.lax.scan(step, (params, opt_state), None, length=config.finetune_steps)
    return st_config, params


def episode_predict(
    config: GNNMultitaskConfig,
    pretrained_params,
    episode: Episode,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Few-shot eval: fine-tune fresh head on support, score query."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    st_config, params = finetune_on_support(config, pretrained_params, episode, rng)
    ids = jnp.zeros((episode.query.num_graphs,), jnp.int32)
    logits = make_model(st_config).apply(params, episode.query, ids)
    return jax.nn.sigmoid(logits)
