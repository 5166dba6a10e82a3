"""MAT: Molecule Attention Transformer, fine-tuned per task.

Capability parity with fs_mol/models/mat.py:29-100, which wraps the
third_party/MAT submodule (a torch transformer whose self-attention mixes
softmax attention with adjacency and inter-atomic distance channels) and
fine-tunes it per few-shot task through the generic
AbstractTorchFSMolModel loop. The architecture here is the published MAT
design implemented natively: per-layer molecule self-attention

    A_mol = λ_att · softmax(QKᵀ/√d) + λ_dist · g(D) + λ_adj · Â

with g(d) = exp(−d) (the "exp" distance kernel), mean-pooled readout and
a classification head. The reference evaluates from a pretrained
checkpoint (downloaded artifact); training from scratch per task is the
same code path with fresh parameters.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from adkf_ift_tpu.data.mat import DenseMolBatch
from adkf_ift_tpu.data.task import NUM_NODE_FEATURES


@dataclass(frozen=True)
class MATConfig:
    hidden_dim: int = 128
    num_layers: int = 4
    num_heads: int = 8
    ff_dim: int = 256
    lambda_attention: float = 0.33
    lambda_distance: float = 0.33  # remainder goes to adjacency
    dropout: float = 0.0
    # Per-task fine-tuning (abstract_torch_fsmol_model.py:169-207 defaults).
    finetune_steps: int = 60
    finetune_lr: float = 5e-4


class MATLayer(nn.Module):
    """One molecule-attention layer over a [G, A, H] batch."""

    config: MATConfig

    @nn.compact
    def __call__(self, x, adjacency, distance, atom_mask):
        cfg = self.config
        g, a, _ = x.shape
        h, d = cfg.num_heads, cfg.hidden_dim // cfg.num_heads

        def heads(name):
            return nn.Dense(cfg.hidden_dim, name=name)(x).reshape(g, a, h, d)

        q, k, v = heads("q"), heads("k"), heads("v")
        scores = jnp.einsum("gihd,gjhd->ghij", q, k) / jnp.sqrt(float(d))
        pair_mask = atom_mask[:, :, None] * atom_mask[:, None, :]  # [G, A, A]
        scores = jnp.where(pair_mask[:, None] > 0, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)

        dist_kernel = jnp.exp(-distance) * pair_mask
        dist_kernel = dist_kernel / jnp.maximum(dist_kernel.sum(-1, keepdims=True), 1e-8)
        adj_norm = adjacency / jnp.maximum(adjacency.sum(-1, keepdims=True), 1e-8)

        lam_a, lam_d = cfg.lambda_attention, cfg.lambda_distance
        lam_g = 1.0 - lam_a - lam_d
        mixed = lam_a * attn + lam_d * dist_kernel[:, None] + lam_g * adj_norm[:, None]
        out = jnp.einsum("ghij,gjhd->gihd", mixed, v).reshape(g, a, -1)
        x = nn.LayerNorm()(x + nn.Dense(cfg.hidden_dim, name="attn_out")(out))
        ff = nn.Dense(cfg.hidden_dim, name="ff2")(nn.relu(nn.Dense(cfg.ff_dim, name="ff1")(x)))
        return nn.LayerNorm()(x + ff)


class MATModel(nn.Module):
    config: MATConfig

    @nn.compact
    def __call__(self, batch: DenseMolBatch) -> jnp.ndarray:
        cfg = self.config
        x = nn.Dense(cfg.hidden_dim, name="embed")(batch.node_features)
        for i in range(cfg.num_layers):
            x = MATLayer(cfg, name=f"layer{i}")(
                x, batch.adjacency, batch.distance, batch.atom_mask
            )
        denom = jnp.maximum(jnp.sum(batch.atom_mask, axis=1, keepdims=True), 1.0)
        pooled = jnp.sum(x * batch.atom_mask[:, :, None], axis=1) / denom  # [G, H]
        hidden = nn.relu(nn.Dense(cfg.hidden_dim, name="head1")(pooled))
        return nn.Dense(1, name="head2")(hidden)[:, 0]


def init_params(config: MATConfig, rng: jax.Array, example: DenseMolBatch):
    return MATModel(config).init(rng, example)


def batch_loss(config: MATConfig, params, batch: DenseMolBatch) -> jnp.ndarray:
    logits = MATModel(config).apply(params, batch)
    nll = optax.sigmoid_binary_cross_entropy(logits, batch.labels)
    return jnp.sum(nll * batch.graph_mask) / jnp.maximum(jnp.sum(batch.graph_mask), 1.0)


def finetune(config: MATConfig, params, support: DenseMolBatch):
    """Per-task fine-tuning inside lax.scan (the generic finetune loop of
    abstract_torch_fsmol_model.py:442-541, compiled)."""
    optimizer = optax.adam(config.finetune_lr)
    opt_state = optimizer.init(params)
    grad_fn = jax.grad(lambda p: batch_loss(config, p, support))

    def step(carry, _):
        p, s = carry
        g = grad_fn(p)
        updates, s = optimizer.update(g, s, p)
        return (optax.apply_updates(p, updates), s), None

    (params, _), _ = jax.lax.scan(step, (params, opt_state), None, length=config.finetune_steps)
    return params


def episode_predict(config: MATConfig, params, support: DenseMolBatch, query: DenseMolBatch):
    """Fine-tune on the support molecules, score the query molecules."""
    tuned = finetune(config, params, support)
    return jax.nn.sigmoid(MATModel(config).apply(tuned, query))
