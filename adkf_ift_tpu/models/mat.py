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
    # "native" (default): the post-norm two-linear-FF design above.
    # "pretrained": the published MAT checkpoint architecture — PRE-norm
    # sublayer residuals x + f(LN(x)), a single d_model->d_model
    # feed-forward with leaky-relu (N_dense=1, slope 0.1), an UNNORMALIZED
    # exp(-D) distance channel, a row-normalized adjacency channel, a
    # final encoder LayerNorm and a single-linear generator head — so the
    # published .pth tensors (fs_mol/models/mat.py:78-99's make_model
    # hyperparameters) drop in via load_pretrained_torch_weights.
    variant: str = "native"
    leaky_relu_slope: float = 0.1


def pretrained_mat_config(**overrides) -> MATConfig:
    """The published pretrained checkpoint's hyperparameters
    (fs_mol/models/mat.py:78-92: d_model 1024, N 8, h 16, N_dense 1,
    lambda_attention/distance 0.33, exp distance kernel, mean aggregation)."""
    kw = dict(
        hidden_dim=1024, num_layers=8, num_heads=16, ff_dim=1024,
        lambda_attention=0.33, lambda_distance=0.33, variant="pretrained",
        leaky_relu_slope=0.1,
    )
    kw.update(overrides)
    return MATConfig(**kw)


def _molecule_attention(cfg: MATConfig, x, adjacency, distance, atom_mask, heads_of):
    """The shared molecule-attention mix
    A_mol = λ_att · softmax(QKᵀ/√d) + λ_dist · g(D) + λ_adj · Â
    applied to the value heads. `heads_of(name)` projects x to [G,A,h,d].
    Variant difference: "native" row-normalizes the exp(-D) channel;
    "pretrained" keeps it unnormalized (the published 'exp'
    distance_matrix_kernel maps masked distances to exp(-inf)=0 without
    renormalizing)."""
    g, a, _ = x.shape
    h = cfg.num_heads
    d = cfg.hidden_dim // h
    q, k, v = heads_of("q"), heads_of("k"), heads_of("v")
    scores = jnp.einsum("gihd,gjhd->ghij", q, k) / jnp.sqrt(float(d))
    pair_mask = atom_mask[:, :, None] * atom_mask[:, None, :]  # [G, A, A]
    scores = jnp.where(pair_mask[:, None] > 0, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1)

    dist_kernel = jnp.exp(-distance) * pair_mask
    if cfg.variant != "pretrained":
        dist_kernel = dist_kernel / jnp.maximum(dist_kernel.sum(-1, keepdims=True), 1e-8)
    adj_norm = adjacency / jnp.maximum(adjacency.sum(-1, keepdims=True), 1e-6)

    lam_a, lam_d = cfg.lambda_attention, cfg.lambda_distance
    lam_g = 1.0 - lam_a - lam_d
    mixed = lam_a * attn + lam_d * dist_kernel[:, None] + lam_g * adj_norm[:, None]
    return jnp.einsum("ghij,gjhd->gihd", mixed, v).reshape(g, a, -1)


class MATLayer(nn.Module):
    """One molecule-attention layer over a [G, A, H] batch (post-norm
    native design)."""

    config: MATConfig

    @nn.compact
    def __call__(self, x, adjacency, distance, atom_mask):
        cfg = self.config
        g, a, _ = x.shape
        h, d = cfg.num_heads, cfg.hidden_dim // cfg.num_heads

        def heads(name):
            return nn.Dense(cfg.hidden_dim, name=name)(x).reshape(g, a, h, d)

        out = _molecule_attention(cfg, x, adjacency, distance, atom_mask, heads)
        x = nn.LayerNorm()(x + nn.Dense(cfg.hidden_dim, name="attn_out")(out))
        ff = nn.Dense(cfg.hidden_dim, name="ff2")(nn.relu(nn.Dense(cfg.ff_dim, name="ff1")(x)))
        return nn.LayerNorm()(x + ff)


class MATLayerNorm(nn.Module):
    """The annotated-transformer LayerNorm the published checkpoint was
    trained under: UNBIASED std (ddof=1) with eps OUTSIDE the sqrt —
    both differ from flax's nn.LayerNorm (biased variance, eps inside)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        mean = x.mean(-1, keepdims=True)
        std = jnp.sqrt(x.var(-1, keepdims=True, ddof=1))
        return scale * (x - mean) / (std + self.eps) + bias


class MATLayerPretrained(nn.Module):
    """Published-checkpoint layer: PRE-norm residuals
    x + attn(LN0(x)); x + ff(LN1(x)) with a single leaky-relu
    d_model->d_model feed-forward (N_dense=1, dense_output_nonlinearity
    'relu' == leaky-relu at the configured slope)."""

    config: MATConfig

    @nn.compact
    def __call__(self, x, adjacency, distance, atom_mask):
        cfg = self.config
        g, a, _ = x.shape
        h, d = cfg.num_heads, cfg.hidden_dim // cfg.num_heads

        xn = MATLayerNorm(name="norm0")(x)

        def heads(name):
            return nn.Dense(cfg.hidden_dim, name=name)(xn).reshape(g, a, h, d)

        out = _molecule_attention(cfg, xn, adjacency, distance, atom_mask, heads)
        x = x + nn.Dense(cfg.hidden_dim, name="attn_out")(out)
        xn = MATLayerNorm(name="norm1")(x)
        ff = nn.leaky_relu(
            nn.Dense(cfg.hidden_dim, name="ff1")(xn),
            negative_slope=cfg.leaky_relu_slope,
        )
        return x + ff


class MATModel(nn.Module):
    config: MATConfig

    @nn.compact
    def __call__(self, batch: DenseMolBatch) -> jnp.ndarray:
        cfg = self.config
        x = nn.Dense(cfg.hidden_dim, name="embed")(batch.node_features)
        layer_cls = MATLayerPretrained if cfg.variant == "pretrained" else MATLayer
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, name=f"layer{i}")(
                x, batch.adjacency, batch.distance, batch.atom_mask
            )
        if cfg.variant == "pretrained":
            x = MATLayerNorm(name="final_norm")(x)
        denom = jnp.maximum(jnp.sum(batch.atom_mask, axis=1, keepdims=True), 1.0)
        pooled = jnp.sum(x * batch.atom_mask[:, :, None], axis=1) / denom  # [G, H]
        if cfg.variant == "pretrained":
            # Generator with n_layers=1: one linear on the masked mean.
            return nn.Dense(1, name="generator")(pooled)[:, 0]
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


def load_pretrained_torch_weights(config: MATConfig, params, src):
    """Map a published MAT checkpoint's tensors into `params`.

    `src` is a torch .pth path or an already-loaded state dict. The
    reference fine-tunes from this artifact (fs_mol/models/mat.py:29-100,
    build_from_model_file + load_model_state); here the same tensors are
    transposed into the variant="pretrained" flax module tree. Expected
    key layout (the published GraphTransformer: torch Linear weights are
    [out, in] and transpose into flax [in, out]; LayerNorm is a_2/b_2):

      src_embed.lut.{weight,bias}                     -> embed
      encoder.layers.{i}.self_attn.linears.{0,1,2,3}  -> layer{i}.{q,k,v,attn_out}
      encoder.layers.{i}.feed_forward.linears.0       -> layer{i}.ff1
      encoder.layers.{i}.sublayer.{0,1}.norm.{a_2,b_2}-> layer{i}.{norm0,norm1}
      encoder.norm.{a_2,b_2}                          -> final_norm
      generator.proj.{weight,bias}                    -> generator

    The task-specific `generator` tensors load too when present
    (load_task_specific_weights semantics); keys the flax tree does not
    model (e.g. dropout-free buffers) fail loudly. Shape-driven: works
    for any d_model/N so the mapping itself is testable at small dims
    (tests/test_par_mat.py cross-checks the imported forward against an
    independent torch mirror of the published equations).
    """
    if config.variant != "pretrained":
        raise ValueError("load_pretrained_torch_weights needs variant='pretrained'")
    import numpy as np

    if isinstance(src, (str, bytes)):
        import torch

        state = torch.load(src, map_location="cpu", weights_only=True)
    else:
        state = src
    if "model_state_dict" in state:  # our richer checkpoints (reference :55-60)
        state = state["model_state_dict"]
    state = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu() if hasattr(v, "cpu") else v)
             for k, v in state.items()}

    import jax as _jax

    tree = _jax.tree.map(np.asarray, params)["params"]
    consumed = set()

    def take(key):
        if key not in state:
            raise KeyError(f"pretrained MAT checkpoint missing tensor {key!r}")
        consumed.add(key)
        return state[key]

    def dense(dst, key):
        w, b = take(f"{key}.weight"), take(f"{key}.bias")
        if dst["kernel"].shape != w.T.shape:
            raise ValueError(f"{key}: shape {w.shape} vs flax {dst['kernel'].shape}")
        dst["kernel"] = w.T.astype(dst["kernel"].dtype)
        dst["bias"] = b.astype(dst["bias"].dtype)

    def norm(dst, key):
        dst["scale"] = take(f"{key}.a_2").astype(dst["scale"].dtype)
        dst["bias"] = take(f"{key}.b_2").astype(dst["bias"].dtype)

    dense(tree["embed"], "src_embed.lut")
    for i in range(config.num_layers):
        layer = tree[f"layer{i}"]
        base = f"encoder.layers.{i}"
        for j, name in enumerate(("q", "k", "v", "attn_out")):
            dense(layer[name], f"{base}.self_attn.linears.{j}")
        dense(layer["ff1"], f"{base}.feed_forward.linears.0")
        norm(layer["norm0"], f"{base}.sublayer.0.norm")
        norm(layer["norm1"], f"{base}.sublayer.1.norm")
    norm(tree["final_norm"], "encoder.norm")
    if "generator.proj.weight" in state:
        dense(tree["generator"], "generator.proj")

    leftover = sorted(set(state) - consumed)
    if leftover:
        import logging

        logging.getLogger(__name__).info(
            "pretrained MAT import: %d unmapped tensors ignored (e.g. %s)",
            len(leftover), leftover[:3],
        )
    return {"params": tree}
