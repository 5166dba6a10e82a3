"""PAR: property-aware relation networks with MAML adaptation.

Capability parity with fs_mol/models/par.py + fs_mol/utils/par_utils.py
(which wrap the PAR-NeurIPS21 submodule's ContextMLP / TaskAwareRelation
/ MAML — the submodule is vendored upstream; here the architecture is
implemented natively):

  * encoder: FS-Mol combined features -> FC(512) -> emb_dim (par.py:60-67);
  * ContextMLP: per-molecule MLP to map_dim + attention context over the
    support set, concatenated and reprojected;
  * TaskAwareRelation: per query point, a relation graph over
    [support ∪ {query}] — edge MLP on |x_i − x_j| -> sigmoid adjacency
    (adj_type="sim"), row-normalized message passing, final 2-way logits
    for every node;
  * losses (par_utils.py:104-160): inner = CE(support logits, support
    labels) + reg_adj·MSE(support-support adjacency vs same-label edges);
    outer = CE(query logits) + reg_adj·MSE(query-support adjacency rows);
  * MAML: differentiable inner SGD over the adaptable weights only (the
    relation head minus edge/node layers and the ContextMLP — the
    hard-coded '5' setting, par_utils.py:163-177); jax.grad of the outer
    loss gives the second-order meta-gradient, with an optional
    first-order stop-gradient ablation.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from adkf_ift_tpu.data.episodes import Episode
from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig, CombinedFeatureExtractor
from adkf_ift_tpu.modules.readout import MLP


def _default_par_features() -> CombinedFeatureConfig:
    cfg = CombinedFeatureConfig()
    # FC head: in -> 512 -> emb_dim (par.py:63-67).
    return replace(cfg, fc_hidden_dim=512, fc_out_dim=300)


@dataclass(frozen=True)
class PARModelConfig:
    features: CombinedFeatureConfig = field(default_factory=_default_par_features)
    emb_dim: int = 300
    map_dim: int = 128
    map_layer: int = 2
    ctx_head: int = 2
    rel_hidden_dim: int = 128
    rel_layer: int = 2
    rel_edge_layer: int = 2
    rel_res: float = 0.0
    reg_adj: float = 1.0
    # 1e-1 = the reference's effective default (par_train.py:102
    # --lr_inner 1e-1 overrides its dataclass's 1e-3). At 1e-3 one inner
    # SGD step cannot move the relation head enough for predictions to
    # depend on the support labels (benchmarks/par_diag.py).
    inner_learning_rate: float = 1e-1
    num_inner_update_step: int = 1
    second_order_maml: bool = True


class ContextMLP(nn.Module):
    """Per-molecule projection + attention context over the support set."""

    map_dim: int
    num_layers: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, support: jnp.ndarray, support_mask: jnp.ndarray):
        # x: [N, e] nodes of one task graph (support rows first); support: [S, e].
        h = MLP((self.map_dim,) * (self.num_layers - 1), self.map_dim, name="proj")(x)
        hs = h[: support.shape[0]]  # projected support rows
        d = self.map_dim // self.num_heads
        q = nn.Dense(self.map_dim, name="ctx_q")(h).reshape(-1, self.num_heads, d)
        k = nn.Dense(self.map_dim, name="ctx_k")(hs).reshape(-1, self.num_heads, d)
        v = nn.Dense(self.map_dim, name="ctx_v")(hs).reshape(-1, self.num_heads, d)
        scores = jnp.einsum("nhd,shd->nhs", q, k) / jnp.sqrt(float(d))
        scores = jnp.where(support_mask[None, None, :] > 0, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("nhs,shd->nhd", attn, v).reshape(-1, self.map_dim)
        return nn.Dense(self.map_dim, name="ctx_out")(jnp.concatenate([h, ctx], axis=-1))


class TaskAwareRelation(nn.Module):
    """Relation graph over one [support ∪ {query}] node set."""

    hidden_dim: int
    num_layers: int
    edge_layers: int
    res_alpha: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: jnp.ndarray):
        # x: [N, d]; node_mask: [N] (1 = real node).
        adjs: List[jnp.ndarray] = []
        h = x
        pair_mask = node_mask[:, None] * node_mask[None, :]
        for layer in range(self.num_layers):
            diff = jnp.abs(h[:, None, :] - h[None, :, :])  # [N, N, d]
            e = MLP(
                (self.hidden_dim,) * (self.edge_layers - 1), 1, name=f"edge_layer{layer}"
            )(diff)[..., 0]
            adj = nn.sigmoid(e) * pair_mask
            adjs.append(adj)
            norm = adj / jnp.maximum(jnp.sum(adj, axis=-1, keepdims=True), 1e-8)
            agg = jnp.matmul(norm, h)
            new = MLP((self.hidden_dim,), h.shape[-1], name=f"node_layer{layer}")(
                jnp.concatenate([h, agg], axis=-1)
            )
            h = new + self.res_alpha * h
        logits = nn.Dense(2, name="fc_logits")(h)  # [N, 2]
        return logits, adjs


class PARNet(nn.Module):
    """ContextMLP + TaskAwareRelation over every query's task graph."""

    config: PARModelConfig

    @nn.compact
    def __call__(
        self,
        support_emb: jnp.ndarray,  # [S, e]
        query_emb: jnp.ndarray,  # [Q, e]
        support_mask: jnp.ndarray,  # [S]
        query_mask: jnp.ndarray,  # [Q]
    ):
        cfg = self.config
        ctx = ContextMLP(cfg.map_dim, cfg.map_layer, cfg.ctx_head, name="encode_projection")
        rel = TaskAwareRelation(
            cfg.rel_hidden_dim, cfg.rel_layer, cfg.rel_edge_layer, cfg.rel_res,
            name="adapt_relation",
        )

        def per_query(q_emb, q_m):
            nodes = jnp.concatenate([support_emb, q_emb[None, :]], axis=0)  # [S+1, e]
            node_mask = jnp.concatenate([support_mask, q_m[None]], axis=0)
            mapped = ctx(nodes, support_emb, support_mask)
            logits, adjs = rel(mapped, node_mask)
            return logits[:-1], logits[-1], adjs[-1]  # s_logits [S,2], q_logit [2], adj

        s_logits, q_logits, adj = jax.vmap(per_query)(query_emb, query_mask)
        return s_logits, q_logits, adj  # [Q,S,2], [Q,2], [Q,S+1,S+1]


class PARParams(NamedTuple):
    encoder: dict
    relnet: dict


def make_encoder(config: PARModelConfig) -> CombinedFeatureExtractor:
    return CombinedFeatureExtractor(config.features)


def init_params(config: PARModelConfig, rng: jax.Array, episode: Episode) -> PARParams:
    r1, r2 = jax.random.split(rng)
    encoder = make_encoder(config)
    enc_params = encoder.init(r1, episode.support)
    fs, fq = encoder.apply_pair(enc_params, episode.support, episode.query)
    rel_params = PARNet(config).init(
        r2, fs, fq, episode.support.graph_mask, episode.query.graph_mask
    )
    return PARParams(encoder=enc_params, relnet=rel_params)


def label2edge(labels01_a: jnp.ndarray, labels01_b: jnp.ndarray) -> jnp.ndarray:
    """Ground-truth relation edges: 1 where labels agree (model.label2edge)."""
    return (labels01_a[:, None] == labels01_b[None, :]).astype(jnp.float32)


def _forward(config: PARModelConfig, params: PARParams, episode: Episode):
    encoder = make_encoder(config)
    fs, fq = encoder.apply_pair(params.encoder, episode.support, episode.query)
    return PARNet(config).apply(
        params.relnet, fs, fq, episode.support.graph_mask, episode.query.graph_mask
    )


def _masked_ce(logits: jnp.ndarray, labels01: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = labels01 * logp[..., 1] + (1.0 - labels01) * logp[..., 0]
    return -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def support_loss(config: PARModelConfig, params: PARParams, episode: Episode) -> jnp.ndarray:
    """Inner (adaptation) loss: support CE over every query graph +
    adjacency regularizer on support-support edges (get_loss flag=True)."""
    s_logits, _, adj = _forward(config, params, episode)
    s01 = (episode.support_labels > 0).astype(jnp.float32)
    s_mask = episode.support.graph_mask
    q_mask = episode.query.graph_mask
    qs_mask = q_mask[:, None] * s_mask[None, :]

    ce = _masked_ce(s_logits, jnp.broadcast_to(s01, s_logits.shape[:2]), qs_mask)
    s = s01.shape[0]
    pred_edge = adj[:, :s, :s]
    label_edge = label2edge(s01, s01)[None, :, :]
    pair_mask = (s_mask[:, None] * s_mask[None, :])[None, :, :] * q_mask[:, None, None]
    mse = jnp.sum(((pred_edge - label_edge) ** 2) * pair_mask) / jnp.maximum(jnp.sum(pair_mask), 1.0)
    return ce + config.reg_adj * mse


def query_loss(config: PARModelConfig, params: PARParams, episode: Episode) -> jnp.ndarray:
    """Outer loss: query CE + adjacency regularizer on the query-support
    rows of the relation graph (get_loss flag=False)."""
    _, q_logits, adj = _forward(config, params, episode)
    s01 = (episode.support_labels > 0).astype(jnp.float32)
    q01 = (episode.query_labels > 0).astype(jnp.float32)
    s_mask = episode.support.graph_mask
    q_mask = episode.query.graph_mask

    ce = _masked_ce(q_logits, q01, q_mask)
    s = s01.shape[0]
    pred_edge = adj[:, -1, :s]  # query node's edges to support nodes
    label_edge = label2edge(q01, s01)
    qs_mask = q_mask[:, None] * s_mask[None, :]
    mse = jnp.sum(((pred_edge - label_edge) ** 2) * qs_mask) / jnp.maximum(jnp.sum(qs_mask), 1.0)
    return ce + config.reg_adj * mse


def _adaptable(path) -> bool:
    """The hard-coded '5' setting (par_utils.py:163-177): adapt everything
    except the encoder and the relation edge/node layers."""
    keys = [str(getattr(p, "key", "")) for p in path]
    if any("edge_layer" in k or "node_layer" in k for k in keys):
        return False
    return True


def adapt(config: PARModelConfig, params: PARParams, episode: Episode) -> PARParams:
    """Differentiable MAML inner SGD on the adaptable relation-net weights."""

    def inner(relnet):
        return support_loss(config, PARParams(params.encoder, relnet), episode)

    relnet = params.relnet
    for _ in range(config.num_inner_update_step):
        grads = jax.grad(inner)(relnet)
        if not config.second_order_maml:
            grads = jax.lax.stop_gradient(grads)
        relnet = jax.tree_util.tree_map_with_path(
            lambda path, p, g: p - config.inner_learning_rate * g * (1.0 if _adaptable(path) else 0.0),
            relnet,
            grads,
        )
    return PARParams(params.encoder, relnet)


def episode_loss(config: PARModelConfig, params: PARParams, episode: Episode) -> jnp.ndarray:
    """MAML meta-objective: outer query loss after inner adaptation."""
    adapted = adapt(config, params, episode)
    return query_loss(config, adapted, episode)


def episode_predict(config: PARModelConfig, params: PARParams, episode: Episode) -> jnp.ndarray:
    """Positive-class probabilities over the query set after adaptation."""
    adapted = adapt(config, params, episode)
    _, q_logits, _ = _forward(config, adapted, episode)
    return jax.nn.softmax(q_logits, axis=-1)[:, 1]
