"""Hu-et-al-style molecular GNN encoders for MoleculeNet — parity with
MoleculeNet/chem_lib/models/encoder.py:202-348 (GNN + GNN_Encoder): atom
embeddings (atomic number + chirality), per-layer bond embeddings (bond
type + direction), GIN / GCN / GraphSAGE message passing with BatchNorm
and JK aggregation, mean graph pooling to emb_dim.

The reference optionally loads supervised-contextpred pretrained torch
weights (.pth in chem_lib/model_gin/); `load_pretrained_torch_weights`
maps those tensors into this module's parameter tree when a checkpoint
is available."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adkf_ift_tpu.moleculenet.data import (
    NUM_ATOM_TYPES,
    NUM_BOND_DIRS,
    NUM_BOND_TYPES,
    NUM_CHIRALITY,
    PackedMolNetGraphs,
)
from adkf_ift_tpu.ops.segment import segment_mean, segment_sum


@dataclass(frozen=True)
class MolNetEncoderConfig:
    gnn_type: str = "gin"  # gin | gcn | gat | graphsage
    num_layers: int = 5
    emb_dim: int = 300
    jk: str = "last"  # last | sum
    dropout: float = 0.0
    graph_pooling: str = "mean"
    batch_norm: bool = True
    gat_heads: int = 2  # reference GATConv(heads=2), encoder.py:107
    gat_negative_slope: float = 0.2

SELF_LOOP_BOND_TYPE = 4  # reference encoder.py:139-141 (bond type 4, dir 0)


class _MaskedBatchNorm(nn.Module):
    """BatchNorm over real nodes only (padded rows would skew stats)."""

    dim: int

    @nn.compact
    def __call__(self, x, mask):
        m = mask[:, None]
        count = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x * m, axis=0, keepdims=True) / count
        var = jnp.sum(((x - mean) ** 2) * m, axis=0, keepdims=True) / count
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return ((x - mean) / jnp.sqrt(var + 1e-5)) * scale + bias


class MolNetEncoder(nn.Module):
    config: MolNetEncoderConfig

    @nn.compact
    def __call__(self, batch: PackedMolNetGraphs, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        d = cfg.emb_dim
        x = (
            nn.Embed(NUM_ATOM_TYPES, d, name="atom_embedding")(batch.atom_type)
            + nn.Embed(NUM_CHIRALITY, d, name="chirality_embedding")(batch.chirality)
        )
        num_nodes = x.shape[0]
        states = [x]
        for layer in range(cfg.num_layers):
            # GAT projects to heads*d before messaging (GATConv.weight_linear,
            # reference encoder.py:117); its bond embeddings live at that width.
            ew = cfg.gat_heads * d if cfg.gnn_type == "gat" else d
            bond_embed = nn.Embed(NUM_BOND_TYPES, ew, name=f"bond_embedding{layer}")
            dir_embed = nn.Embed(NUM_BOND_DIRS, ew, name=f"bond_dir_embedding{layer}")
            edge_emb = bond_embed(batch.bond_type) + dir_embed(batch.bond_dir)
            src_feats = x[batch.edge_sources] + edge_emb if cfg.gnn_type != "gat" else None
            if cfg.gnn_type == "gin":
                agg = segment_sum(src_feats, batch.edge_targets, num_nodes, batch.edge_mask)
                eps = self.param(f"gin_eps{layer}", nn.initializers.zeros, (1,))
                h = (1.0 + eps) * x + agg
                h = nn.Dense(2 * d, name=f"mlp{layer}_1")(h)
                h = nn.relu(h)
                h = nn.Dense(d, name=f"mlp{layer}_2")(h)
            elif cfg.gnn_type == "gcn":
                deg = segment_sum(batch.edge_mask, batch.edge_targets, num_nodes) + 1.0
                agg = segment_sum(src_feats, batch.edge_targets, num_nodes, batch.edge_mask)
                h = nn.Dense(d, name=f"lin{layer}")((x + agg) / deg[:, None])
            elif cfg.gnn_type == "gat":
                # Reference GATConv (encoder.py:107-164): project to
                # [V, heads, d]; messages = x_src + bond_emb; attention
                # logits from att * [x_tgt || msg]; leaky_relu; softmax per
                # target INCLUDING a self-loop edge (bond type 4, dir 0);
                # mean over heads + bias. Static-padded: the self-loop term
                # is handled closed-form instead of materializing V edges.
                H = cfg.gat_heads
                xp = nn.Dense(H * d, name=f"gat_lin{layer}")(x).reshape(num_nodes, H, d)
                att = self.param(
                    f"gat_att{layer}", nn.initializers.xavier_uniform(), (H, 2 * d)
                )
                bias = self.param(f"gat_bias{layer}", nn.initializers.zeros, (d,))
                msg = xp[batch.edge_sources] + edge_emb.reshape(-1, H, d)  # [E, H, d]
                tgt_part = jnp.einsum("vhd,hd->vh", xp, att[:, :d])  # [V, H]
                src_part = jnp.einsum("ehd,hd->eh", msg, att[:, d:])  # [E, H]
                logits = nn.leaky_relu(
                    tgt_part[batch.edge_targets] + src_part, cfg.gat_negative_slope
                )
                # self-loop message/logit per node
                self_emb = (
                    bond_embed(jnp.full((1,), SELF_LOOP_BOND_TYPE, jnp.int32))
                    + dir_embed(jnp.zeros((1,), jnp.int32))
                ).reshape(1, H, d)
                m_self = xp + self_emb  # [V, H, d]
                l_self = nn.leaky_relu(
                    tgt_part + jnp.einsum("vhd,hd->vh", m_self, att[:, d:]),
                    cfg.gat_negative_slope,
                )
                from adkf_ift_tpu.ops.segment import segment_max

                mx = jnp.maximum(
                    segment_max(logits, batch.edge_targets, num_nodes,
                                batch.edge_mask, empty_value=-jnp.inf),
                    l_self,
                )
                ex = jnp.exp(logits - mx[batch.edge_targets]) * batch.edge_mask[:, None]
                ex_self = jnp.exp(l_self - mx)
                denom = segment_sum(ex, batch.edge_targets, num_nodes) + ex_self
                num = (
                    segment_sum(ex[..., None] * msg, batch.edge_targets, num_nodes)
                    + ex_self[..., None] * m_self
                )
                h = (num / jnp.maximum(denom, 1e-16)[..., None]).mean(axis=1) + bias
            elif cfg.gnn_type == "graphsage":
                agg = segment_mean(src_feats, batch.edge_targets, num_nodes, batch.edge_mask)
                h = nn.Dense(d, name=f"lin{layer}")(jnp.concatenate([x, agg], axis=-1))
                h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
            else:
                raise ValueError(f"unknown gnn_type {cfg.gnn_type}")

            if cfg.batch_norm:
                h = _MaskedBatchNorm(d, name=f"bn{layer}")(h, batch.node_mask)
            if layer < cfg.num_layers - 1:
                h = nn.relu(h)
            h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
            x = h
            states.append(x)

        node_repr = x if cfg.jk == "last" else sum(states[1:])
        num_graphs = batch.num_graphs
        pooled = segment_mean(node_repr, batch.node_to_graph, num_graphs + 1, batch.node_mask)
        return pooled[:num_graphs] * batch.graph_mask[:, None]


def load_pretrained_torch_weights(params, pth_path: str):
    """Map a Hu-et-al pretrained torch state dict (chem_lib/model_gin/*.pth)
    into this encoder's parameter tree (GIN layout). Requires torch."""
    import torch

    state = torch.load(pth_path, map_location="cpu")
    out = jax.tree.map(np.asarray, params)
    p = out["params"]

    def put(dst_scope, dst_name, tensor, transpose=False):
        arr = tensor.detach().numpy()
        if transpose:
            arr = arr.T
        if dst_scope in p and dst_name in p[dst_scope]:
            assert p[dst_scope][dst_name].shape == arr.shape, (dst_scope, dst_name)
            p[dst_scope][dst_name] = arr

    put("atom_embedding", "embedding", state["x_embedding1.weight"])
    put("chirality_embedding", "embedding", state["x_embedding2.weight"])
    for l in range(5):
        pre = f"gnns.{l}"
        if f"{pre}.edge_embedding1.weight" not in state:
            break
        put(f"bond_embedding{l}", "embedding", state[f"{pre}.edge_embedding1.weight"])
        put(f"bond_dir_embedding{l}", "embedding", state[f"{pre}.edge_embedding2.weight"])
        put(f"mlp{l}_1", "kernel", state[f"{pre}.mlp.0.weight"], transpose=True)
        put(f"mlp{l}_1", "bias", state[f"{pre}.mlp.0.bias"])
        put(f"mlp{l}_2", "kernel", state[f"{pre}.mlp.2.weight"], transpose=True)
        put(f"mlp{l}_2", "bias", state[f"{pre}.mlp.2.bias"])
        put(f"bn{l}", "scale", state[f"batch_norms.{l}.weight"])
        put(f"bn{l}", "bias", state[f"batch_norms.{l}.bias"])
    return out
