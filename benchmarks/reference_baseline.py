"""Measured reference baseline: torch-CPU per-component timing of the
reference ADKF-IFT outer training step.

Round-1's `vs_baseline` used a literature estimate (0.2 outer steps/s on
a V100-class GPU) because the reference's gpytorch/botorch/torch_scatter
deps are not installed in this image. This harness replaces the estimate
with a MEASUREMENT: it reconstructs the reference's exact outer-step
algorithm (fs_mol/utils/adaptive_dkt_utils.py:352-413) in plain torch at
the reference's published architecture and the bench episode shapes, and
times it on the hardware we have (CPU; torch has no CUDA here).

Mirrored structure, component by component (reference file:line):
  * sequential 16-task Python loop, per-task fresh encode
    (adaptive_dkt_utils.py:361-403)
  * PNA GNN encoder: 8 blocks, hidden 128, 4 towers x 32, per-edge-type
    message MLPs, sum/mean/std/max + PNA scalers, ReZero + BOOM 512
    (modules/gnn.py:17-28,180-266), combined readout over all 9 states
    with 12 heads x 64 -> 512 (modules/graph_readout.py:120-178), ECFP
    2048 concat, FC 2560->2048->2048 (models/adaptive_dkt.py:50-65)
  * per-task GP re-init with median-heuristic lengthscale + LogNormal
    priors (models/adaptive_dkt.py:88-101), scipy L-BFGS-B fit of the
    exact Matern-5/2 MLL over {raw_lengthscale, raw_outputscale,
    raw_noise} a la botorch.fit_gpytorch_scipy
    (adaptive_dkt_utils.py:90-91)
  * cauchy hypergradient: torch.autograd.functional.hessian over the 3
    inner params THROUGH the support encode, mixed partials via
    jacobian-of-jacobian, predictive val loss on the query, dense solve
    + correction (utils/cauchy_hypergradient.py:44-161)
  * Adam + grad clip on the accumulated feature-extractor grads
    (adaptive_dkt_utils.py:405-413)

Differences forced by the environment (all favor the REFERENCE, so the
measured number is an upper bound on its speed):
  * torch-native index_add_/scatter_reduce instead of torch_scatter
    (same asymptotics; torch_scatter is not faster on CPU)
  * the Matern MLL/priors are hand-written (cross-checked math from
    tests/test_torch_crosscheck.py) instead of gpytorch's lazy-tensor
    machinery, which adds overhead the real reference would pay
  * scipy L-BFGS-B iteration cap 100 (botorch default maxiter=100)

Usage: python benchmarks/reference_baseline.py [--tasks 16] [--steps 2]
Prints one JSON line with measured seconds/outer-step and steps/s, and a
per-component breakdown.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch
import torch.nn as nn
from scipy import optimize

from adkf_ift_tpu.data.samplers import StratifiedTaskSampler
from adkf_ift_tpu.data.task import NUM_EDGE_TYPES, NUM_NODE_FEATURES
from adkf_ift_tpu.utils.synthetic import make_task

SMALL = 1e-7
PNA_DELTA = 1.1515


# ---------------------------------------------------------------------------
# Reference-architecture encoder in plain torch (CPU).
# ---------------------------------------------------------------------------


class EdgeTypeMessages(nn.Module):
    """Per-edge-type, per-tower message MLP: [E, towers, 2*td] -> [E, towers, 3m]."""

    def __init__(self, towers: int, in_dim: int, out_dim: int):
        super().__init__()
        self.w = nn.Parameter(torch.randn(towers, in_dim, out_dim) * (in_dim**-0.5))
        self.b = nn.Parameter(torch.zeros(towers, out_dim))

    def forward(self, x):
        return torch.einsum("eti,tio->eto", x, self.w) + self.b


class PNABlock(nn.Module):
    """One reference GNNBlock: PNA message passing + ReZero + BOOM
    (reference modules/gnn.py:180-266,390-515)."""

    def __init__(self, hidden: int = 128, towers: int = 4, m: int = 32, boom: int = 512):
        super().__init__()
        self.hidden, self.towers, self.m = hidden, towers, m
        td = hidden // towers
        self.msgs = nn.ModuleList(
            [EdgeTypeMessages(towers, 2 * td, 3 * m) for _ in range(NUM_EDGE_TYPES)]
        )
        self.proj = nn.Linear(towers * 12 * m, hidden)
        self.boom_norm = nn.LayerNorm(hidden)
        self.boom1 = nn.Linear(hidden, boom)
        self.boom2 = nn.Linear(boom, hidden)
        self.alpha = nn.Parameter(torch.full((1,), SMALL))

    def forward(self, x, edges_by_type):
        V = x.shape[0]
        towers, m = self.towers, self.m
        td = self.hidden // towers
        all_msgs, all_tgts = [], []
        for t, (src, tgt) in enumerate(edges_by_type):
            pair = torch.cat(
                [
                    x[src].reshape(-1, towers, td),
                    x[tgt].reshape(-1, towers, td),
                ],
                dim=-1,
            )
            all_msgs.append(self.msgs[t](pair))  # [Et, towers, 3m]
            all_tgts.append(tgt)
        msgs = torch.cat(all_msgs, 0)  # [E, towers, 3m]
        tgts = torch.cat(all_tgts, 0)  # [E]

        sum_part = msgs[..., :m]
        mean_part = msgs[..., m : 2 * m]
        max_part = msgs[..., 2 * m :]

        def scat_sum(src):
            out = torch.zeros(V, towers, m, dtype=src.dtype)
            return out.index_add(0, tgts, src)

        deg = torch.zeros(V).index_add(0, tgts, torch.ones_like(tgts, dtype=torch.float32))
        agg_sum = scat_sum(sum_part)
        agg_mean = scat_sum(mean_part) / deg.clamp(min=1.0)[:, None, None]
        var = torch.relu(mean_part.pow(2) - agg_mean[tgts].pow(2)) + SMALL
        agg_std = torch.sqrt(scat_sum(var))
        agg_max = (
            torch.full((V, towers, m), -torch.inf)
            .scatter_reduce(0, tgts[:, None, None].expand_as(max_part), max_part, "amax")
            .nan_to_num(neginf=0.0)
        )
        agg = torch.cat([agg_sum, agg_mean, agg_std, agg_max], dim=-1)  # [V, towers, 4m]
        logd = torch.log1p(deg)[:, None, None]
        agg = torch.cat(
            [agg, agg * (logd / PNA_DELTA), agg * (PNA_DELTA / (logd + SMALL))], dim=-1
        )  # [V, towers, 12m]
        new = self.proj(agg.reshape(V, -1))
        x = x + self.alpha * new
        h = self.boom2(torch.nn.functional.leaky_relu(self.boom1(self.boom_norm(x))))
        return x + self.alpha * h


class CombinedReadout(nn.Module):
    """Reference combined readout (graph_readout.py:120-178): weighted_mean
    + weighted_sum (12 heads x 64) + unweighted max, ReLU, combine."""

    def __init__(self, node_dim: int, out_dim: int = 512, heads: int = 12, head_dim: int = 64):
        super().__init__()
        hd = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.score_ws = nn.Sequential(nn.Linear(node_dim, hd), nn.ReLU(), nn.Linear(hd, heads))
        self.trans_ws = nn.Linear(node_dim, hd)
        self.out_ws = nn.Linear(hd, out_dim)
        self.score_wm = nn.Sequential(nn.Linear(node_dim, hd), nn.ReLU(), nn.Linear(hd, heads))
        self.trans_wm = nn.Linear(node_dim, hd)
        self.out_wm = nn.Linear(hd, out_dim)
        self.trans_max = nn.Linear(node_dim, out_dim)
        self.combine = nn.Linear(3 * out_dim, out_dim, bias=False)

    def _weighted(self, x, graph_ids, num_graphs, score_mod, trans, out, mean: bool):
        scores = score_mod(x)  # [V, heads]
        if mean:
            smax = torch.full((num_graphs, self.heads), -torch.inf).scatter_reduce(
                0, graph_ids[:, None].expand_as(scores), scores, "amax"
            )
            ex = torch.exp(scores - smax[graph_ids])
            denom = torch.zeros(num_graphs, self.heads).index_add(0, graph_ids, ex)
            w = ex / denom[graph_ids].clamp(min=SMALL)
        else:
            w = torch.sigmoid(scores)
        vals = trans(x).reshape(-1, self.heads, self.head_dim) * w[..., None]
        pooled = torch.zeros(num_graphs, self.heads, self.head_dim).index_add(
            0, graph_ids, vals
        )
        return out(pooled.reshape(num_graphs, -1))

    def forward(self, x, graph_ids, num_graphs):
        wm = self._weighted(x, graph_ids, num_graphs, self.score_wm, self.trans_wm, self.out_wm, True)
        ws = self._weighted(x, graph_ids, num_graphs, self.score_ws, self.trans_ws, self.out_ws, False)
        mx = torch.full((num_graphs, self.trans_max.out_features), -torch.inf).scatter_reduce(
            0, graph_ids[:, None].expand(-1, self.trans_max.out_features), self.trans_max(x), "amax"
        )
        return self.combine(torch.relu(torch.cat([wm, ws, mx], dim=1)))


class ReferenceEncoder(nn.Module):
    """GNN(8xPNA, all-states combined readout) (+) ECFP -> FC 2048->2048
    (models/adaptive_dkt.py:40-65, graph_feature_extractor.py)."""

    def __init__(self, hidden: int = 128, layers: int = 8):
        super().__init__()
        self.embed = nn.Linear(NUM_NODE_FEATURES, hidden)
        self.blocks = nn.ModuleList([PNABlock(hidden) for _ in range(layers)])
        node_repr_dim = hidden * (layers + 1)  # use_all_states
        self.readout = CombinedReadout(node_repr_dim, 512)
        self.fc = nn.Sequential(nn.Linear(512 + 2048, 2048), nn.ReLU(), nn.Linear(2048, 2048))

    def forward(self, node_feats, edges_by_type, graph_ids, num_graphs, fingerprints):
        x = self.embed(node_feats)
        states = [x]
        for blk in self.blocks:
            x = blk(x, edges_by_type)
            states.append(x)
        g = self.readout(torch.cat(states, dim=1), graph_ids, num_graphs)
        return self.fc(torch.cat([g, fingerprints], dim=1))


# ---------------------------------------------------------------------------
# Exact Matern-5/2 GP MLL + LogNormal priors (gp_utils.py:7-49,
# adaptive_dkt.py:88-127); math cross-checked in tests/test_torch_crosscheck.py.
# ---------------------------------------------------------------------------


def softplus(x):
    return torch.nn.functional.softplus(x)


def matern52(x1, x2, lengthscale, outputscale):
    d = torch.cdist(x1 / lengthscale, x2 / lengthscale).clamp(min=1e-12)
    s5 = np.sqrt(5.0) * d
    return outputscale * (1.0 + s5 + s5.pow(2) / 3.0) * torch.exp(-s5)


def gp_inner_loss(feats, y, raw_l, raw_o, raw_n, median_l):
    """-(MLL + log prior)/n on the support set, reference parameterization
    (raw params through softplus; LogNormal priors on noise & lengthscale)."""
    n = feats.shape[0]
    ls = softplus(raw_l) * median_l
    os_ = softplus(raw_o)
    noise = softplus(raw_n)
    K = matern52(feats, feats, ls, os_) + (noise + 1e-6) * torch.eye(n)
    L = torch.linalg.cholesky(K)
    alpha = torch.cholesky_solve(y[:, None], L)[:, 0]
    mll = -0.5 * (y @ alpha) - torch.log(torch.diagonal(L)).sum() - 0.5 * n * np.log(2 * np.pi)
    scale = 0.25
    logn = lambda v, loc: -((torch.log(v) - loc) ** 2) / (2 * scale**2) - torch.log(v)
    prior = logn(noise, np.log(0.1) + scale**2) + logn(ls / median_l, scale**2)
    return -(mll + prior) / n


def fit_gp_scipy(feats, y, median_l):
    """scipy L-BFGS-B over the 3 raw params (a la botorch fit_gpytorch_scipy,
    adaptive_dkt_utils.py:91). Features detached (the reference's inner fit
    holds the extracted features fixed). Returns (params, n_iters)."""
    feats = feats.detach()
    y = y.detach()

    def val_and_grad(z):
        raws = [torch.tensor(v, requires_grad=True, dtype=torch.float64) for v in z]
        loss = gp_inner_loss(feats.double(), y.double(), *raws, median_l)
        loss.backward()
        return float(loss), np.array([float(r.grad) for r in raws])

    z0 = np.array([np.log(np.e - 1.0)] * 2 + [np.log(np.exp(0.1) - 1.0)])
    res = optimize.minimize(
        val_and_grad, z0, jac=True, method="L-BFGS-B", options={"maxiter": 100}
    )
    return torch.tensor(res.x, dtype=torch.float32), int(res.nit)


def predictive_val_loss(sf, qf, sy, qy, raw_l, raw_o, raw_n, median_l):
    """-sum log p(y_q | support) under the fitted GP posterior + Gaussian
    likelihood (adaptive_dkt.py:183-190)."""
    n = sf.shape[0]
    ls = softplus(raw_l) * median_l
    os_ = softplus(raw_o)
    noise = softplus(raw_n) + 1e-6
    K = matern52(sf, sf, ls, os_) + noise * torch.eye(n)
    L = torch.linalg.cholesky(K)
    Ksq = matern52(sf, qf, ls, os_)
    alpha = torch.cholesky_solve(sy[:, None], L)[:, 0]
    mean = Ksq.T @ alpha
    v = torch.cholesky_solve(Ksq, L)
    var = os_ + noise - (Ksq * v).sum(0)
    return 0.5 * (
        torch.log(2 * np.pi * var) + (qy - mean).pow(2) / var
    ).sum()


# ---------------------------------------------------------------------------
# Episode plumbing: our synthetic molecules -> torch edge lists
# (pre-bidirectionalized like the reference batcher).
# ---------------------------------------------------------------------------


def episode_tensors(task, seed, support, query):
    sample = StratifiedTaskSampler(support, test_size_or_ratio=query).sample(task, seed)

    def pack(mols):
        feats, fps, labels = [], [], []
        edges = [[] for _ in range(NUM_EDGE_TYPES)]
        gids = []
        off = 0
        for gi, mol in enumerate(mols):
            v = mol.graph.node_features.shape[0]
            feats.append(mol.graph.node_features)
            fps.append(mol.fingerprint)
            labels.append(1.0 if mol.bool_label else -1.0)
            gids.append(np.full(v, gi))
            for t, adj in enumerate(mol.graph.adjacency_lists):
                if len(adj):
                    e = adj + off
                    edges[t].append(np.concatenate([e, e[:, ::-1]], 0))  # bidirectional
            off += v
        ebt = []
        for t in range(NUM_EDGE_TYPES):
            e = np.concatenate(edges[t], 0) if edges[t] else np.zeros((0, 2), np.int64)
            ebt.append(
                (torch.as_tensor(e[:, 0], dtype=torch.int64), torch.as_tensor(e[:, 1], dtype=torch.int64))
            )
        return {
            "feats": torch.as_tensor(np.concatenate(feats, 0), dtype=torch.float32),
            "edges": ebt,
            "gids": torch.as_tensor(np.concatenate(gids, 0), dtype=torch.int64),
            "num_graphs": len(mols),
            "fps": torch.as_tensor(np.stack(fps), dtype=torch.float32),
            "labels": torch.as_tensor(np.array(labels), dtype=torch.float32),
        }

    return pack(sample.train_samples), pack(sample.test_samples)


# ---------------------------------------------------------------------------
# The reference outer step (adaptive_dkt_utils.py:352-413).
# ---------------------------------------------------------------------------


def run(tasks_per_batch=16, support=64, query=256, steps=2):
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    model = ReferenceEncoder()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    episodes = [
        episode_tensors(
            make_task(f"BENCH{i}", num_samples=support + query + 64, seed=i), i, support, query
        )
        for i in range(tasks_per_batch)
    ]

    timers = {"encode": 0.0, "gp_fit": 0.0, "hypergrad": 0.0, "outer_bwd": 0.0, "opt": 0.0}
    nits = []

    t_total = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        grad_accum = [torch.zeros_like(p) for p in model.parameters()]
        for sup, qry in episodes:
            # --- encode support (GP re-init + inner fit hold features fixed)
            t0 = time.perf_counter()
            sfeat = model(sup["feats"], sup["edges"], sup["gids"], sup["num_graphs"], sup["fps"])
            with torch.no_grad():
                d2 = torch.cdist(sfeat, sfeat).pow(2)
                d2 = torch.triu(d2, diagonal=1)
                median_l = float(torch.sqrt(0.5 * torch.median(d2[d2 > 0])))
            timers["encode"] += time.perf_counter() - t0

            # --- scipy L-BFGS-B inner fit (fit_gpytorch_scipy)
            t0 = time.perf_counter()
            gp_raw, nit = fit_gp_scipy(sfeat, sup["labels"], median_l)
            nits.append(nit)
            timers["gp_fit"] += time.perf_counter() - t0

            # --- cauchy hypergradient: Hessian through the support encode
            t0 = time.perf_counter()
            raws = [r.clone().requires_grad_(True) for r in gp_raw]

            def f_inner(*r):
                sf = model(
                    sup["feats"], sup["edges"], sup["gids"], sup["num_graphs"], sup["fps"]
                )
                return gp_inner_loss(sf, sup["labels"], *r, median_l)

            H = torch.autograd.functional.hessian(f_inner, tuple(raws))
            H = torch.stack([torch.stack([H[i][j] for j in range(3)]) for i in range(3)])
            # mixed partials: d/d(outer) of the inner grad — jacobian rows
            # backprop through the encoder with create_graph
            gin = torch.autograd.grad(f_inner(*raws), raws, create_graph=True)
            mixed = [
                torch.autograd.grad(
                    g, list(model.parameters()), retain_graph=True, allow_unused=True
                )
                for g in gin
            ]
            timers["hypergrad"] += time.perf_counter() - t0

            # --- outer (predictive val) loss + backward + correction
            t0 = time.perf_counter()
            sfeat2 = model(sup["feats"], sup["edges"], sup["gids"], sup["num_graphs"], sup["fps"])
            qfeat = model(qry["feats"], qry["edges"], qry["gids"], qry["num_graphs"], qry["fps"])
            raws2 = [r.clone().requires_grad_(True) for r in gp_raw]
            outer = predictive_val_loss(
                sfeat2, qfeat, sup["labels"], qry["labels"], *raws2, median_l
            )
            outer.backward()
            dfo_dinner = torch.stack([r.grad for r in raws2])
            v = torch.linalg.solve(H.double(), dfo_dinner.double()).float()
            for pi, p in enumerate(model.parameters()):
                corr = sum(
                    v[k] * mixed[k][pi] for k in range(3) if mixed[k][pi] is not None
                )
                g = p.grad if p.grad is not None else torch.zeros_like(p)
                grad_accum[pi] += (g - corr) / tasks_per_batch
                p.grad = None
            timers["outer_bwd"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        for p, g in zip(model.parameters(), grad_accum):
            p.grad = g
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        timers["opt"] += time.perf_counter() - t0
    total = time.perf_counter() - t_total

    sec_per_step = total / steps
    print(
        json.dumps(
            {
                "metric": "reference_outer_step_torch_cpu",
                "sec_per_step": round(sec_per_step, 3),
                "steps_per_sec": round(1.0 / sec_per_step, 4),
                "tasks_per_batch": tasks_per_batch,
                "support": support,
                "query": query,
                "mean_lbfgsb_iters": float(np.mean(nits)),
                "breakdown_sec_per_step": {k: round(v / steps, 3) for k, v in timers.items()},
                "torch_threads": torch.get_num_threads(),
            }
        )
    )
    return sec_per_step


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", type=int, default=16)
    ap.add_argument("--support", type=int, default=64)
    ap.add_argument("--query", type=int, default=256)
    ap.add_argument("--steps", type=int, default=2)
    a = ap.parse_args()
    run(a.tasks, a.support, a.query, a.steps)
