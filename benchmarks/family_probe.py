"""CPU probe: does the v2 ("hard") teacher family actually discriminate
meta-learned features from fresh-init features, where v1 does not?

Round-3 VERDICT (weak #1 / next-step #3): the v1 zoo ranking inverts the
reference's because (a) a fresh random GNN encoder spans nearly the same
function class as the random LINEAR-readout teacher, and (b) near-
noiseless labels let from-scratch support fits win. Before burning TPU
hours retraining the zoo on a new family, this probe measures the
mechanism directly with sklearn stand-ins on the exact features the two
encoder states would expose:

  * ORACLE arm  — features = the label teacher's own embedding e [16]
    (the best a meta-trained encoder could recover);
  * FRESH arm   — features = an INDEPENDENT random teacher's embedding
    (what a fresh-init GNN encoder of the same family exposes);
  * head       — per-episode logistic fit on the support -> query
    ΔAUPRC (the smooth-interpolator role the GP head plays).

Discrimination = oracle - fresh gap at small support. Expected: ~0 gap
on v1 (the documented inflation), large gap on v2 (quadratic readout +
10% flips + base-rate jitter).

Usage: JAX-free; runs in ~1 min on the 1-core host.
"""

from __future__ import annotations

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sklearn.linear_model import LogisticRegression
from sklearn.metrics import average_precision_score

from adkf_ift_tpu.utils import synthetic as syn


def episode_scores(feats, labels, support, seed, model_c=1.0):
    rng = np.random.RandomState(seed)
    pos = np.flatnonzero(labels)
    neg = np.flatnonzero(~labels)
    n_pos = max(1, int(round(support * len(pos) / len(labels))))
    n_pos = min(n_pos, support - 1, len(pos))
    n_neg = min(support - n_pos, len(neg))
    sup = np.concatenate([
        rng.choice(pos, n_pos, replace=False), rng.choice(neg, n_neg, replace=False)
    ])
    mask = np.zeros(len(labels), bool)
    mask[sup] = True
    if labels[mask].all() or not labels[mask].any():
        return None
    clf = LogisticRegression(C=model_c, max_iter=2000)
    clf.fit(feats[mask], labels[mask])
    p = clf.predict_proba(feats[~mask])[:, 1]
    yq = labels[~mask]
    if yq.all() or not yq.any():
        return None
    return average_precision_score(yq, p) - yq.mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-tasks", type=int, default=8)
    ap.add_argument("--samples", type=int, default=288)
    ap.add_argument("--supports", default="16,64,128")
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()
    supports = [int(s) for s in args.supports.split(",")]

    fresh_teacher = syn._teacher_weights(seed=4242)
    # NTK-style stand-in for GNN-ST (training a from-scratch net on the
    # support ~ kernel/linear regression on wide random features at
    # init): 16 independent random teachers -> 256-dim features.
    wide_teachers = [syn._teacher_weights(seed=5000 + i) for i in range(16)]

    for family in ("v1", "v2"):
        kwargs = (
            {}
            if family == "v1"
            else dict(readout="quadratic", flip_prob=0.10)
        )
        rows = {s: {"oracle": [], "fresh": [], "fresh-wide": []} for s in supports}
        for t in range(args.num_tasks):
            if family == "v2":
                q = np.random.RandomState((9000 + t) ^ 0x5EED).uniform(0.35, 0.65)
                kwargs["balance_quantile"] = float(q)
            task = syn.make_teacher_task(
                f"PROBE{t}", num_samples=args.samples, seed=9000 + t, **kwargs
            )
            labels = np.array([s.bool_label for s in task.samples])
            emb_o, emb_f, emb_w = [], [], []
            for s in task.samples:
                nf, adj = s.graph.node_features, s.graph.adjacency_lists
                emb_o.append(syn._teacher_embed(nf, adj))
                emb_f.append(syn._teacher_embed(nf, adj, weights=fresh_teacher))
                emb_w.append(
                    np.concatenate(
                        [syn._teacher_embed(nf, adj, weights=w) for w in wide_teachers]
                    )
                )
            emb_o, emb_f, emb_w = np.stack(emb_o), np.stack(emb_f), np.stack(emb_w)
            for sup in supports:
                for seed in range(args.seeds):
                    for name, feats in (
                        ("oracle", emb_o), ("fresh", emb_f), ("fresh-wide", emb_w)
                    ):
                        d = episode_scores(feats, labels, sup, seed)
                        if d is not None:
                            rows[sup][name].append(d)
        print(f"== family {family}")
        for sup in supports:
            o = np.array(rows[sup]["oracle"])
            f = np.array(rows[sup]["fresh"])
            w = np.array(rows[sup]["fresh-wide"])
            print(
                f"  support {sup:4d}: oracle {o.mean():+.3f}±{o.std()/len(o)**0.5:.3f}"
                f"  fresh {f.mean():+.3f}±{f.std()/len(f)**0.5:.3f}"
                f"  fresh-wide {w.mean():+.3f}±{w.std()/len(w)**0.5:.3f}"
                f"  gap(o-w) {o.mean()-w.mean():+.3f}"
            )


if __name__ == "__main__":
    main()
