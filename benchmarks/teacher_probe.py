"""Capacity probe: can the student encoder learn the teacher-GNN
embedding under DIRECT supervision?

The meta-gain experiment (benchmarks/meta_gain.py) only moves if the
ADKF/DKT outer objective can steer the encoder toward the teacher's
graph featurization. This probe removes the meta-learning machinery:
train encoder + linear head to regress the 16-d teacher embedding with
plain MSE. If held-out R^2 is high, the architecture/optimizer can
express the teacher and any meta-gain failure is an outer-objective or
hyperparameter problem; if it is low, the student architecture itself
is the bottleneck.

Usage: python benchmarks/teacher_probe.py [--steps 800] [--lr 1e-3] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tasks", type=int, default=8)
    # Default excludes the fingerprint channel: synthetic fps are unique
    # per-molecule noise, i.e. a molecule-ID memorization shortcut — with
    # them the probe reaches train MSE ~2e-4 and NEGATIVE held-out R2.
    ap.add_argument("--features", type=str, default="gnn+fc")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from adkf_ift_tpu.data.episodes import GraphPadSpec, pack_graphs
    from adkf_ift_tpu.models import adkf
    from adkf_ift_tpu.utils.synthetic import _teacher_embed, make_teacher_task

    tasks = [
        make_teacher_task(f"P{i}", num_samples=160, seed=300 + i)
        for i in range(args.tasks)
    ]
    mols = [m for t in tasks for m in t.samples]
    rng = np.random.RandomState(0)
    order = rng.permutation(len(mols))
    mols = [mols[i] for i in order]
    n_test = 160
    test_mols, train_mols = mols[:n_test], mols[n_test:]

    spec = GraphPadSpec.for_graphs(args.batch, nodes_per_graph=48,
                                   edges_per_graph=(80, 32, 16))
    embed = lambda m: _teacher_embed(m.graph.node_features, m.graph.adjacency_lists)

    def batches(mol_list, shuffle_seed=None):
        idx = np.arange(len(mol_list))
        if shuffle_seed is not None:
            np.random.RandomState(shuffle_seed).shuffle(idx)
        for i in range(0, len(idx) - args.batch + 1, args.batch):
            chunk = [mol_list[j] for j in idx[i : i + args.batch]]
            packed = pack_graphs(chunk, spec)
            targets = np.stack([embed(m) for m in chunk]).astype(np.float32)
            yield packed, targets

    from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig

    cfg = adkf.ADKFModelConfig(
        features=CombinedFeatureConfig(used_features=args.features)
    )
    encoder = adkf.make_encoder(cfg)
    probe_packed, _ = next(batches(train_mols, shuffle_seed=0))
    enc_params = encoder.init(jax.random.PRNGKey(0), probe_packed)
    head = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2048, 16)) * 0.02, np.float32
    )
    params = {"enc": enc_params, "head": jnp.asarray(head), "b": jnp.zeros((16,))}

    def loss_fn(p, packed, targets):
        feats = encoder.apply(p["enc"], packed)  # [G, 2048]
        pred = feats @ p["head"] + p["b"]
        mask = packed.graph_mask[:, None]
        return jnp.sum(mask * (pred - targets) ** 2) / jnp.maximum(jnp.sum(mask) * 16, 1.0)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, packed, targets):
        l, g = jax.value_and_grad(loss_fn)(p, packed, targets)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    @jax.jit
    def predict(p, packed):
        return encoder.apply(p["enc"], packed) @ p["head"] + p["b"]

    def test_r2(p):
        preds, tgts = [], []
        for packed, targets in batches(test_mols):
            preds.append(np.asarray(predict(p, packed)))
            tgts.append(targets)
        pred, tgt = np.concatenate(preds), np.concatenate(tgts)
        ss_res = np.sum((pred - tgt) ** 2)
        ss_tot = np.sum((tgt - tgt.mean(0)) ** 2)
        return 1.0 - ss_res / ss_tot

    t0 = time.perf_counter()
    it = None
    for s in range(1, args.steps + 1):
        if it is None:
            it = batches(train_mols, shuffle_seed=s)
        try:
            packed, targets = next(it)
        except StopIteration:
            it = batches(train_mols, shuffle_seed=s)
            packed, targets = next(it)
        params, opt_state, l = step(params, opt_state, packed, targets)
        if s % 100 == 0 or s == args.steps:
            print(
                f"step {s}: mse {float(l):.4f} test R2 {test_r2(params):+.4f}"
                f" ({time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
    print(f"final held-out R2: {test_r2(params):+.4f}")


if __name__ == "__main__":
    main()
