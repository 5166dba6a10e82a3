"""Synthetic molecule-like task generation for tests and benchmarks.

Generates FS-Mol-shaped tasks (typed-edge graphs + fingerprints +
descriptors + labels) with a learnable structure: labels depend on a
random linear functional of mean node features and fingerprint bits, so
models can actually fit them in smoke tests.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from adkf_ift_tpu.data.task import (
    DESCRIPTOR_DIM,
    FINGERPRINT_DIM,
    NUM_EDGE_TYPES,
    NUM_NODE_FEATURES,
    GraphData,
    MoleculeDatapoint,
    Task,
)


# Shared nonlinear structure across ALL synthetic tasks: labels are
# task-specific linear functionals of tanh(P @ fingerprint-bits), where P
# is drawn once from a fixed seed. This mirrors real FS-Mol: tasks share
# chemistry (the encoder can meta-learn the shared featurization) while
# each assay weighs it differently — so meta-training measurably beats a
# fresh-init control in smoke tests.
_SHARED_DIM = 16
_SHARED_PROJ = np.random.RandomState(12345).randn(64, _SHARED_DIM) / 8.0


def make_molecule(
    rng: np.random.RandomState,
    task_name: str,
    weight: np.ndarray,
    min_nodes: int = 8,
    max_nodes: int = 40,
    noise: float = 0.25,
) -> MoleculeDatapoint:
    v = rng.randint(min_nodes, max_nodes + 1)
    node_features = (rng.rand(v, NUM_NODE_FEATURES) > 0.8).astype(np.float32)

    # Chain + a few random extra bonds, split across edge types like real
    # molecules (mostly single bonds).
    chain = np.stack([np.arange(v - 1), np.arange(1, v)], axis=1).astype(np.int32)
    extra_count = rng.randint(0, max(2, v // 4))
    extras = rng.randint(0, v, size=(extra_count, 2)).astype(np.int32)
    extras = extras[extras[:, 0] != extras[:, 1]]
    all_edges = np.concatenate([chain, extras], axis=0)
    type_assign = rng.choice(NUM_EDGE_TYPES, size=len(all_edges), p=[0.8, 0.15, 0.05])
    adjacency = [all_edges[type_assign == t] for t in range(NUM_EDGE_TYPES)]
    adjacency = [a if len(a) else np.zeros((0, 2), np.int32) for a in adjacency]

    # First 64 fingerprint bits are denser and carry the label signal.
    fingerprint = rng.binomial(1, 0.05, size=FINGERPRINT_DIM).astype(np.int32)
    fingerprint[:64] = rng.binomial(1, 0.25, size=64)
    descriptors = rng.randn(DESCRIPTOR_DIM).astype(np.float32)

    fp_w = weight[NUM_NODE_FEATURES : NUM_NODE_FEATURES + _SHARED_DIM]
    hidden = np.tanh((fingerprint[:64] - 0.25) @ _SHARED_PROJ)  # shared featurization
    signal = float(
        node_features.mean(0) @ weight[:NUM_NODE_FEATURES] * 0.5
        + hidden @ fp_w * 2.0
    )
    numeric = float(np.exp(signal + noise * rng.randn()))
    bool_label = bool(signal + noise * rng.randn() > 0.0)

    return MoleculeDatapoint(
        task_name=task_name,
        smiles=f"SYN{rng.randint(10**9)}",
        graph=GraphData(node_features=node_features, adjacency_lists=adjacency),
        numeric_label=numeric,
        bool_label=bool_label,
        fingerprint=fingerprint,
        descriptors=descriptors,
    )


def make_task(
    name: str = "SYNTHETIC",
    num_samples: int = 128,
    seed: int = 0,
    min_nodes: int = 8,
    max_nodes: int = 40,
) -> Task:
    rng = np.random.RandomState(seed)
    weight = rng.randn(NUM_NODE_FEATURES + _SHARED_DIM) * np.sqrt(
        2.0 / (NUM_NODE_FEATURES + _SHARED_DIM)
    )
    samples = [
        make_molecule(rng, name, weight, min_nodes, max_nodes) for _ in range(num_samples)
    ]
    # Guarantee both classes exist.
    if all(s.bool_label for s in samples) or not any(s.bool_label for s in samples):
        flip = samples[0]
        samples[0] = MoleculeDatapoint(
            **{**flip.__dict__, "bool_label": not flip.bool_label}
        )
    return Task(name, samples)


# ---------------------------------------------------------------------------
# Teacher-GNN task family for the meta-gain experiment.
#
# The original generator's label signal lives in the FINGERPRINT bits, so a
# GP on raw ECFP saturates it and meta-training the encoder cannot move the
# metric (round-1 finding). This family puts the signal in GRAPH STRUCTURE
# instead: labels come from a fixed random 2-round message-passing "teacher"
# over the molecular graph (shared across ALL tasks), read out by a
# task-specific weight vector. Fingerprints and descriptors are pure noise.
# A meta-trained encoder can learn the shared teacher featurization; a
# fresh-init encoder (the reference's --use-fresh-param-init control,
# adaptive_dkt_test.py:44-48) cannot, and fingerprints carry nothing.
# ---------------------------------------------------------------------------

_TEACHER_DIM = 16


def _teacher_weights(seed: int = 777):
    r = np.random.RandomState(seed)
    return {
        "w0": r.randn(NUM_NODE_FEATURES, _TEACHER_DIM) * 0.7,
        "wmp": [r.randn(_TEACHER_DIM, _TEACHER_DIM) * (0.9 / np.sqrt(_TEACHER_DIM))
                for _ in range(2 * NUM_EDGE_TYPES)],
        "alpha": r.rand(2 * NUM_EDGE_TYPES) + 0.5,
        "wout": r.randn(2 * _TEACHER_DIM, _TEACHER_DIM) * (1.2 / np.sqrt(2 * _TEACHER_DIM)),
    }


_TEACHER = _teacher_weights()


def _teacher_embed(
    node_features: np.ndarray, adjacency: List[np.ndarray], weights=None
) -> np.ndarray:
    """Fixed random 2-round typed message passing -> graph embedding [16].
    `weights` (default: the shared label teacher) lets probes embed with a
    DIFFERENT random draw — i.e. a fresh-init encoder stand-in."""
    w = _TEACHER if weights is None else weights
    h = np.tanh(node_features @ w["w0"])
    for rnd in range(2):
        agg = np.zeros_like(h)
        for t, edges in enumerate(adjacency):
            wmp = w["wmp"][rnd * NUM_EDGE_TYPES + t]
            a = w["alpha"][rnd * NUM_EDGE_TYPES + t]
            if len(edges):
                msg = h[edges[:, 0]] @ wmp
                np.add.at(agg, edges[:, 1], a * msg)
                msg_b = h[edges[:, 1]] @ wmp
                np.add.at(agg, edges[:, 0], a * msg_b)
        h = np.tanh(h + agg)
    g = np.concatenate([h.mean(0), h.max(0)])
    return np.tanh(g @ w["wout"])


def make_teacher_task(
    name: str = "TEACHER",
    num_samples: int = 160,
    seed: int = 0,
    min_nodes: int = 8,
    max_nodes: int = 40,
    flip_prob: float = 0.02,
    numeric_noise: float = 0.05,
    readout: str = "linear",
    balance_quantile: float = 0.5,
) -> Task:
    """Task whose labels = task-specific readout of the SHARED teacher-GNN
    graph embedding; classes split at the per-task `balance_quantile`
    threshold of the signal (0.5 = median, the original balanced family).

    `readout` selects the task-specific functional of the embedding `e`:
      * "linear" (default): e @ w — the round-2/3 family. A fresh random
        GNN encoder spans nearly the same function class as the random
        teacher, so a GP on fresh-init features can interpolate a LINEAR
        functional from few support points — which made from-scratch
        arms artificially strong on this family (docs/ZOO_BENCH.md).
      * "quadratic": tanh(e@u1) * tanh(e@u2) + 0.5 * (e@u3) — a
        multiplicative (XOR-like) combination. A GP on generic random
        features needs far more support points to interpolate a product
        of two unknown directions, while a meta-trained encoder can
        learn to expose the factors directly; this is the v2 "hard"
        family's discrimination mechanism (VERDICT r3 next-step #3).
    """
    rng = np.random.RandomState(seed)
    w_task = rng.randn(_TEACHER_DIM)
    if readout == "quadratic":
        u1, u2, u3 = (rng.randn(_TEACHER_DIM) for _ in range(3))
    mols, signals = [], []
    for _ in range(num_samples):
        v = rng.randint(min_nodes, max_nodes + 1)
        node_features = (rng.rand(v, NUM_NODE_FEATURES) > 0.6).astype(np.float32)
        chain = np.stack([np.arange(v - 1), np.arange(1, v)], axis=1).astype(np.int32)
        extra_count = rng.randint(1, max(2, v // 3))
        extras = rng.randint(0, v, size=(extra_count, 2)).astype(np.int32)
        extras = extras[extras[:, 0] != extras[:, 1]]
        all_edges = np.concatenate([chain, extras], axis=0)
        type_assign = rng.choice(NUM_EDGE_TYPES, size=len(all_edges), p=[0.8, 0.15, 0.05])
        adjacency = [all_edges[type_assign == t] for t in range(NUM_EDGE_TYPES)]
        adjacency = [a if len(a) else np.zeros((0, 2), np.int32) for a in adjacency]

        e = _teacher_embed(node_features, adjacency)
        if readout == "quadratic":
            signal = float(
                np.tanh(e @ u1) * np.tanh(e @ u2) * 3.0 + 0.5 * (e @ u3)
            )
        else:
            signal = float(e @ w_task)
        signals.append(signal)
        mols.append(
            dict(
                task_name=name,
                smiles=f"TCH{rng.randint(10**9)}",
                graph=GraphData(node_features=node_features, adjacency_lists=adjacency),
                # Fingerprints/descriptors are NOISE: fp-only models sit at chance.
                fingerprint=rng.binomial(1, 0.05, size=FINGERPRINT_DIM).astype(np.int32),
                descriptors=rng.randn(DESCRIPTOR_DIM).astype(np.float32),
            )
        )
    signals = np.asarray(signals)
    thresh = float(np.quantile(signals, balance_quantile))
    scale = float(signals.std()) or 1.0
    samples = []
    for mol, s in zip(mols, signals):
        label = bool(s > thresh)
        if rng.rand() < flip_prob:
            label = not label
        # Numeric labels are LOG-NORMAL in the teacher signal (µ=ln 1000):
        # the regression pipeline log-transforms + support-standardizes
        # (data/episodes.build_episode, fs_mol/data/dkt.py:91-97 parity),
        # which recovers the standardized teacher signal exactly; the
        # lognormal spread also passes the reference's numeric-task filter
        # (values positive, not all within [0, 100] —
        # train/evaluation.is_valid_numeric_task).
        z = (s - thresh) / scale + numeric_noise * rng.randn()
        samples.append(
            MoleculeDatapoint(
                numeric_label=float(1000.0 * np.exp(z)),
                bool_label=label,
                **mol,
            )
        )
    return Task(name, samples)


def make_teacher_dataset_dir(
    root: str,
    num_train: int = 24,
    num_valid: int = 6,
    num_test: int = 16,
    samples_per_task: int = 160,
    seed: int = 0,
    family: str = "v1",
) -> str:
    """Write a TEACHER-GNN-family dataset in the FS-Mol directory layout
    (train/valid/test of JSONL.gz task files) so every family's own
    train/test CLI can run the full L1→L7 path on it.

    Task seeds follow benchmarks/meta_gain.py's split convention
    (train 100+, valid 5500+, test 9000+) so CLI-trained models are
    directly comparable with the meta-gain arms. Fingerprints and
    descriptors are per-molecule NOISE in this family — use
    `--features gnn+fc` (see meta_gain.py's rationale: an fp channel
    lets the encoder memorize molecule→label and collapse).

    `family="v2"` is the DISCRIMINATIVE regime (VERDICT r3 next-step
    #3): quadratic task readouts (see make_teacher_task), 10% label
    flips, and per-task base-rate jitter (threshold quantile ~
    U[0.35, 0.65], deterministic in the task seed). Flipped labels make
    from-scratch support fits overfit at small support the way real
    assay noise does, and the multiplicative readout removes the
    fresh-init inflation of the v1 family; callers should pair it with
    ≥96 train tasks."""
    folds = (
        ("train", num_train, "TR", 100),
        ("valid", num_valid, "VA", 5500),
        ("test", num_test, "TE", 9000),
    )
    for fold, count, prefix, base in folds:
        os.makedirs(os.path.join(root, fold), exist_ok=True)
        for i in range(count):
            task_seed = base + seed + i
            kwargs = {}
            if family == "v2":
                q = np.random.RandomState(task_seed ^ 0x5EED).uniform(0.35, 0.65)
                kwargs = dict(
                    readout="quadratic", flip_prob=0.10, balance_quantile=float(q)
                )
            task = make_teacher_task(
                f"{prefix}{i}", num_samples=samples_per_task, seed=task_seed, **kwargs
            )
            task.save_to_file(os.path.join(root, fold, f"{task.name}.jsonl.gz"))
    return root


def make_dataset_dir(
    root: str,
    num_train: int = 4,
    num_valid: int = 2,
    num_test: int = 2,
    samples_per_task: int = 96,
    seed: int = 0,
) -> str:
    """Write a synthetic FS-Mol-layout dataset directory."""
    idx = 0
    for fold, count in (("train", num_train), ("valid", num_valid), ("test", num_test)):
        os.makedirs(os.path.join(root, fold), exist_ok=True)
        for i in range(count):
            task = make_task(f"SYN{fold.upper()}{i}", samples_per_task, seed=seed + idx)
            task.save_to_file(os.path.join(root, fold, f"{task.name}.jsonl.gz"))
            idx += 1
    return root
