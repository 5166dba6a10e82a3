"""Microbenchmark: flat mega-graph vs dense-block encoder layouts.

Measures forward and forward+backward wall-clock of the full-size
GraphFeatureExtractor (PNA, hidden 128, 8 layers, combined readout 512)
on bench-shaped inputs (320 graphs ~= one 16-task chunk of support 64 +
query 256 at task_chunk=1), with honest device->host synchronization
per step (see CLAUDE.md: block_until_ready under-reports through the
tunnel).

Usage: python benchmarks/encoder_layouts.py [--graphs 320] [--steps 10]
Env: LAYOUTS=flat,dense to select.
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

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from adkf_ift_tpu.data.episodes import GraphPadSpec, pack_graphs
from adkf_ift_tpu.modules.encoder import GraphFeatureExtractor, GraphFeatureExtractorConfig
from adkf_ift_tpu.modules.gnn import GNNConfig
from adkf_ift_tpu.modules.readout import GraphReadoutConfig
from adkf_ift_tpu.ops.dense_block import flat_to_dense
from adkf_ift_tpu.utils.synthetic import make_task


def time_fn(fn, *args, steps=10):
    out = fn(*args)
    float(np.mean(np.asarray(jax.tree.leaves(out)[0])))  # sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
        float(np.mean(np.asarray(jax.tree.leaves(out)[0])))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=320)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--nodes-per-graph", type=int, default=32)
    ap.add_argument("--k", type=str, default="4,3,3")
    args = ap.parse_args()
    layouts = os.environ.get("LAYOUTS", "flat,dense").split(",")

    g = args.graphs
    tasks = [make_task(f"B{i}", num_samples=g // 8, seed=i) for i in range(8)]
    samples = [s for t in tasks for s in t.samples][:g]
    spec = GraphPadSpec.for_graphs(g, args.nodes_per_graph, (56, 16, 8))
    packed = pack_graphs(samples, spec)
    k = tuple(int(x) for x in args.k.split(","))
    dense = flat_to_dense(packed, nodes_per_graph=args.nodes_per_graph, k_per_type=k)

    cfg = GraphFeatureExtractorConfig(
        gnn_config=GNNConfig(remat_blocks=False),
        readout_config=GraphReadoutConfig(),
    )
    model = GraphFeatureExtractor(cfg)
    params = model.init(jax.random.PRNGKey(0), packed)
    n_params = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
    print(f"graphs={g} params={n_params/1e6:.2f}M k={k}", flush=True)

    fwd = jax.jit(lambda p, b: model.apply(p, b))
    grad = jax.jit(lambda p, b: jax.grad(lambda pp: jnp.sum(model.apply(pp, b) ** 2))(p))

    for name, batch in (("flat", packed), ("dense", dense)):
        if name not in layouts:
            continue
        batch = jax.device_put(batch)
        t_f = time_fn(fwd, params, batch, steps=args.steps)
        t_g = time_fn(grad, params, batch, steps=args.steps)
        print(f"{name:6s} forward {t_f*1e3:8.2f} ms   fwd+bwd {t_g*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
