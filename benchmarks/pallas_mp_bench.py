"""Microbenchmark: one PNA message-passing layer (+ output projection),
three implementations at bench shapes (320 graphs, full-size config):

  flat   — production XLA path: RelationalMultiAggrMP on the flat
           mega-graph (gathers + segment ops) + msg_out_projection
  dense  — XLA dense-block path (one-hot matmul gathers, K-axis masked
           reductions) + projection
  pallas — fused Pallas kernel (ops/pallas/message_passing.py): messages
           and aggregates never touch HBM

Forward wall-clock with honest device->host sync per rep.
Usage: python benchmarks/pallas_mp_bench.py [--graphs 320] [--reps 10]
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
from adkf_ift_tpu.modules.gnn import (
    DenseRelationalMultiAggrMP,
    GNNConfig,
    RelationalMultiAggrMP,
)
from adkf_ift_tpu.ops.dense_block import flat_to_dense
from adkf_ift_tpu.ops.pallas.message_passing import (
    fused_multiaggr_mp,
    pack_mp_params,
    slot_minor_onehot,
)
from adkf_ift_tpu.utils.synthetic import make_task


def timed(fn, *args, reps):
    out = fn(*args)
    float(np.mean(np.asarray(jax.tree.leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(np.mean(np.asarray(jax.tree.leaves(out)[0])))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=320)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--nodes-per-graph", type=int, default=40)
    ap.add_argument("--k", type=str, default="5,3,2")
    ap.add_argument("--block-graphs", type=int, default=16)
    args = ap.parse_args()
    g = args.graphs
    k = tuple(int(v) for v in args.k.split(","))

    tasks = [make_task(f"B{i}", num_samples=g // 8, seed=i) for i in range(8)]
    samples = [s for t in tasks for s in t.samples][:g]
    packed = pack_graphs(samples, GraphPadSpec.for_graphs(g, args.nodes_per_graph, (56, 16, 8)))
    dense = flat_to_dense(packed, nodes_per_graph=args.nodes_per_graph, k_per_type=k)

    cfg = GNNConfig(dtype="bfloat16")  # full-size: hidden 128, 4 towers, PNA
    rng = np.random.RandomState(0)
    x_dense = jnp.asarray(
        rng.randn(g, args.nodes_per_graph, cfg.hidden_dim).astype(np.float32)
    ) * jnp.asarray(dense.node_mask)[..., None]
    # Scatter the dense states back into the flat layout for a fair input.
    nm = np.asarray(packed.node_mask) > 0
    xf = np.zeros((packed.node_budget, cfg.hidden_dim), np.float32)
    counts = {}
    n2g = np.asarray(packed.node_to_graph)
    xd = np.asarray(x_dense)
    for i in np.nonzero(nm)[0]:
        gi = n2g[i]
        s = counts.get(gi, 0)
        xf[i] = xd[gi, s]
        counts[gi] = s + 1
    x_flat = jnp.asarray(xf)

    mp_dense = DenseRelationalMultiAggrMP(cfg, use_pna_scalers=True)
    params = mp_dense.init(jax.random.PRNGKey(0), x_dense, dense.in_src, dense.in_mask)["params"]
    agg_dim = 4 * cfg.per_head_dim * 3 * cfg.num_heads
    wp = jnp.asarray(rng.randn(agg_dim, cfg.hidden_dim).astype(np.float32)) * 0.05
    bp = jnp.zeros((cfg.hidden_dim,), jnp.float32)

    @jax.jit
    def run_dense(x):
        a = mp_dense.apply({"params": params}, x, dense.in_src, dense.in_mask)
        return a @ wp.astype(a.dtype) + bp

    mp_flat = RelationalMultiAggrMP(cfg, use_pna_scalers=True)
    # Same params apply: identical module structure/names.

    @jax.jit
    def run_flat(x):
        a = mp_flat.apply(
            {"params": params}, x, packed.edge_sources, packed.edge_targets, packed.edge_mask
        )
        return a @ wp.astype(a.dtype) + bp

    w_msg, b_msg, p_proj, b_proj = pack_mp_params(
        {"mp": params, "msg_out_projection": {"kernel": wp, "bias": bp}},
        cfg.num_edge_types, cfg.num_heads, cfg.per_head_dim, cfg.hidden_dim, True,
    )
    onehot = slot_minor_onehot(dense.in_src, dense.in_mask, dtype=jnp.float32)

    def run_pallas(x):
        return fused_multiaggr_mp(
            x, onehot, w_msg, b_msg, p_proj, b_proj,
            k_per_type=k, use_pna=True, block_graphs=args.block_graphs,
        )

    layers = int(os.environ.get("LAYERS", "8"))
    for name, fn, xin in (
        ("flat", run_flat, x_flat),
        ("dense", run_dense, x_dense),
        ("pallas", run_pallas, x_dense),
    ):
        if name not in os.environ.get("LAYOUTS", "flat,dense,pallas").split(","):
            continue
        # Chain LAYERS applications and reduce to a scalar inside the jit
        # so the device->host sync moves O(4) bytes — the tunnel's d2h
        # path is slow enough to swamp single-layer timings otherwise.
        def chained(x, f=fn):
            for _ in range(layers):
                x = f(x)[..., : x.shape[-1]].astype(x.dtype)
            return jnp.sum(x)

        cfn = jax.jit(chained)
        ms = timed(cfn, jax.device_put(xin), reps=args.reps)
        print(f"{name:7s} {layers}x MP+proj forward {ms:8.2f} ms", flush=True)
        # GRAD=1: fwd+bwd of the same chain wrt x (the step-time shape:
        # custom_vjp backward per layer incl. in-VMEM recompute). Used to
        # attribute the outer step's encoder share (round-4 perf hunt).
        if os.environ.get("GRAD", "0") == "1":
            # Reduce the gradient to a scalar INSIDE the jit: returning
            # the full [G, N, H] cotangent would add a ~13 MB d2h
            # transfer per rep on the ~35 MB/s tunnel and swamp the
            # kernel timing.
            gfn = jax.jit(lambda x: jnp.sum(jax.grad(chained)(x)))
            ms = timed(gfn, jax.device_put(xin), reps=args.reps)
            print(f"{name:7s} {layers}x MP+proj fwd+bwd {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
