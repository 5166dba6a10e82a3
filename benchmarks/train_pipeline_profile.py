"""Profile the REAL training pipeline to localize the bench-vs-train gap.

bench.py reuses one device-resident uncompressed batch (2.03 steps/s on
v5e); real adkf-train feeds fresh compressed episodes through the
two-thread prefetch pipeline and measured 1.7 steps/s (STATUS.md). This
script runs both arms in ONE process at the bench configuration and
breaks the difference down:

  arm A  device-resident COMPRESSED batch, pipeline idle
         -> isolates the on-device decompress + donation-path cost vs
            bench's uncompressed step;
  arm B  full pipeline (fresh episodes, pack caches warm)
         -> per-step wait/dispatch/sync split + per-stage pipeline
            wall-clock (episode assembly, stack+compress, device_put).

Reference hot loop being matched: adaptive_dkt_utils.py:352-413.

Usage:  python benchmarks/train_pipeline_profile.py [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--tasks", type=int, default=16)
    ap.add_argument("--support", type=int, default=64)
    ap.add_argument("--query", type=int, default=256)
    ap.add_argument("--task-chunk", type=int, default=2)
    ap.add_argument("--num-train-tasks", type=int, default=48)
    ap.add_argument("--dataset-dir", type=str, default="/tmp/profile_ds")
    ap.add_argument("--prefetch", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import functools

    import numpy as np

    from adkf_ift_tpu.data.dataset import DataFold, FSMolDataset
    from adkf_ift_tpu.data.episodes import EpisodeSpec, stack_episodes
    from adkf_ift_tpu.gp import LBFGSConfig
    from adkf_ift_tpu.models import adkf
    from adkf_ift_tpu.modules.encoder import CombinedFeatureConfig, GraphFeatureExtractorConfig
    from adkf_ift_tpu.modules.gnn import GNNConfig
    from adkf_ift_tpu.ops.dense_block import episode_to_dense
    from adkf_ift_tpu.train.loop import _device_batch_pipeline, episode_stream, normalize_fp
    from adkf_ift_tpu.train.meta import init_train_state, make_meta_train_step, make_optimizer
    from adkf_ift_tpu.utils.synthetic import make_task

    # --- dataset on disk (cached across runs) ---
    train_dir = os.path.join(args.dataset_dir, "train")
    if not os.path.isdir(train_dir) or len(os.listdir(train_dir)) < args.num_train_tasks:
        os.makedirs(train_dir, exist_ok=True)
        n_samples = args.support + args.query + 64
        for i in range(args.num_train_tasks):
            task = make_task(f"PROF{i}", num_samples=n_samples, seed=1000 + i)
            task.save_to_file(os.path.join(train_dir, f"{task.name}.jsonl.gz"))
        print(f"wrote {args.num_train_tasks} tasks to {train_dir}", file=sys.stderr)
    dataset = FSMolDataset.from_directory(args.dataset_dir)

    # --- model/step exactly as adkf-train with the bench config ---
    config = adkf.ADKFModelConfig(
        inner_optimizer=LBFGSConfig(max_iters=48, history=8, method="newton"),
        features=CombinedFeatureConfig(
            graph_config=GraphFeatureExtractorConfig(
                gnn_config=GNNConfig(mp_impl="pallas", remat_blocks=False, pallas_block_graphs=8)
            )
        ),
    )
    # Bench-matching budgets (bench.py defaults): the synthetic molecules
    # average 24 nodes, and VMEM caps the fused MP kernel's block size —
    # the CLI-default 48-node/ (8,6,6)-slot budgets OOM scoped VMEM at
    # block_graphs=8.
    spec = EpisodeSpec(
        support_size=args.support,
        query_size=args.query,
        nodes_per_graph=32,
        edges_per_graph=(56, 16, 8),
    )
    transform = functools.partial(episode_to_dense, nodes_per_graph=40, k_per_type=(6, 4, 3))

    def make_stream():
        return episode_stream(
            dataset,
            DataFold.TRAIN,
            spec,
            repeat=True,
            num_workers=4,
            episode_transform=transform,
            wire_budget=192,
        )

    probe = next(episode_stream(dataset, DataFold.TRAIN, spec, repeat=True, num_workers=0,
                                episode_transform=transform))
    # Keep params as host arrays: the step is jitted with donate_argnums,
    # so arm A's updates DELETE the device buffers inside its train state —
    # arm B must rebuild its state from an undonated copy.
    params = jax.tree.map(np.asarray, adkf.init_encoder_params(config, jax.random.PRNGKey(0), probe.support))
    optimizer = make_optimizer(1e-4, clip_value=1.0)
    step_fn = make_meta_train_step(
        lambda p, e: adkf.episode_outer_loss(config, p, e),
        optimizer,
        task_chunk=args.task_chunk,
        remat=False,
        batch_loss_fn=lambda p, e: adkf.batch_outer_loss(config, p, e),
    )

    # --- arm A: device-resident compressed batch ---
    from adkf_ift_tpu.utils.wire import WireCodec

    stream = make_stream()
    # Same sparse/dense fingerprint normalization as the real pipeline so
    # the resident batch takes the identical codec layout as arm B's.
    episodes = normalize_fp([next(stream) for _ in range(args.tasks)])
    codec = WireCodec(sparse_counts_budget=192)
    resident = jax.device_put(codec.compress(stack_episodes(episodes)))

    state = init_train_state(params, optimizer)
    state, losses = step_fn(state, resident)  # compile
    float(np.mean(np.asarray(losses)))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, losses = step_fn(state, resident)
        float(np.mean(np.asarray(losses)))
    arm_a = (time.perf_counter() - t0) / args.steps

    # --- arm B: full pipeline ---
    stats: dict = {}
    next_batch, stop_fn = _device_batch_pipeline(
        make_stream(), args.tasks, None, compress=True, depth=args.prefetch,
        sparse_fp_budget=192, stats=stats,
    )
    state = init_train_state(params, optimizer)
    # warm: one step (possible fresh compile if shapes differ) + cache warm
    b = next_batch()
    state, losses = step_fn(state, b)
    float(np.mean(np.asarray(losses)))
    wait_s = dispatch_s = sync_s = 0.0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        tw = time.perf_counter()
        b = next_batch()
        td = time.perf_counter()
        state, losses = step_fn(state, b)
        ts = time.perf_counter()
        float(np.mean(np.asarray(losses)))
        te = time.perf_counter()
        wait_s += td - tw
        dispatch_s += ts - td
        sync_s += te - ts
        del b, losses
    arm_b = (time.perf_counter() - t0) / args.steps
    stop_fn()

    n = args.steps
    batches = max(stats.get("batches", 1), 1)
    out = {
        "arm_a_resident_compressed_s_per_step": round(arm_a, 4),
        "arm_a_steps_per_s": round(1.0 / arm_a, 3),
        "arm_b_full_pipeline_s_per_step": round(arm_b, 4),
        "arm_b_steps_per_s": round(1.0 / arm_b, 3),
        "arm_b_wait_for_batch_s": round(wait_s / n, 4),
        "arm_b_dispatch_s": round(dispatch_s / n, 4),
        "arm_b_sync_s": round(sync_s / n, 4),
        "pipeline_episodes_s_per_batch": round(stats.get("episodes_s", 0.0) / batches, 4),
        "pipeline_stack_compress_s_per_batch": round(
            stats.get("stack_compress_s", 0.0) / batches, 4
        ),
        "pipeline_upload_s_per_batch": round(stats.get("upload_s", 0.0) / batches, 4),
        "pipeline_batches": batches,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
