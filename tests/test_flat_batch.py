"""Flat-chunk batching: batch_outer_loss must equal per-episode losses."""

import numpy as np
import jax
import jax.numpy as jnp

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode, stack_episodes
from adkf_ift_tpu.gp import LBFGSConfig
from adkf_ift_tpu.models import adkf
from adkf_ift_tpu.modules import (
    CombinedFeatureConfig,
    GNNConfig,
    GraphFeatureExtractorConfig,
    GraphReadoutConfig,
)
from adkf_ift_tpu.train.meta import init_train_state, make_meta_train_step, make_optimizer
from adkf_ift_tpu.utils.synthetic import make_task


def _tiny():
    return CombinedFeatureConfig(
        used_features="gnn+ecfp+fc",
        graph_config=GraphFeatureExtractorConfig(
            gnn_config=GNNConfig(num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8, intermediate_dim=64),
            readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16),
        ),
        fc_out_dim=32,
        fc_hidden_dim=32,
    )


def _episodes(n):
    spec = EpisodeSpec(support_size=16, query_size=32)
    sampler = StratifiedTaskSampler(16, test_size_or_ratio=32)
    return [
        build_episode(sampler.sample(make_task(f"F{i}", num_samples=120, seed=i), seed=i), spec)
        for i in range(n)
    ]


def test_batch_outer_loss_matches_vmapped_single():
    cfg = adkf.ADKFModelConfig(
        features=_tiny(), inner_optimizer=LBFGSConfig(max_iters=10, history=4, max_growth=3, max_backtrack=8)
    )
    eps = _episodes(4)
    batch = stack_episodes(eps)
    params = adkf.init_encoder_params(cfg, jax.random.PRNGKey(0), eps[0].support)

    flat = jax.jit(lambda p, b: adkf.batch_outer_loss(cfg, p, b))(params, batch)
    singles = np.asarray(
        [float(adkf.episode_outer_loss(cfg, params, ep)) for ep in eps]
    )
    np.testing.assert_allclose(np.asarray(flat), singles, rtol=2e-4, atol=2e-3)


def test_dense_batch_outer_loss_matches_flat():
    """Dense-block episodes flow through the SAME model code (the
    encoder dispatches on layout): batch_outer_loss on dense episodes
    equals the flat-layout losses under shared params."""
    from adkf_ift_tpu.ops.dense_block import episode_to_dense

    cfg = adkf.ADKFModelConfig(
        features=CombinedFeatureConfig(
            used_features="gnn+ecfp+fc",
            graph_config=GraphFeatureExtractorConfig(
                gnn_config=GNNConfig(
                    num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8,
                    intermediate_dim=64, dtype="float32", remat_blocks=False,
                ),
                readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16, dtype="float32"),
            ),
            fc_out_dim=32,
            fc_hidden_dim=32,
        ),
        inner_optimizer=LBFGSConfig(max_iters=10, history=4, max_growth=3, max_backtrack=8),
    )
    eps = _episodes(3)
    dense_eps = [episode_to_dense(ep, nodes_per_graph=48, k_per_type=(8, 6, 6)) for ep in eps]
    params = adkf.init_encoder_params(cfg, jax.random.PRNGKey(0), eps[0].support)

    flat = np.asarray(jax.jit(lambda p, b: adkf.batch_outer_loss(cfg, p, b))(params, stack_episodes(eps)))
    dense = np.asarray(
        jax.jit(lambda p, b: adkf.batch_outer_loss(cfg, p, b))(params, stack_episodes(dense_eps))
    )
    np.testing.assert_allclose(dense, flat, rtol=2e-4, atol=2e-3)


def test_dkt_batch_loss_matches_vmapped_single():
    from adkf_ift_tpu.models import dkt

    cfg = dkt.DKTModelConfig(features=_tiny())
    eps = _episodes(3)
    batch = stack_episodes(eps)
    params = dkt.init_params(cfg, jax.random.PRNGKey(0), eps[0].support)
    flat = np.asarray(jax.jit(lambda p, b: dkt.batch_loss(cfg, p, b))(params, batch))
    singles = np.asarray([float(dkt.episode_loss(cfg, params, ep)) for ep in eps])
    np.testing.assert_allclose(flat, singles, rtol=2e-4, atol=2e-3)


def test_wire_compression_roundtrip_and_step_parity():
    """compress_batch narrows fingerprints/masks/indices losslessly;
    decompress inside the jitted step restores native dtypes — losses
    must match the uncompressed step exactly."""
    from adkf_ift_tpu.utils.wire import compress_batch, decompress_batch

    cfg = adkf.ADKFModelConfig(
        features=_tiny(), inner_optimizer=LBFGSConfig(max_iters=10, history=4, max_growth=3, max_backtrack=8)
    )
    eps = _episodes(2)
    batch = stack_episodes(eps)
    comp = compress_batch(batch)

    # Narrowing happened where expected and is lossless.
    assert comp.support.fingerprints.dtype in (np.uint8, np.uint16)
    assert comp.support.node_mask.dtype == np.uint8
    assert comp.support.node_to_graph.dtype in (np.int8, np.int16)
    restored = jax.device_get(decompress_batch(jax.device_put(comp)))
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(batch)):
        assert a.dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    params = jax.tree.map(
        np.asarray, adkf.init_encoder_params(cfg, jax.random.PRNGKey(0), eps[0].support)
    )  # host copies: the step donates its state buffers
    opt = make_optimizer(1e-3)
    step = make_meta_train_step(
        lambda p, e: adkf.episode_outer_loss(cfg, p, e), opt, task_chunk=None, remat=False
    )
    _, losses_comp = step(init_train_state(jax.tree.map(jnp.array, params), opt), comp)
    _, losses_raw = step(init_train_state(jax.tree.map(jnp.array, params), opt), batch)
    np.testing.assert_allclose(np.asarray(losses_comp), np.asarray(losses_raw), rtol=1e-6)


def test_wire_codec_schema_is_stable_and_monotone():
    """WireCodec must emit the SAME dtypes for every batch after the first
    (stable jit signature), widening monotonically when a later batch
    exceeds the recorded range — never narrowing back."""
    from adkf_ift_tpu.utils.wire import WireCodec, decompress_batch

    codec = WireCodec()
    small = {"fp": np.full((4, 8), 3.0, np.float32), "idx": np.arange(8, dtype=np.int32)}
    big = {"fp": np.full((4, 8), 300.0, np.float32), "idx": np.arange(8, dtype=np.int32)}

    c1 = codec.compress(small)
    assert c1["fp"].dtype == np.uint8 and c1["idx"].dtype == np.int8
    # Widens on violation...
    c2 = codec.compress(big)
    assert c2["fp"].dtype == np.uint16
    # ...and STAYS widened for subsequent small batches (no flip-flop).
    c3 = codec.compress(small)
    assert c3["fp"].dtype == np.uint16
    np.testing.assert_array_equal(
        np.asarray(decompress_batch(jax.device_put(c3))["fp"]), small["fp"]
    )
    # Non-integral floats pin the leaf to float32 permanently.
    frac = {"fp": np.full((4, 8), 0.5, np.float32), "idx": np.arange(8, dtype=np.int32)}
    assert codec.compress(frac)["fp"].dtype == np.float32
    assert codec.compress(small)["fp"].dtype == np.float32


def test_sparse_fingerprint_wire_roundtrip_and_fallback():
    """SparseCounts fingerprints wire: lossless scatter back to dense on
    device; rows exceeding the nonzero budget demote the leaf to dense
    permanently (monotone, signature-stable)."""
    from adkf_ift_tpu.utils.wire import SparseCounts, WireCodec, decompress_batch

    rng = np.random.RandomState(0)
    fp = (rng.rand(3, 5, 64) < 0.2).astype(np.float32) * rng.randint(
        1, 9, size=(3, 5, 64)
    ).astype(np.float32)
    batch = {"support": {"fingerprints": fp, "other": fp.copy()}}
    codec = WireCodec(sparse_counts_budget=32)
    comp = codec.compress(batch)
    assert isinstance(comp["support"]["fingerprints"], SparseCounts)
    # a non-fingerprints leaf never sparsifies
    assert not isinstance(comp["support"]["other"], SparseCounts)
    restored = jax.device_get(decompress_batch(jax.device_put(comp)))
    np.testing.assert_array_equal(np.asarray(restored["support"]["fingerprints"]), fp)

    # over-budget batch -> dense forever, even for later sparse batches
    dense_fp = np.ones((3, 5, 64), np.float32)
    comp2 = codec.compress({"support": {"fingerprints": dense_fp, "other": fp}})
    assert not isinstance(comp2["support"]["fingerprints"], SparseCounts)
    comp3 = codec.compress(batch)
    assert not isinstance(comp3["support"]["fingerprints"], SparseCounts)
    np.testing.assert_array_equal(
        np.asarray(decompress_batch(jax.device_put(comp3))["support"]["fingerprints"]), fp
    )


def test_meta_train_step_with_batch_loss_fn_trains():
    cfg = adkf.ADKFModelConfig(
        features=_tiny(), inner_optimizer=LBFGSConfig(max_iters=10, history=4, max_growth=3, max_backtrack=8)
    )
    eps = _episodes(4)
    batch = stack_episodes(eps)
    params = adkf.init_encoder_params(cfg, jax.random.PRNGKey(0), eps[0].support)
    opt = make_optimizer(1e-3, clip_value=1.0)
    step = make_meta_train_step(
        lambda p, e: adkf.episode_outer_loss(cfg, p, e),
        opt,
        task_chunk=2,
        batch_loss_fn=lambda p, e: adkf.batch_outer_loss(cfg, p, e),
    )
    state = init_train_state(params, opt)
    state, losses = step(state, batch)
    assert losses.shape == (4,)
    assert np.all(np.isfinite(np.asarray(losses)))
    l0 = float(np.mean(np.asarray(losses)))
    for _ in range(4):
        state, losses = step(state, batch)
    assert float(np.mean(np.asarray(losses))) < l0


def test_nonfinite_grad_guard_skips_update():
    """One NaN task batch must not poison params or Adam moments: the
    update is skipped wholesale (params/opt_state unchanged, step still
    advances), and training continues normally on the next finite batch
    (regression: the first-order arm in docs/METAGAIN_REGRESSION.md died
    permanently at its first NaN step)."""

    def episode_loss(p, ep):
        return jnp.sum(p["w"] * ep["x"])

    opt = make_optimizer(1e-2)
    step = make_meta_train_step(episode_loss, opt, remat=False)
    params0 = np.ones((3,), np.float32)
    state = init_train_state({"w": jnp.asarray(params0)}, opt)

    bad = {"x": jnp.full((2, 3), jnp.nan, jnp.float32)}
    state, losses = step(state, bad)
    assert not np.any(np.isfinite(np.asarray(losses)))
    np.testing.assert_array_equal(np.asarray(state.params["w"]), params0)
    for leaf in jax.tree.leaves(state.opt_state):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert int(state.step) == 1

    good = {"x": jnp.ones((2, 3), jnp.float32)}
    state, losses = step(state, good)
    assert np.all(np.isfinite(np.asarray(losses)))
    w = np.asarray(state.params["w"])
    assert np.all(np.isfinite(w)) and not np.array_equal(w, params0)
    assert int(state.step) == 2
