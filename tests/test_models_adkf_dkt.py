"""Model-level tests for ADKF-IFT and DKT on synthetic episodes:
finite losses/grads, learning on a toy task, prediction quality above
chance, mesh-sharded meta-training step on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adkf_ift_tpu.data import EpisodeSpec, StratifiedTaskSampler, build_episode, stack_episodes
from adkf_ift_tpu.gp import LBFGSConfig
from adkf_ift_tpu.models import adkf, dkt
from adkf_ift_tpu.modules import (
    CombinedFeatureConfig,
    GNNConfig,
    GraphFeatureExtractorConfig,
    GraphReadoutConfig,
)
from adkf_ift_tpu.train.meta import init_train_state, make_meta_train_step, make_optimizer
from adkf_ift_tpu.utils.synthetic import make_task

SPEC = EpisodeSpec(support_size=16, query_size=32)


def _tiny_features(used="gnn+ecfp+fc"):
    return CombinedFeatureConfig(
        used_features=used,
        graph_config=GraphFeatureExtractorConfig(
            gnn_config=GNNConfig(num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8, intermediate_dim=64),
            readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16),
        ),
        fc_out_dim=32,
        fc_hidden_dim=32,
    )


def _episodes(n, seed0=0, spec=SPEC, regression=False):
    sampler = StratifiedTaskSampler(spec.support_size, test_size_or_ratio=spec.query_size)
    eps = []
    for i in range(n):
        task = make_task(f"T{i}", num_samples=120, seed=seed0 + i)
        eps.append(build_episode(sampler.sample(task, seed=i), spec, regression=regression))
    return eps


_FAST_OPT = LBFGSConfig(max_iters=12, history=4, max_growth=3, max_backtrack=10)


def test_adkf_episode_loss_and_grads_finite():
    cfg = adkf.ADKFModelConfig(features=_tiny_features(), inner_optimizer=_FAST_OPT)
    ep = _episodes(1)[0]
    params = adkf.init_encoder_params(cfg, jax.random.PRNGKey(0), ep.support)
    loss, grads = jax.jit(
        jax.value_and_grad(lambda p: adkf.episode_outer_loss(cfg, p, ep))
    )(params)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in flat), "no gradient signal"


def test_adkf_first_order_ablation_changes_grads():
    feats = _tiny_features()
    ep = _episodes(1)[0]
    cfg_full = adkf.ADKFModelConfig(features=feats, inner_optimizer=_FAST_OPT)
    cfg_fo = adkf.ADKFModelConfig(
        features=feats, ignore_grad_correction=True, inner_optimizer=_FAST_OPT
    )
    params = adkf.init_encoder_params(cfg_full, jax.random.PRNGKey(0), ep.support)
    g_full = jax.grad(lambda p: adkf.episode_outer_loss(cfg_full, p, ep))(params)
    g_fo = jax.grad(lambda p: adkf.episode_outer_loss(cfg_fo, p, ep))(params)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g_full, g_fo)
    assert max(jax.tree.leaves(diffs)) > 1e-8


def test_adkf_predict_beats_chance_on_separable_task():
    """ECFP-only features with a Tanimoto kernel (the GP-ST configuration)
    on a synthetic task whose labels depend on fingerprint bits: the GP on
    raw fingerprints must beat random AUC without any encoder training."""
    from sklearn.metrics import roc_auc_score

    cfg = adkf.ADKFModelConfig(
        features=_tiny_features("ecfp"),
        gp_kernel="tanimoto",
        inner_optimizer=LBFGSConfig(max_iters=30),
    )
    spec = EpisodeSpec(support_size=64, query_size=64)
    task = make_task(num_samples=256, seed=42)
    sample = StratifiedTaskSampler(64, test_size_or_ratio=64).sample(task, 0)
    ep = build_episode(sample, spec)
    params = adkf.init_encoder_params(cfg, jax.random.PRNGKey(0), ep.support)
    pred = jax.jit(lambda p, e: adkf.episode_predict(cfg, p, e))(params, ep)
    probs = jax.nn.sigmoid(pred.mean)
    mask = ep.query.graph_mask > 0
    auc = roc_auc_score(np.asarray(ep.query_labels)[mask] > 0, np.asarray(probs)[mask])
    assert auc > 0.6, auc


def test_dkt_loss_decreases_with_training():
    cfg = dkt.DKTModelConfig(features=_tiny_features())
    eps = _episodes(4, seed0=10)
    batch = stack_episodes(eps)
    ep0 = eps[0]
    params = dkt.init_params(cfg, jax.random.PRNGKey(1), ep0.support)

    optimizer = make_optimizer(1e-3)
    step_fn = make_meta_train_step(
        lambda p, e: dkt.episode_loss(cfg, p, e), optimizer
    )
    state = init_train_state(params, optimizer)
    first = None
    for i in range(8):
        state, losses = step_fn(state, batch)
        mean_loss = float(jnp.mean(losses))
        if first is None:
            first = mean_loss
    assert mean_loss < first, (first, mean_loss)


def test_dkt_plus_lengthscale_prior_changes_loss():
    feats = _tiny_features()
    ep = _episodes(1)[0]
    cfg = dkt.DKTModelConfig(features=feats)
    cfg_plus = dkt.DKTModelConfig(features=feats, use_lengthscale_prior=True)
    params = dkt.init_params(cfg, jax.random.PRNGKey(0), ep.support)
    l1 = float(dkt.episode_loss(cfg, params, ep))
    l2 = float(dkt.episode_loss(cfg_plus, params, ep))
    assert np.isfinite(l1) and np.isfinite(l2)
    assert not np.isclose(l1, l2)


def test_adkf_meta_train_step_on_mesh():
    """Full ADKF-IFT outer step (inner fit + IFT) sharded over the 8-device
    CPU mesh — the multi-chip path the driver dry-runs."""
    from adkf_ift_tpu.parallel.mesh import make_task_mesh, shard_episode_batch

    cpu_devices = jax.devices("cpu")
    assert len(cpu_devices) == 8
    mesh = make_task_mesh(cpu_devices)

    cfg = adkf.ADKFModelConfig(features=_tiny_features(), inner_optimizer=_FAST_OPT)
    eps = _episodes(8, seed0=20)
    batch = stack_episodes(eps)
    params = adkf.init_encoder_params(cfg, jax.random.PRNGKey(0), eps[0].support)

    optimizer = make_optimizer(1e-3, clip_value=1.0)
    step_fn = make_meta_train_step(
        lambda p, e: adkf.episode_outer_loss(cfg, p, e), optimizer, mesh=mesh
    )
    # Host-side snapshot: the train step donates its state, which deletes
    # the device buffers `params` aliases.
    params0 = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    state = init_train_state(params, optimizer)
    with mesh:
        sharded = shard_episode_batch(mesh, batch)
        state, losses = step_fn(state, sharded)
        state, losses2 = step_fn(state, sharded)
    assert losses.shape == (8,)
    assert np.all(np.isfinite(np.asarray(losses)))
    # Parameters actually moved.
    moved = jax.tree.map(lambda a, b: float(np.max(np.abs(np.asarray(b) - a))), params0, state.params)
    assert max(jax.tree.leaves(moved)) > 0


def _global_rel_diff(tree_a, tree_b):
    """max over leaves of max|a-b|, normalized by the GLOBAL max|a|.

    Per-leaf normalization is meaningless for leaves whose true gradient
    is analytically ZERO — e.g. the final projection bias under a
    stationary kernel (a uniform shift of every embedding leaves all
    pairwise differences, hence the GP loss, unchanged), where both
    sides hold pure f32 rounding noise and noise/noise is O(1)."""
    a64 = [np.asarray(l, np.float64) for l in jax.tree.leaves(tree_a)]
    b64 = [np.asarray(l, np.float64) for l in jax.tree.leaves(tree_b)]
    scale = max(float(np.max(np.abs(l))) for l in a64)
    diff = max(float(np.max(np.abs(x - y))) for x, y in zip(a64, b64))
    return diff / (scale + 1e-12)


def test_mesh_grads_equal_single_device():
    """The 8-device mesh gradient must match the single-device gradient
    on the same batch/params: the psum accumulation replaces the
    reference's sequential accumulation (adaptive_dkt_utils.py:361-403)
    1:1. Compared at the GRADIENT level because Adam is invariant to
    gradient scale — a psum over-count by n_devices (rel diff ≈ 7/8)
    would be invisible in an optimizer-trajectory check.

    Tolerance note: chunk widths are matched (1 episode per accumulate
    call on both paths) because ADKF's inner GP fit has discrete
    branches (Armijo argmax, eigh) that chaotically amplify f32
    reduction-order noise into ~1e-3 theta* differences across chunk
    layouts; theta* value-level agreement stays ~1e-6 (see
    test_fit_vmaps_over_tasks). The tight smooth-loss instrument is
    test_mesh_grads_exact_dkt below."""
    from adkf_ift_tpu.parallel.mesh import make_task_mesh, shard_episode_batch
    from adkf_ift_tpu.train.meta import make_meta_grads_fn

    mesh = make_task_mesh(jax.devices("cpu"))
    cfg = adkf.ADKFModelConfig(features=_tiny_features(), inner_optimizer=_FAST_OPT)
    eps = _episodes(8, seed0=40)
    batch = stack_episodes(eps)
    params = adkf.init_encoder_params(cfg, jax.random.PRNGKey(1), eps[0].support)

    loss_fns = dict(
        episode_loss_fn=lambda p, e: adkf.episode_outer_loss(cfg, p, e),
        batch_loss_fn=lambda p, e: adkf.batch_outer_loss(cfg, p, e),
        remat=False,
    )
    single_fn = make_meta_grads_fn(task_chunk=1, **loss_fns)
    mesh_fn = make_meta_grads_fn(mesh=mesh, task_chunk=8, **loss_fns)

    g_single, l_single = single_fn(params, batch)
    with mesh:
        g_mesh, l_mesh = mesh_fn(params, shard_episode_batch(mesh, batch))

    np.testing.assert_allclose(
        np.asarray(l_mesh), np.asarray(l_single), rtol=5e-3, atol=1e-4
    )
    rel = _global_rel_diff(g_single, g_mesh)
    # A scaling bug (missing /n, double psum, dropped shard) shows as
    # rel ≈ 0.875–7; inner-fit branch noise measures ~3e-3 on CPU.
    assert rel < 2e-2, f"mesh grads diverge from single-device: global rel {rel}"


def test_mesh_grads_exact_dkt():
    """Tight mesh-equivalence instrument: DKT's joint -MLL has NO inner
    optimization (no discrete branches), so the 8-device psum gradient
    must equal the single-device gradient to float-noise level. Any
    shard-spec/psum defect in train.meta's mesh path fails this at O(1)."""
    from adkf_ift_tpu.parallel.mesh import make_task_mesh, shard_episode_batch
    from adkf_ift_tpu.train.meta import make_meta_grads_fn

    mesh = make_task_mesh(jax.devices("cpu"))
    cfg = dkt.DKTModelConfig(features=_tiny_features())
    eps = _episodes(8, seed0=40)
    batch = stack_episodes(eps)
    params = dkt.init_params(cfg, jax.random.PRNGKey(1), eps[0].support)

    loss_fns = dict(
        episode_loss_fn=lambda p, e: dkt.episode_loss(cfg, p, e),
        batch_loss_fn=lambda p, e: dkt.batch_loss(cfg, p, e),
        remat=False,
    )
    single_fn = make_meta_grads_fn(task_chunk=1, **loss_fns)
    mesh_fn = make_meta_grads_fn(mesh=mesh, task_chunk=8, **loss_fns)

    g_single, l_single = single_fn(params, batch)
    with mesh:
        g_mesh, l_mesh = mesh_fn(params, shard_episode_batch(mesh, batch))

    np.testing.assert_allclose(
        np.asarray(l_mesh), np.asarray(l_single), rtol=1e-5, atol=1e-6
    )
    rel = _global_rel_diff(g_single, g_mesh)
    assert rel < 1e-4, f"mesh DKT grads diverge from single-device: global rel {rel}"


def test_mesh_training_trajectory_matches_single():
    """Short SGD run on the smooth DKT loss: the mesh trajectory must
    track the unsharded trajectory step for step (SGD, not Adam —
    scale-sensitive, so a mis-scaled psum shifts every step)."""
    import optax

    from adkf_ift_tpu.parallel.mesh import make_task_mesh, shard_episode_batch

    mesh = make_task_mesh(jax.devices("cpu"))
    cfg = dkt.DKTModelConfig(features=_tiny_features())
    eps = _episodes(8, seed0=60)
    batch = stack_episodes(eps)
    params = dkt.init_params(cfg, jax.random.PRNGKey(2), eps[0].support)
    params_host = jax.tree.map(lambda x: np.asarray(x).copy(), params)

    def run(mesh_or_none, batch_in, n_steps=10):
        opt = optax.sgd(1e-3)
        state = init_train_state(jax.tree.map(jnp.asarray, params_host), opt)
        step_fn = make_meta_train_step(
            lambda p, e: dkt.episode_loss(cfg, p, e),
            opt,
            mesh=mesh_or_none,
            remat=False,
            # Matched per-call widths (1 episode each side): a global
            # chunk of 8 on the 8-device mesh is 1 local, vs chunk 1
            # unsharded — identical flat-packed shapes, so the only
            # remaining difference is psum-vs-scan summation order.
            task_chunk=8 if mesh_or_none is not None else 1,
            batch_loss_fn=lambda p, e: dkt.batch_loss(cfg, p, e),
        )
        traj = []
        for _ in range(n_steps):
            state, losses = step_fn(state, batch_in)
            traj.append(float(jnp.mean(losses)))
        return np.asarray(traj), jax.tree.map(np.asarray, state.params)

    traj_single, params_single = run(None, batch)
    with mesh:
        traj_mesh, params_mesh = run(mesh, shard_episode_batch(mesh, batch))

    np.testing.assert_allclose(traj_mesh, traj_single, rtol=1e-4, atol=1e-5)
    rel = _global_rel_diff(params_single, params_mesh)
    assert rel < 1e-4, f"mesh params drift from single-device run: {rel}"


def test_adkf_regression_mode():
    cfg = adkf.ADKFModelConfig(
        features=_tiny_features(), use_numeric_labels=True, inner_optimizer=_FAST_OPT
    )
    ep = _episodes(1, seed0=30, regression=True)[0]
    params = adkf.init_encoder_params(cfg, jax.random.PRNGKey(0), ep.support)
    loss = float(adkf.episode_outer_loss(cfg, params, ep))
    assert np.isfinite(loss)
    pred = adkf.episode_predict(cfg, params, ep)
    assert np.all(np.isfinite(np.asarray(pred.mean)))


def test_feature_rank_deficit_metric():
    """The penalty is ~0 for isotropic features, large for rank-1, and
    scale-invariant (the GP refit's free scale must not feed it)."""
    rng = np.random.RandomState(0)
    fs = jnp.asarray(rng.randn(16, 32), jnp.float32)
    fq = jnp.asarray(rng.randn(32, 32), jnp.float32)
    ones_s, ones_q = jnp.ones(16), jnp.ones(32)
    iso = float(adkf._feature_rank_deficit(fs, fq, ones_s, ones_q))
    # rank-1: every row a multiple of one direction
    d = jnp.asarray(rng.randn(32), jnp.float32)
    r1s = jnp.asarray(rng.randn(16, 1), jnp.float32) * d[None, :]
    r1q = jnp.asarray(rng.randn(32, 1), jnp.float32) * d[None, :]
    collapsed = float(adkf._feature_rank_deficit(r1s, r1q, ones_s, ones_q))
    assert collapsed > iso + 1.0, (collapsed, iso)
    scaled = float(adkf._feature_rank_deficit(fs * 650.0, fq * 650.0, ones_s, ones_q))
    assert abs(scaled - iso) < 1e-3, "penalty must be scale-invariant"
    # masked rows must not contribute
    fs_pad = jnp.concatenate([fs, 1e6 * jnp.ones((4, 32), jnp.float32)])
    mask = jnp.concatenate([ones_s, jnp.zeros(4)])
    masked = float(adkf._feature_rank_deficit(fs_pad, fq, mask, ones_q))
    assert abs(masked - iso) < 1e-3, (masked, iso)


def test_feature_diversity_reg_in_outer_loss():
    """reg=0 reproduces the reference objective bit-for-bit; reg>0 shifts
    the loss by reg * deficit and its gradient pushes effective rank UP."""
    feats = _tiny_features()
    ep = _episodes(1)[0]
    cfg0 = adkf.ADKFModelConfig(features=feats, inner_optimizer=_FAST_OPT)
    cfgr = adkf.ADKFModelConfig(
        features=feats, inner_optimizer=_FAST_OPT, feature_diversity_reg=5.0
    )
    params = adkf.init_encoder_params(cfg0, jax.random.PRNGKey(0), ep.support)
    l0 = float(adkf.episode_outer_loss(cfg0, params, ep))
    lr_ = float(adkf.episode_outer_loss(cfgr, params, ep))
    assert lr_ > l0, "penalty must be positive for a real (non-uniform) encoder"
    g = jax.grad(lambda p: adkf.episode_outer_loss(cfgr, p, ep))(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))
    # old-checkpoint compat: a config object missing the attribute works
    import dataclasses as _dc
    legacy = adkf.ADKFModelConfig(features=feats, inner_optimizer=_FAST_OPT)
    object.__delattr__(legacy, "feature_diversity_reg")
    l_legacy = float(adkf.episode_outer_loss(legacy, params, ep))
    assert abs(l_legacy - l0) < 1e-6


def test_graft_encoder_full_and_gnn_subtree(tmp_path):
    """--init-encoder-from: full graft between same-architecture models
    (DKT donor -> ADKF), GNN-subtree fallback when FC heads differ, and
    a loud failure when the GNN itself differs."""
    from adkf_ift_tpu.cli._episodic import graft_encoder
    from adkf_ift_tpu.utils.checkpoints import save_checkpoint

    feats = _tiny_features()
    ep = _episodes(1)[0]
    acfg = adkf.ADKFModelConfig(features=feats, inner_optimizer=_FAST_OPT)
    dcfg = dkt.DKTModelConfig(features=feats)
    dkt_params = dkt.init_params(dcfg, jax.random.PRNGKey(1), ep.support)
    ckpt = str(tmp_path / "dkt_ckpt")
    save_checkpoint(ckpt, dcfg, dkt_params, step=7)

    # full graft: DKT donor encoder -> ADKF params (same feature config)
    adkf_params = adkf.init_encoder_params(acfg, jax.random.PRNGKey(2), ep.support)
    grafted = graft_encoder(adkf_params, ckpt)
    a, b = jax.tree.leaves(grafted), jax.tree.leaves(dkt_params.encoder)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))

    # subtree graft: different FC head width -> only the GNN subtree moves
    import dataclasses
    wide = dataclasses.replace(feats, fc_out_dim=64)
    wcfg = adkf.ADKFModelConfig(features=wide, inner_optimizer=_FAST_OPT)
    wide_params = adkf.init_encoder_params(wcfg, jax.random.PRNGKey(3), ep.support)
    g2 = graft_encoder(wide_params, ckpt)
    gfe = g2["params"]["graph_feature_extractor"]
    want = dkt_params.encoder["params"]["graph_feature_extractor"]
    a, b = jax.tree.leaves(gfe), jax.tree.leaves(want)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
    # FC head untouched (fresh init values)
    assert np.allclose(
        np.asarray(g2["params"]["fc1"]["kernel"]),
        np.asarray(wide_params["params"]["fc1"]["kernel"]),
    )

    # different GNN config -> loud error
    gnn_diff = dataclasses.replace(
        feats,
        graph_config=dataclasses.replace(
            feats.graph_config,
            gnn_config=dataclasses.replace(feats.graph_config.gnn_config, hidden_dim=64, num_heads=4),
        ),
    )
    bcfg = adkf.ADKFModelConfig(features=gnn_diff, inner_optimizer=_FAST_OPT)
    bad = adkf.init_encoder_params(bcfg, jax.random.PRNGKey(4), ep.support)
    with pytest.raises(ValueError, match="init-encoder-from"):
        graft_encoder(bad, ckpt)
