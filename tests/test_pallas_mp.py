"""Fused Pallas message-passing kernel vs the XLA dense-block MP + output
projection under the same flax parameters (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adkf_ift_tpu.data import GraphPadSpec, pack_graphs
from adkf_ift_tpu.modules.gnn import (
    DenseRelationalMultiAggrMP,
    GNNConfig,
)
from adkf_ift_tpu.ops.dense_block import flat_to_dense
from adkf_ift_tpu.ops.pallas.message_passing import (
    fused_multiaggr_mp,
    pack_mp_params,
    slot_minor_onehot,
)
from adkf_ift_tpu.utils.synthetic import make_task

K_PER_TYPE = (8, 6, 6)


def _setup(gnn_type="PNA", g=6, hidden=32, towers=2, per_head=8):
    task = make_task(num_samples=g, seed=3)
    spec = GraphPadSpec.for_graphs(g, nodes_per_graph=48, edges_per_graph=112)
    packed = pack_graphs(task.samples, spec)
    dense = flat_to_dense(packed, nodes_per_graph=48, k_per_type=K_PER_TYPE)

    cfg = GNNConfig(
        type=gnn_type, hidden_dim=hidden, num_heads=towers, per_head_dim=per_head,
        dtype="float32",
    )
    mp = DenseRelationalMultiAggrMP(cfg, use_pna_scalers=(gnn_type == "PNA"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(g, 48, hidden).astype(np.float32))
    x = x * jnp.asarray(dense.node_mask)[..., None]
    mp_params = mp.init(jax.random.PRNGKey(1), x, dense.in_src, dense.in_mask)["params"]

    agg = mp.apply({"params": mp_params}, x, dense.in_src, dense.in_mask)
    wp = jnp.asarray(rng.randn(agg.shape[-1], hidden).astype(np.float32)) * 0.1
    bp = jnp.asarray(rng.randn(hidden).astype(np.float32)) * 0.1
    want = np.asarray(agg @ wp + bp)

    gnn_params = {
        "mp": mp_params,
        "msg_out_projection": {"kernel": wp, "bias": bp},
    }
    return cfg, dense, x, gnn_params, want


@pytest.mark.parametrize("gnn_type", ["PNA", "MultiAggr"])
def test_fused_mp_matches_xla_dense(gnn_type):
    cfg, dense, x, gnn_params, want = _setup(gnn_type)
    use_pna = gnn_type == "PNA"
    w_msg, b_msg, p_proj, b_proj = pack_mp_params(
        gnn_params, cfg.num_edge_types, cfg.num_heads, cfg.per_head_dim,
        cfg.hidden_dim, use_pna, compute_dtype=jnp.float32,
    )
    onehot = slot_minor_onehot(dense.in_src, dense.in_mask, dtype=jnp.float32)
    got = np.asarray(
        fused_multiaggr_mp(
            x, onehot, w_msg, b_msg, p_proj, b_proj,
            k_per_type=K_PER_TYPE, use_pna=use_pna, block_graphs=3,
            interpret=True, compute_dtype=jnp.float32,
        )
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_fused_mp_backward_matches_xla():
    """custom_vjp backward (recompute-in-kernel) vs XLA autodiff through
    the dense MP + projection: dx, message-MLP w/b grads (block slices of
    the packed weights), projection and bias grads.

    Uses fully-dense random graphs (every node has in-degree K_t in every
    type): degree-1 nodes sit exactly on the reference's
    sqrt(relu(m²−mean²)+ε) knife edge, where the local gradient is ~1/√ε
    and its sign flips with f32 rounding (same in the torch reference,
    gnn.py:216-222) — on smooth data the comparison is exact."""
    g, n, hidden, towers, per_head = 5, 48, 32, 2, 8
    cfg = GNNConfig(
        type="PNA", hidden_dim=hidden, num_heads=towers, per_head_dim=per_head,
        dtype="float32",
    )
    rng = np.random.RandomState(4)
    in_src = tuple(
        jnp.asarray(rng.randint(0, n, size=(g, n, kt)).astype(np.int32))
        for kt in K_PER_TYPE
    )
    in_mask = tuple(jnp.ones((g, n, kt), jnp.float32) for kt in K_PER_TYPE)
    x = jnp.asarray(rng.randn(g, n, hidden).astype(np.float32))

    mp = DenseRelationalMultiAggrMP(cfg, use_pna_scalers=True)
    mp_params = mp.init(jax.random.PRNGKey(1), x, in_src, in_mask)["params"]
    agg_probe = mp.apply({"params": mp_params}, x, in_src, in_mask)
    wp = jnp.asarray(rng.randn(agg_probe.shape[-1], hidden).astype(np.float32)) * 0.1
    bp = jnp.asarray(rng.randn(hidden).astype(np.float32)) * 0.1
    gnn_params = {"mp": mp_params, "msg_out_projection": {"kernel": wp, "bias": bp}}
    r = jnp.asarray(rng.randn(g, n, hidden).astype(np.float32))

    def loss_xla(x_, mp_p, wp_, bp_):
        agg = mp.apply({"params": mp_p}, x_, in_src, in_mask)
        return jnp.sum((agg @ wp_ + bp_) * r)

    gx_want, gmp_want, gwp_want, gbp_want = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(
        x, mp_params, wp, bp
    )

    w_msg, b_msg, p_proj, b_proj = pack_mp_params(
        gnn_params, cfg.num_edge_types, cfg.num_heads, cfg.per_head_dim,
        cfg.hidden_dim, True, compute_dtype=jnp.float32,
    )
    onehot = slot_minor_onehot(in_src, in_mask, dtype=jnp.float32)

    def loss_fused(x_, w_msg_, b_msg_, p_proj_, b_proj_):
        out = fused_multiaggr_mp(
            x_, onehot, w_msg_, b_msg_, p_proj_, b_proj_,
            k_per_type=K_PER_TYPE, use_pna=True, block_graphs=3,
            interpret=True, compute_dtype=jnp.float32,
        )
        return jnp.sum(out * r)

    gx, gw, gb, gpp, gbp = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, w_msg, b_msg, p_proj, b_proj
    )

    # Degree-1 nodes sit on the reference's sqrt(relu(m²−mean²)+ε) knife
    # edge where the local gradient is ~1/√ε and its SIGN flips with f32
    # rounding (identical in the torch reference, gnn.py:216-222) — so
    # compare direction + bulk, not bitwise max, for everything the var
    # path touches.
    def close_bulk(a, b, q=1e-3):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
        assert cos > 0.9995, cos
        assert np.quantile(np.abs(a - b), 0.98) < q, np.quantile(np.abs(a - b), 0.98)

    close_bulk(gx, gx_want)
    assert np.allclose(np.asarray(gbp), np.asarray(gbp_want), atol=1e-3)

    m = cfg.per_head_dim
    td = cfg.hidden_dim // cfg.num_heads
    hd = cfg.hidden_dim
    for t in range(cfg.num_edge_types):
        w0_want = np.asarray(gmp_want[f"message_fn_type{t}"]["w0"])
        b0_want = np.asarray(gmp_want[f"message_fn_type{t}"]["b0"])
        for tw in range(cfg.num_heads):
            cols = slice(tw * 3 * m, (tw + 1) * 3 * m)
            got_src = np.asarray(gw[t][tw * td : (tw + 1) * td, cols])
            got_tgt = np.asarray(gw[t][hd + tw * td : hd + (tw + 1) * td, cols])
            close_bulk(got_src, w0_want[tw, :td], q=5e-3)
            close_bulk(got_tgt, w0_want[tw, td:], q=5e-3)
            close_bulk(np.asarray(gb[t][cols]), b0_want[tw], q=5e-3)

    # Projection grad: reassemble the flax [agg_dim, H] layout from the
    # packed per-agg slices (branches in H-aligned lane slices — the
    # round-4 [4, F, branches*H] layout) and compare.
    tower_w = 4 * m * 3
    gwp = np.zeros_like(np.asarray(gwp_want))
    gpp_np = np.asarray(gpp)
    h_out = gwp.shape[1]
    for br in range(3):
        for tw in range(cfg.num_heads):
            for j in range(4):  # sum, mean, std, max
                part = [0, 1, 1, 2][j]
                src_rows = slice(tw * 3 * m + part * m, tw * 3 * m + (part + 1) * m)
                row0 = tw * tower_w + br * 4 * m + j * m
                gwp[row0 : row0 + m] += gpp_np[j, src_rows, br * h_out : (br + 1) * h_out]
    close_bulk(gwp, gwp_want, q=5e-3)


def test_encoder_with_pallas_mp_matches_xla():
    """GraphFeatureExtractor on the dense-block layout with
    mp_impl='pallas' computes the same embeddings (and the same param
    tree) as mp_impl='xla' — the model-level integration check."""
    from adkf_ift_tpu.modules.encoder import (
        GraphFeatureExtractor,
        GraphFeatureExtractorConfig,
    )
    from adkf_ift_tpu.modules.readout import GraphReadoutConfig

    task = make_task(num_samples=6, seed=3)
    spec = GraphPadSpec.for_graphs(6, nodes_per_graph=48, edges_per_graph=112)
    packed = pack_graphs(task.samples, spec)
    dense = flat_to_dense(packed, nodes_per_graph=48, k_per_type=K_PER_TYPE)

    def cfg(mp_impl):
        return GraphFeatureExtractorConfig(
            gnn_config=GNNConfig(
                type="PNA", num_layers=2, hidden_dim=32, num_heads=2, per_head_dim=8,
                intermediate_dim=64, dtype="float32", remat_blocks=False,
                mp_impl=mp_impl, pallas_interpret=True, pallas_block_graphs=3,
            ),
            readout_config=GraphReadoutConfig(num_heads=2, head_dim=8, output_dim=16, dtype="float32"),
        )

    xla_model = GraphFeatureExtractor(cfg("xla"))
    pallas_model = GraphFeatureExtractor(cfg("pallas"))
    params = xla_model.init(jax.random.PRNGKey(0), dense)
    params_p = pallas_model.init(jax.random.PRNGKey(0), dense)
    assert jax.tree.structure(params) == jax.tree.structure(params_p)

    out_xla = np.asarray(xla_model.apply(params, dense))
    out_pallas = np.asarray(pallas_model.apply(params, dense))
    assert np.allclose(out_xla, out_pallas, atol=2e-4), np.abs(out_xla - out_pallas).max()

    # Gradients flow to every parameter through the packed kernel path.
    g = jax.grad(lambda p: jnp.sum(pallas_model.apply(p, dense) ** 2))(params)
    norms = jax.tree.map(lambda a: float(jnp.linalg.norm(a)), g)
    zero = [k for k, v in jax.tree_util.tree_leaves_with_path(g) if float(jnp.linalg.norm(v)) == 0.0]
    assert not zero, zero
    del norms


def test_fused_mp_pads_partial_block():
    """G not divisible by block_graphs: the pad graphs must not leak."""
    cfg, dense, x, gnn_params, want = _setup("PNA", g=5)
    w_msg, b_msg, p_proj, b_proj = pack_mp_params(
        gnn_params, cfg.num_edge_types, cfg.num_heads, cfg.per_head_dim,
        cfg.hidden_dim, True, compute_dtype=jnp.float32,
    )
    onehot = slot_minor_onehot(dense.in_src, dense.in_mask, dtype=jnp.float32)
    got = np.asarray(
        fused_multiaggr_mp(
            x, onehot, w_msg, b_msg, p_proj, b_proj,
            k_per_type=K_PER_TYPE, use_pna=True, block_graphs=4,
            interpret=True, compute_dtype=jnp.float32,
        )
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_fused_whole_block_matches_xla_block():
    """fused_gnn_block (MP + ReZero residual + LayerNorm + BOOM + residual
    in one kernel) vs the XLA dense GNNBlock under identical flax params:
    forward parity AND full parameter-tree gradient parity."""
    from adkf_ift_tpu.modules.gnn import GNNBlock

    g, n, hidden, towers, per_head = 5, 48, 32, 2, 8
    rng = np.random.RandomState(7)
    in_src = tuple(
        jnp.asarray(rng.randint(0, n, size=(g, n, kt)).astype(np.int32))
        for kt in K_PER_TYPE
    )
    in_mask = tuple(jnp.ones((g, n, kt), jnp.float32) for kt in K_PER_TYPE)
    x = jnp.asarray(rng.randn(g, n, hidden).astype(np.float32))
    r = jnp.asarray(rng.randn(g, n, hidden).astype(np.float32))

    def cfg(mp_impl):
        return GNNConfig(
            type="PNA", hidden_dim=hidden, num_heads=towers, per_head_dim=per_head,
            intermediate_dim=64, dtype="float32", mp_impl=mp_impl,
            pallas_interpret=True, pallas_block_graphs=3,
        )

    from adkf_ift_tpu.ops.pallas.message_passing import slot_minor_onehot

    onehot = slot_minor_onehot(in_src, in_mask, dtype=jnp.float32)
    xla_block = GNNBlock(cfg("xla"))
    pallas_block = GNNBlock(cfg("pallas"))
    params = xla_block.init(jax.random.PRNGKey(2), x, in_src, None, in_mask)
    params_p = pallas_block.init(jax.random.PRNGKey(2), x, in_src, onehot, in_mask)
    assert jax.tree.structure(params) == jax.tree.structure(params_p)
    # ReZero alpha starts ~0; bump it so the whole block (incl. BOOM) has
    # non-trivial forward signal and gradients.
    params = jax.tree.map(lambda a: a, params)
    params["params"]["alpha"] = jnp.asarray([0.5], jnp.float32)

    out_xla = np.asarray(xla_block.apply(params, x, in_src, None, in_mask))
    out_pal = np.asarray(pallas_block.apply(params, x, in_src, onehot, in_mask))
    assert np.allclose(out_xla, out_pal, atol=3e-4), np.abs(out_xla - out_pal).max()

    gx_want, gp_want = jax.grad(
        lambda x_, p_: jnp.sum(xla_block.apply(p_, x_, in_src, None, in_mask) * r),
        argnums=(0, 1),
    )(x, params)
    gx, gp = jax.grad(
        lambda x_, p_: jnp.sum(pallas_block.apply(p_, x_, in_src, onehot, in_mask) * r),
        argnums=(0, 1),
    )(x, params)

    def close_bulk(a, b, q=5e-3, name=""):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
        assert cos > 0.999, (name, cos)
        assert np.quantile(np.abs(a - b), 0.98) < q, (name, np.quantile(np.abs(a - b), 0.98))

    close_bulk(gx, gx_want, name="dx")
    flat_want = jax.tree_util.tree_leaves_with_path(gp_want)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, want in flat_want:
        got = flat_got[path]
        name = jax.tree_util.keystr(path)
        assert got.shape == want.shape, name
        if float(jnp.linalg.norm(want)) == 0.0:
            assert float(jnp.linalg.norm(got)) < 1e-5, name
        else:
            close_bulk(got, want, name=name)
