"""Fused Pallas PNA/MultiAggr message-passing block (dense-block layout).

One kernel per graph block computes, entirely in VMEM:
    gather sources (one-hot matmul) -> per-type message MLP -> relu ->
    masked sum/mean/std/max over incoming-edge slots -> PNA degree
    scalers -> output projection
so the [E, towers, 3m] message tensor and the [V, towers*12m] aggregate
never touch HBM — the XLA flat path materializes both per GNN block
(the dominant byte traffic of the encoder; see CLAUDE.md on the
bytes-bound device and benchmarks/encoder_layouts.py).

Mosaic-friendliness decisions (constraints per the TPU kernel guide and
the quirks recorded in CLAUDE.md; the round-4/5 measurements showed the
kernel is bound by MATMUL/op ISSUE count, not FLOPs — docs/MFU.md):
  * slot-minor layout: incoming-edge slot k of all N nodes is one
    contiguous [N, ...] row block, so every slice is a static SUBLANE
    (row) slice — no 32-wide lane slicing anywhere;
  * gathers/scatters are bg-BATCHED one-hot dot_generals per block
    (no dynamic_slice on values). A round-5 experiment replaced them
    with one block-diagonal matmul per block and MEASURED SLOWER
    end-to-end (bench 2.21 -> 2.00): the XLA-side block-diagonal
    construction/traffic costs more than the serialized batch matmuls
    save;
  * the message MLPs run as TWO matmuls per edge type (source half over
    the type's whole contiguous slot segment, target half shared by all
    its slots) against a host-packed block-diagonal weight [2H, F]
    (round 4: 33 -> 18 matmuls per block fwd);
  * all per-slot ELEMENTWISE work is stacked over the [bg, K*N, F]
    message tensor: O(1) slot broadcasts and log2(K) pairwise-tree
    reductions instead of K-unrolled loops (round 5,
    _stacked_forward_core); slot masks/degrees are static per episode
    and arrive as XLA-precomputed inputs;
  * the output projection is ONE [bg*N, 4F] @ [4F, branches*H] matmul
    (sources concatenated in lanes, PNA branches in H-aligned lane
    slices; round 5) — PNA's per-node scalers commute through the
    projection as row scalings (diag(a) S) P = a * (S P).

Parity: matches DenseRelationalMultiAggrMP + msg_out_projection
(modules/gnn.py) under the same flax parameters (see tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SMALL_NUMBER = 1e-7
PNA_DELTA = 1.1515

# Mosaic's default scoped-VMEM ceiling is 16 MB — a compiler default,
# not the hardware's (v5e has 128 MB VMEM/core). The bwd kernel's live
# set at bwd_block_graphs=4 needs ~17 MB (measured round-4 compile OOM:
# 16.91M > 16.00M), so the kernels request a higher per-kernel limit and
# leave the rest for the pipeline's double buffers.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def pack_mp_params(
    gnn_params: dict,
    num_edge_types: int,
    towers: int,
    per_head_dim: int,
    hidden_dim: int,
    use_pna_scalers: bool,
    compute_dtype=jnp.bfloat16,
):
    """Pack flax GNNBlock params (mp/message_fn_type{t} w0/b0 +
    msg_out_projection) into the kernel's weight layout.

    jit-traceable (static-index scatter sets), so the packing runs inside
    the model's jitted forward and its transposes give the flax-layout
    gradients automatically.

    Returns (w_msg [T, 2H, towers*3m], b_msg [T, towers*3m],
             p_proj [4, towers*3m, branches*H] ordered
             [sum, mean, std, max] x lanes [base|amp|att], b_proj [H]).
    The PNA branches live in the LANE dimension (H-aligned slices) so
    the kernel projects each aggregation source with ONE [*, F] @
    [F, 3H] matmul instead of three [F, H] ones — the round-4 perf hunt
    showed the kernel is op-issue-bound (docs/MFU.md), so fewer/fatter
    matmuls is the lever.
    """
    m = per_head_dim
    td = hidden_dim // towers
    f = towers * 3 * m

    w_msg = jnp.zeros((num_edge_types, 2 * hidden_dim, f), jnp.float32)
    b_msg = jnp.zeros((num_edge_types, f), jnp.float32)
    for t in range(num_edge_types):
        mlp = gnn_params["mp"][f"message_fn_type{t}"]
        if "w1" in mlp:
            raise ValueError(
                "fused Pallas MP supports message_function_depth == 1 only "
                f"(message_fn_type{t} has {sum(k.startswith('w') for k in mlp)} layers); "
                "use mp_impl='xla' for deeper message MLPs"
            )
        w0 = jnp.asarray(mlp["w0"], jnp.float32)  # [towers, 2*td, 3m]
        b0 = jnp.asarray(mlp["b0"], jnp.float32)  # [towers, 3m]
        for tw in range(towers):
            rows_src = slice(tw * td, (tw + 1) * td)
            rows_tgt = slice(hidden_dim + tw * td, hidden_dim + (tw + 1) * td)
            cols = slice(tw * 3 * m, (tw + 1) * 3 * m)
            w_msg = w_msg.at[t, rows_src, cols].set(w0[tw, :td])
            w_msg = w_msg.at[t, rows_tgt, cols].set(w0[tw, td:])
            b_msg = b_msg.at[t, cols].set(b0[tw])

    # msg_out_projection kernel: [towers * 4m * (3 if pna), H]; input
    # feature order of the XLA path is TOWER-major with the PNA branch
    # inside each tower: per tower [base 4m, amp 4m, att 4m] where base =
    # [sum m, mean m, std m, max m] (the last-axis concats in
    # DenseRelationalMultiAggrMP.aggregate happen on [..., towers, *]).
    wp = jnp.asarray(gnn_params["msg_out_projection"]["kernel"], jnp.float32)
    h_out = wp.shape[1]
    n_branch = 3 if use_pna_scalers else 1
    tower_w = 4 * m * n_branch
    p_proj = jnp.zeros((4, f, n_branch * h_out), jnp.float32)
    for br in range(n_branch):
        for tw in range(towers):
            for j, agg in enumerate(("sum", "mean", "std", "max")):
                row0 = tw * tower_w + br * 4 * m + j * m
                # Source tensor rows: the kernel's S/M/SD/X are [N, f]
                # with f = towers*3m; sum reads part0, mean/std part1,
                # max part2 of each tower's 3m block.
                part = {"sum": 0, "mean": 1, "std": 1, "max": 2}[agg]
                src_rows = slice(tw * 3 * m + part * m, tw * 3 * m + (part + 1) * m)
                cols = slice(br * h_out, (br + 1) * h_out)
                p_proj = p_proj.at[j, src_rows, cols].set(wp[row0 : row0 + m])
    if "bias" in gnn_params["msg_out_projection"]:
        b_proj = jnp.asarray(gnn_params["msg_out_projection"]["bias"], jnp.float32)
    else:
        b_proj = jnp.zeros((h_out,), jnp.float32)
    return (
        w_msg.astype(compute_dtype),
        b_msg,
        p_proj.astype(compute_dtype),
        b_proj,
    )


def _bcast_slots(v_flat, k, n):
    """Replicate a per-node [bg*N, F] tensor across k slot blocks ->
    [bg, k*N, F] in slot-minor row order (one broadcast, not k adds —
    the kernel is op-ISSUE-bound, docs/MFU.md rounds 4-5)."""
    bgn, f = v_flat.shape
    bg = bgn // n
    return jnp.broadcast_to(
        v_flat.reshape(bg, 1, n, f), (bg, k, n, f)
    ).reshape(bg, k * n, f)


def _pad_slots(v, k, n, k_pad):
    """Zero-pad [bg, k*N, F] to k_pad slot blocks. Zero slots are exact
    identities for every aggregate here: sum (+0), max (relu'd messages
    are >= 0), and the variance term (relu(0 - mean^2) = 0)."""
    if k_pad == k:
        return v
    bg, _, f = v.shape
    return jnp.concatenate(
        [v, jnp.zeros((bg, (k_pad - k) * n, f), v.dtype)], axis=1
    )


def _tree_slots(v, k, n, op, op1=None):
    """Reduce [bg, k*N, F] over its k slot blocks by pairwise halving
    (k must be a power of two): log2(k) whole-tensor ops instead of k
    per-slot ops. `op1` overrides the first level (e.g. to fuse the
    bf16 -> f32 cast into the first add instead of casting the full
    stack). Returns [bg*N, F]."""
    first = True
    while k > 1:
        a = k // 2
        o = op1 if (first and op1 is not None) else op
        v = o(v[:, : a * n], v[:, a * n :])
        first, k = False, a
    bg, _, f = v.shape
    v = v if op1 is None or not first else op1(v, jnp.zeros_like(v))
    return v.reshape(bg * n, f)


def _next_pow2(k: int) -> int:
    return 1 << (k - 1).bit_length()


def _stacked_forward_core(x_block, onehot_block, mask_block, deg_block,
                          w_msg_ref, b_msg_ref, k_per_type, compute_dtype):
    """Shared fwd/bwd-recompute core: gather + messages + aggregates,
    with every per-slot ELEMENTWISE op replaced by one stacked op over
    the [bg, K*N, F] slot-minor message tensor (round 5: the round-4
    measurement pinned the kernel op-issue-bound at ~0.4 us/op, and the
    K-slot loops were the remaining ~60 vector ops/block — stacking
    turns the O(K) unrolled loops into O(log K) tree reductions and
    O(1) broadcasts; matmul structure unchanged).

    Returns (x_flat, src_all, mm_all, mm_pad, k_pad, s_acc, denom, mean,
    var, std, x_agg, deg).
    """
    bg, n, h = x_block.shape[0], x_block.shape[1], x_block.shape[2]
    f = w_msg_ref.shape[2]
    k_tot = sum(k_per_type)
    x_cd = x_block.astype(compute_dtype)
    x_flat = x_cd.reshape(bg * n, h)

    # Gathers as ONE batched dot_general over the block (batch dim = the
    # graph). Round-5 NOTE: a block-diagonalized single-matmul gather was
    # tried and MEASURED SLOWER end-to-end (bench 2.21 -> 2.00; fwd 231
    # -> 265 ms) — the XLA-side [G/bg, bg*K*N, bg*N] construction /
    # traffic costs more than the serialized batch matmuls save, so the
    # batched form stands (docs/MFU.md round 5).
    src_all = jax.lax.dot_general(
        onehot_block.astype(compute_dtype), x_cd,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(compute_dtype).reshape(bg, k_tot * n, h)
    deg = deg_block.reshape(bg * n, 1).astype(jnp.float32)

    # Messages: TWO matmuls per EDGE TYPE (source half over the type's
    # whole contiguous slot segment, target half shared by its slots —
    # round 4), with the slot-replicated target contribution added as ONE
    # broadcast+add per type instead of one add per slot (round 5). The
    # slot mask is folded INTO the stored message (relu output >= 0, so
    # masked sum / max / variance over mm := mask * relu(raw) are EXACTLY
    # the reference's masked aggregates); messages stay in compute dtype.
    parts = []
    start = 0
    for t, kt in enumerate(k_per_type):
        w_t = w_msg_ref[t].astype(compute_dtype)  # [2H, F]
        xwb_t = (
            jnp.dot(x_flat, w_t[h:], preferred_element_type=jnp.float32)
            + b_msg_ref[t][None, :]
        )
        seg = src_all[:, start * n : (start + kt) * n].reshape(bg * kt * n, h)
        sw_t = jnp.dot(seg, w_t[:h], preferred_element_type=jnp.float32).reshape(
            bg, kt * n, f
        )
        parts.append(sw_t + _bcast_slots(xwb_t, kt, n))
        start += kt
    raw_all = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    mm_all = (mask_block * jnp.maximum(raw_all, 0.0)).astype(compute_dtype)

    # Masked aggregation over the K slots as log2(K) tree reductions on
    # the zero-padded stack (identities: see _pad_slots):
    #   sum  = sum_k mm_k                       (mask already folded)
    #   max  = max_k mm_k  (relu >= 0 makes the masked max exact: a
    #          masked-out slot contributes 0, and when no slot is live
    #          the reference also yields 0)
    #   var  = sum_k relu(mm_k^2 - mean^2) + deg * eps  (a masked-out
    #          slot gives relu(0 - mean^2) = 0, so no mask needed)
    k_pad = _next_pow2(max(k_tot, 1))
    mm_pad = _pad_slots(mm_all, k_tot, n, k_pad)
    add32 = lambda a, b: a.astype(jnp.float32) + b.astype(jnp.float32)  # noqa: E731
    s_acc = _tree_slots(mm_pad, k_pad, n, jnp.add, op1=add32)
    x_agg = _tree_slots(mm_pad, k_pad, n, jnp.maximum).astype(jnp.float32)
    denom = jnp.maximum(deg, 1.0)
    mean = s_acc / denom
    mm32 = mm_pad.astype(jnp.float32)
    diff = jnp.maximum(mm32 * mm32 - _bcast_slots(mean * mean, k_pad, n), 0.0)
    var = deg * SMALL_NUMBER + _tree_slots(diff, k_pad, n, jnp.add)
    std = jnp.where(var > 0.0, jnp.sqrt(jnp.where(var > 0.0, var, 1.0)), 0.0)
    return x_flat, src_all, mm_all, mm_pad, k_pad, s_acc, denom, mean, var, std, x_agg, deg


def _mp_block_fwd(x_block, onehot_block, mask_block, deg_block,
                  w_msg_ref, b_msg_ref, p_proj_ref,
                  b_proj_ref, k_per_type, use_pna, compute_dtype):
    """Fused MP + projection for a WHOLE graph block on VMEM values.

    Only the one-hot gather is per-graph (it is block-diagonal across
    graphs); messages, aggregation, and projection are batched over all
    bg*N rows so each matmul is MXU-sized, and all per-slot elementwise
    work is stacked over the [bg, K*N, F] message tensor
    (_stacked_forward_core). The slot masks and node degrees are STATIC
    per episode and arrive as inputs (mask_block [bg, K*N, 1], deg_block
    [bg, N, 1]) computed once by XLA.
    Returns the pre-residual update [bg, N, H] f32 (incl. projection bias).
    """
    bg, n, h = x_block.shape[0], x_block.shape[1], x_block.shape[2]
    (_, _, _, _, _, s_acc, denom, mean, var, std, x_agg, deg) = _stacked_forward_core(
        x_block, onehot_block, mask_block, deg_block,
        w_msg_ref, b_msg_ref, k_per_type, compute_dtype,
    )

    # Projection: ONE [bg*N, 4F] @ [4F, branches*H] matmul (aggregation
    # sources concatenated in lanes, p_proj's leading source dim merged
    # into rows; branches stay in H-aligned lane slices), then the PNA
    # scalers weight the branch slices. 1 matmul instead of round 4's 4
    # (round 5: the cost is matmul ISSUE count, not vector ops).
    f = p_proj_ref.shape[1]
    cat_src = jnp.concatenate([s_acc, mean, std, x_agg], axis=1).astype(compute_dtype)
    p_all = p_proj_ref[...].reshape(4 * f, p_proj_ref.shape[2]).astype(compute_dtype)
    wide = jnp.dot(cat_src, p_all, preferred_element_type=jnp.float32)
    out = wide[:, :h]
    if use_pna:
        log_deg = jnp.log(deg + 1.0)
        amp = log_deg / PNA_DELTA
        att = PNA_DELTA / (log_deg + SMALL_NUMBER)
        out = out + amp * wide[:, h : 2 * h] + att * wide[:, 2 * h :]
    return (out + b_proj_ref[0][None, :]).reshape(bg, n, h)


def _mp_kernel(
    x_ref,        # [BG, N, H]
    onehot_ref,   # [BG, K*N, N] — host-prebuilt masked one-hot gather
    mask_ref,     # [BG, K*N, 1] — static slot masks (XLA-precomputed)
    deg_ref,      # [BG, N, 1] — static node degrees
    w_msg_ref,    # [T, 2H, F]
    b_msg_ref,    # [T, F]
    p_proj_ref,   # [B4, F, H]
    b_proj_ref,   # [1, H]
    out_ref,      # [BG, N, H]
    *,
    bg: int,
    k_per_type: Tuple[int, ...],
    use_pna: bool,
    compute_dtype,
):
    out = _mp_block_fwd(
        x_ref[...], onehot_ref[...], mask_ref[...], deg_ref[...],
        w_msg_ref, b_msg_ref, p_proj_ref, b_proj_ref,
        k_per_type, use_pna, compute_dtype,
    )
    out_ref[...] = out.astype(out_ref.dtype)


def slot_minor_onehot(in_src, in_mask, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[G, N, K_t] per-type tuples -> masked one-hot gather matrices
    [G, K_tot*N, N] in slot-minor order (slot k of every node is one
    contiguous [N, N] row block; types concatenated in order).

    Static per episode — build once, reuse across every GNN layer and
    every inner/outer iteration. Row r = k*N + n selects the source node
    of slot k of node n; padded slots are all-zero rows (so gathered
    states AND the derived slot masks are exact zeros in-kernel)."""
    g = in_src[0].shape[0]
    n = in_src[0].shape[1]
    srcs = jnp.concatenate([jnp.swapaxes(s, 1, 2) for s in in_src], axis=1)  # [G, K, N]
    masks = jnp.concatenate([jnp.swapaxes(m, 1, 2) for m in in_mask], axis=1)
    onehot = (srcs[..., None] == jnp.arange(n, dtype=srcs.dtype)).astype(dtype)
    onehot = onehot * masks[..., None].astype(dtype)  # [G, K, N, N]
    return onehot.reshape(g, -1, n)


def _mp_bwd_kernel(
    x_ref,        # [BG, N, H]
    onehot_ref,   # [BG, K*N, N]
    mask_ref,     # [BG, K*N, 1]
    deg_ref,      # [BG, N, 1]
    w_msg_ref,    # [T, 2H, F]
    b_msg_ref,    # [T, F]
    p_proj_ref,   # [B4, F, H]
    g_ref,        # [BG, N, H] upstream grad
    dx_ref,       # [BG, N, H]
    dw_msg_ref,   # [T, 2H, F]   accumulated across the grid
    db_msg_ref,   # [T, F]
    dp_proj_ref,  # [B4, F, H]
    db_proj_ref,  # [1, H]
    *,
    bg: int,
    k_per_type: Tuple[int, ...],
    use_pna: bool,
    compute_dtype,
):
    """Backward of _mp_kernel by full in-VMEM recomputation (flash-style):
    messages/aggregates are rebuilt per graph, grads accumulated into the
    weight outputs across the sequential TPU grid."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_msg_ref[...] = jnp.zeros_like(dw_msg_ref)
        db_msg_ref[...] = jnp.zeros_like(db_msg_ref)
        dp_proj_ref[...] = jnp.zeros_like(dp_proj_ref)
        db_proj_ref[...] = jnp.zeros_like(db_proj_ref)

    dx = _mp_block_bwd(
        x_ref[...], onehot_ref[...], mask_ref[...], deg_ref[...],
        w_msg_ref, b_msg_ref, p_proj_ref,
        g_ref[...].astype(jnp.float32),
        dw_msg_ref, db_msg_ref, dp_proj_ref, db_proj_ref,
        k_per_type, use_pna, compute_dtype,
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _mp_block_bwd(x_block, onehot_block, mask_block, deg_block,
                  w_msg_ref, b_msg_ref, p_proj_ref, grad,
                  dw_msg_ref, db_msg_ref, dp_proj_ref, db_proj_ref,
                  k_per_type, use_pna, compute_dtype):
    """Whole-block MP backward on VMEM values: recomputes the forward
    intermediates (batched like _mp_block_fwd), accumulates weight grads
    into the passed refs, and returns dx [bg, N, H] f32. `grad` is the
    upstream cotangent [bg, N, H] f32. Slot masks / degrees are static
    inputs (see _mp_block_fwd)."""
    bg, n, h = x_block.shape[0], x_block.shape[1], x_block.shape[2]
    f = w_msg_ref.shape[2]
    k_tot = sum(k_per_type)
    n_branch = 3 if use_pna else 1
    grad_flat = grad.reshape(bg * n, h)

    # ---- recompute forward intermediates (stacked exactly as in
    # _mp_block_fwd via the shared core; the relu gate is recovered as
    # mm > 0, which kills every contribution from masked-out or
    # relu-dead slots) ----
    (x_flat, src_all, _, mm_pad, k_pad, s_acc, denom, mean, var, std, x_agg,
     deg) = _stacked_forward_core(
        x_block, onehot_block, mask_block, deg_block,
        w_msg_ref, b_msg_ref, k_per_type, compute_dtype,
    )
    var_pos = var > 0.0
    sources = (s_acc, mean, std, x_agg)

    # ---- projection backward ----
    if use_pna:
        log_deg = jnp.log(deg + 1.0)
        scales = (
            jnp.ones((bg * n, 1), jnp.float32),
            log_deg / PNA_DELTA,
            PNA_DELTA / (log_deg + SMALL_NUMBER),
        )
    else:
        scales = (jnp.ones((bg * n, 1), jnp.float32),)

    # Branch-concatenated upstream grad [bg*N, branches*H], sources
    # concatenated in lanes [bg*N, 4F]: the whole projection backward is
    # TWO matmuls (weight grad [4F, BH]; source grad [bg*N, 4F]) instead
    # of round 4's 8 (matmul-issue-bound, round 5).
    sg_cat = jnp.concatenate(
        [(scales[br] * grad_flat) for br in range(n_branch)], axis=1
    ).astype(compute_dtype)
    cat_src = jnp.concatenate(sources, axis=1).astype(compute_dtype)
    p_all = p_proj_ref[...].reshape(4 * f, p_proj_ref.shape[2]).astype(compute_dtype)
    dp_all = jax.lax.dot_general(
        cat_src, sg_cat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_proj_ref[...] += dp_all.reshape(4, f, p_proj_ref.shape[2])
    d_src_cat = jax.lax.dot_general(
        sg_cat, p_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_proj_ref[0, :] += jnp.sum(grad_flat, axis=0)

    d_sum = d_src_cat[:, :f]
    d_mean_direct = d_src_cat[:, f : 2 * f]
    d_std = d_src_cat[:, 2 * f : 3 * f]
    d_max = d_src_cat[:, 3 * f :]

    # ---- aggregation backward (stacked over the padded slot stack;
    # round 5 — see _stacked_forward_core's rationale) ----
    # Every per-slot gradient is gated by the relu indicator mm_k > 0 at
    # the end, which is 0 for masked-out AND relu-dead slots — so the
    # explicit slot masks of the reference formulation drop out exactly
    # (see _mp_block_fwd); tie shares among all-zero max slots differ
    # only where the gate is 0 (including the zero PAD slots, which can
    # only tie when x_agg == 0, i.e. exactly where the gate kills every
    # real slot's gradient too).
    dvar = jnp.where(var_pos, d_std * 0.5 / jnp.where(var_pos, std, 1.0), 0.0)
    mm32_pad = mm_pad.astype(jnp.float32)                    # [bg, kp*N, F]
    ind_pad = (
        mm32_pad * mm32_pad - _bcast_slots(mean * mean, k_pad, n) > 0.0
    ).astype(jnp.float32)
    tie_pad = (mm32_pad == _bcast_slots(x_agg, k_pad, n)).astype(jnp.float32)
    ind_count = _tree_slots(ind_pad, k_pad, n, jnp.add)
    tie_count = _tree_slots(tie_pad, k_pad, n, jnp.add)
    d_mean = d_mean_direct - dvar * 2.0 * mean * ind_count
    d_s_from_mean = d_mean / denom
    tie_den = jnp.maximum(tie_count, 1.0)

    # Stacked d_raw over every slot at once: all the shared per-node
    # cotangents broadcast across the slot blocks, and the relu/mask
    # gate is one where() on the stack.
    d_raw_pad = jnp.where(
        mm32_pad > 0.0,
        _bcast_slots(d_sum + d_s_from_mean, k_pad, n)
        + _bcast_slots(dvar * 2.0, k_pad, n) * ind_pad * mm32_pad
        + tie_pad * _bcast_slots(d_max / tie_den, k_pad, n),
        0.0,
    )                                                        # [bg, kp*N, F] f32

    # Per-TYPE batched message backward (mirrors the fwd split; the
    # kernel is op-issue-bound): the stacked d_raw's type segment IS the
    # contiguous src-order cotangent, so the weight/source/x grads are 4
    # matmuls per type with no per-slot concatenation.
    dx_flat = jnp.zeros((bg * n, h), jnp.float32)
    d_src_parts = []  # per type: [bg, k_t*N, H] compute-dtype
    start = 0
    for t, kt in enumerate(k_per_type):
        w_t = w_msg_ref[t].astype(compute_dtype)
        d_raw_seg = d_raw_pad[:, start * n : (start + kt) * n]
        d_sum_t = _tree_slots(
            _pad_slots(d_raw_seg, kt, n, _next_pow2(kt)), _next_pow2(kt), n, jnp.add
        )
        d_raw_cat = d_raw_seg.astype(compute_dtype).reshape(bg * kt * n, f)
        seg = src_all[:, start * n : (start + kt) * n].reshape(bg * kt * n, h)
        d_sum_cd = d_sum_t.astype(compute_dtype)
        dw_src = jax.lax.dot_general(
            seg, d_raw_cat, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw_x = jax.lax.dot_general(
            x_flat, d_sum_cd, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw_msg_ref[t] += jnp.concatenate([dw_src, dw_x], axis=0)
        db_msg_ref[t] += jnp.sum(d_sum_t, axis=0)
        d_src_parts.append(
            jax.lax.dot_general(
                d_raw_cat, w_t[:h], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(bg, kt * n, h).astype(compute_dtype)
        )
        dx_flat = dx_flat + jax.lax.dot_general(
            d_sum_cd, w_t[h:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        start += kt
    d_src_all = jnp.concatenate(d_src_parts, axis=1)  # [bg, K*N, H]

    # scatter src grads: dx += O^T @ d_src, batched over the block's
    # graph dim (contract the K*N rows; see the fwd gather's round-5
    # note on why this stays batched).
    dx = dx_flat.reshape(bg, n, h)
    return dx + jax.lax.dot_general(
        onehot_block.astype(compute_dtype), d_src_all,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_per_type", "use_pna", "block_graphs", "bwd_block_graphs", "interpret",
        "compute_dtype",
    ),
)
def fused_multiaggr_mp(
    x: jnp.ndarray,            # [G, N, H] node states
    onehot: jnp.ndarray,       # [G, K_tot*N, N] (slot_minor_onehot)
    w_msg: jnp.ndarray,        # [T, 2H, F]
    b_msg: jnp.ndarray,        # [T, F]
    p_proj: jnp.ndarray,       # [4, F, branches*H] (branch-stacked, round 4)
    b_proj: jnp.ndarray,       # [H]
    *,
    k_per_type: Tuple[int, ...],
    use_pna: bool = True,
    block_graphs: int = 16,
    bwd_block_graphs: int | None = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused MP + projection: returns the pre-residual update [G, N, H]
    (what msg_out_projection(mp(x)) produces in modules/gnn.py).

    The backward recomputes in VMEM and holds ~2x the forward's live set,
    so it runs on its own (smaller) graph block: bwd_block_graphs defaults
    to block_graphs // 4 (min 1) and must divide block_graphs."""
    g, n, h = x.shape
    bg = min(block_graphs, g)
    pad = (-g) % bg
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, n, h), x.dtype)])
        onehot = jnp.concatenate(
            [onehot, jnp.zeros((pad,) + onehot.shape[1:], onehot.dtype)]
        )
    if bwd_block_graphs is None:
        bg_bwd = max(1, bg // 4)
    else:
        bg_bwd = min(bwd_block_graphs, bg)
    if bg % bg_bwd:
        raise ValueError(f"bwd_block_graphs {bg_bwd} must divide block_graphs {bg}")
    # Static per-episode slot masks / node degrees, computed ONCE by XLA
    # (each one-hot row holds at most a single 1, so the reductions are
    # exact in any dtype) and fed to the kernels as inputs — removes one
    # per-graph [K*N, N] @ [N, 1] matmul from the fwd kernel and one from
    # the bwd recompute (measured round 4: the fused MP kernel is ~87% of
    # the outer step, dominated by per-graph small matmuls). XLA CSEs
    # these across the encoder's layers (same onehot operand).
    k_tot = sum(k_per_type)
    mask = jnp.sum(onehot.astype(jnp.float32), axis=2, keepdims=True)  # [G, K*N, 1]
    deg = (
        jnp.sum(mask.reshape(mask.shape[0], k_tot, n), axis=1)
        .reshape(mask.shape[0], n, 1)
        .astype(jnp.float32)
    )
    mask = mask.astype(compute_dtype)
    op = _make_op(
        tuple(k_per_type), use_pna, bg, bg_bwd, interpret, jnp.dtype(compute_dtype).name
    )
    out = op(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj.reshape(1, -1))
    return out[:g]


def _fwd_call(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, *, k_per_type, use_pna, bg, interpret, compute_dtype):
    gp, n, h = x.shape
    kernel = functools.partial(
        _mp_kernel, bg=bg, k_per_type=k_per_type, use_pna=use_pna, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((gp, n, h), jnp.float32),
        grid=(gp // bg,),
        in_specs=[
            pl.BlockSpec((bg, n, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg,) + onehot.shape[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg,) + mask.shape[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg,) + deg.shape[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w_msg.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b_msg.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(p_proj.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b_proj2d.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bg, n, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d)


def _bwd_call(x, onehot, mask, deg, w_msg, b_msg, p_proj, grad, *, k_per_type, use_pna, bg, interpret, compute_dtype):
    gp, n, h = x.shape
    kernel = functools.partial(
        _mp_bwd_kernel, bg=bg, k_per_type=k_per_type, use_pna=use_pna, compute_dtype=compute_dtype
    )
    fixed = lambda i: (0, 0)
    fixed3 = lambda i: (0, 0, 0)
    blocked = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((gp, n, h), jnp.float32),      # dx
            jax.ShapeDtypeStruct(w_msg.shape, jnp.float32),     # dw_msg
            jax.ShapeDtypeStruct(b_msg.shape, jnp.float32),     # db_msg
            jax.ShapeDtypeStruct(p_proj.shape, jnp.float32),    # dp_proj
            jax.ShapeDtypeStruct((1, h), jnp.float32),          # db_proj
        ),
        grid=(gp // bg,),
        in_specs=[
            pl.BlockSpec((bg, n, h), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((bg,) + onehot.shape[1:], blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((bg,) + mask.shape[1:], blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec((bg,) + deg.shape[1:], blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_msg.shape, fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b_msg.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(p_proj.shape, fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, n, h), blocked, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bg, n, h), blocked, memory_space=pltpu.VMEM),
            pl.BlockSpec(w_msg.shape, fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b_msg.shape, fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec(p_proj.shape, fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(x, onehot, mask, deg, w_msg, b_msg, p_proj, grad)


@functools.lru_cache(maxsize=64)
def _make_op(k_per_type, use_pna, bg, bg_bwd, interpret, compute_dtype_name):
    """custom_vjp'd fused MP op for a fixed static configuration. The
    backward recomputes messages in VMEM (flash-style) and accumulates
    weight grads across the sequential TPU grid, on its own smaller
    graph block (bg_bwd) since it holds ~2x the forward's live set."""
    compute_dtype = jnp.dtype(compute_dtype_name)
    static = dict(
        k_per_type=k_per_type, use_pna=use_pna, bg=bg,
        interpret=interpret, compute_dtype=compute_dtype,
    )
    static_bwd = dict(static, bg=bg_bwd)

    @jax.custom_vjp
    def op(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d):
        return _fwd_call(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, **static)

    def fwd(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d):
        out = _fwd_call(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, **static)
        return out, (x, onehot, mask, deg, w_msg, b_msg, p_proj)

    def bwd(res, grad):
        x, onehot, mask, deg, w_msg, b_msg, p_proj = res
        dx, dw_msg, db_msg, dp_proj, db_proj = _bwd_call(
            x, onehot, mask, deg, w_msg, b_msg, p_proj, grad, **static_bwd
        )
        return (
            dx.astype(x.dtype),
            jnp.zeros_like(onehot),
            jnp.zeros_like(mask),
            jnp.zeros_like(deg),
            dw_msg.astype(w_msg.dtype),
            db_msg.astype(b_msg.dtype),
            dp_proj.astype(p_proj.dtype),
            db_proj.astype(jnp.float32),
        )

    op.defvjp(fwd, bwd)
    return op


# ---------------------------------------------------------------------------
# Whole-GNNBlock fusion: MP + ReZero residual + LayerNorm + BOOM + residual
# in ONE kernel. The XLA tail of a block (LN -> Dense(H, I) -> leaky_relu ->
# Dense(I, H) -> alpha-residual) otherwise costs four more HBM round-trips of
# the [G*N, H] stream plus a [G*N, I] intermediate per block; here the BOOM
# intermediate lives and dies in VMEM. Parity: GNNBlock's dense path with
# dropout inactive (modules/gnn.py:497-557).
# ---------------------------------------------------------------------------

LN_EPS = 1e-6  # flax nn.LayerNorm default


def pack_boom_params(block_params, compute_dtype=jnp.bfloat16):
    """Pack flax boom_norm/boom params for the fused block kernel.
    Returns (ln_scale [1,H], ln_bias [1,H], w1 [H,I], b1 [1,I],
    w2 [I,H], b2 [1,H])."""
    ln = block_params["boom_norm"]
    boom = block_params["boom"]
    return (
        jnp.asarray(ln["scale"], jnp.float32).reshape(1, -1),
        jnp.asarray(ln["bias"], jnp.float32).reshape(1, -1),
        jnp.asarray(boom["linear1"]["kernel"], compute_dtype),
        jnp.asarray(boom["linear1"]["bias"], jnp.float32).reshape(1, -1),
        jnp.asarray(boom["linear2"]["kernel"], compute_dtype),
        jnp.asarray(boom["linear2"]["bias"], jnp.float32).reshape(1, -1),
    )


def _boom_graph_fwd(x1, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    alpha, compute_dtype):
    """x1 [N, H] f32 -> (out, zh, inv_sigma, z, p, h1, q) — forward of
    x1 + alpha * boom(LN(x1)) with intermediates for the backward."""
    mu = jnp.mean(x1, axis=1, keepdims=True)
    xc = x1 - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    inv_sigma = jax.lax.rsqrt(var + LN_EPS)
    zh = xc * inv_sigma
    z = zh * ln_scale_ref[0][None, :] + ln_bias_ref[0][None, :]
    p = (
        jnp.dot(z.astype(compute_dtype), w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[0][None, :]
    )
    h1 = jnp.where(p > 0.0, p, 0.01 * p)  # leaky_relu, flax default slope
    q = (
        jnp.dot(h1.astype(compute_dtype), w2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[0][None, :]
    )
    q = q.astype(compute_dtype).astype(jnp.float32)  # flax BOOM output dtype
    return x1 + alpha * q, zh, inv_sigma, z, p, h1, q


def _block_kernel(
    x_ref, onehot_ref, mask_ref, deg_ref, w_msg_ref, b_msg_ref, p_proj_ref, b_proj_ref,
    alpha_ref,      # [1, 1] f32
    ln_scale_ref, ln_bias_ref,  # [1, H]
    w1_ref, b1_ref, w2_ref, b2_ref,  # [H, I], [1, I], [I, H], [1, H]
    out_ref,        # [BG, N, H] f32
    *, bg, k_per_type, use_pna, compute_dtype,
):
    alpha = alpha_ref[0, 0]
    n, h = x_ref.shape[1], x_ref.shape[2]
    m = _mp_block_fwd(
        x_ref[...], onehot_ref[...], mask_ref[...], deg_ref[...],
        w_msg_ref, b_msg_ref, p_proj_ref, b_proj_ref,
        k_per_type, use_pna, compute_dtype,
    )
    # Match the unfused path's numerics: the update passes through the
    # compute dtype before joining the f32 residual stream.
    m = m.astype(compute_dtype).astype(jnp.float32)
    x1 = (x_ref[...].astype(jnp.float32) + alpha * m).reshape(bg * n, h)
    out, *_ = _boom_graph_fwd(
        x1, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
        alpha, compute_dtype,
    )
    out_ref[...] = out.reshape(bg, n, h).astype(out_ref.dtype)


def _block_bwd_kernel(
    x_ref, onehot_ref, mask_ref, deg_ref, w_msg_ref, b_msg_ref, p_proj_ref, b_proj_ref,
    alpha_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    g_ref,
    dx_ref, dw_msg_ref, db_msg_ref, dp_proj_ref, db_proj_ref,
    dalpha_ref,     # [1, 1]
    dln_scale_ref, dln_bias_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, bg, k_per_type, use_pna, compute_dtype,
):
    """Backward by full in-VMEM recomputation; weight grads accumulate
    across the sequential grid like _mp_bwd_kernel."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_msg_ref[...] = jnp.zeros_like(dw_msg_ref)
        db_msg_ref[...] = jnp.zeros_like(db_msg_ref)
        dp_proj_ref[...] = jnp.zeros_like(dp_proj_ref)
        db_proj_ref[...] = jnp.zeros_like(db_proj_ref)
        dalpha_ref[0, 0] = 0.0
        dln_scale_ref[...] = jnp.zeros_like(dln_scale_ref)
        dln_bias_ref[...] = jnp.zeros_like(dln_bias_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    alpha = alpha_ref[0, 0]
    n, h = x_ref.shape[1], x_ref.shape[2]

    # Recompute every graph's MP update, then run the BOOM fwd+bwd ONCE
    # over all bg*N rows (MXU-sized matmuls), then feed per-graph dm back
    # through the MP backward.
    m_all = _mp_block_fwd(
        x_ref[...], onehot_ref[...], mask_ref[...], deg_ref[...],
        w_msg_ref, b_msg_ref, p_proj_ref, b_proj_ref,
        k_per_type, use_pna, compute_dtype,
    ).astype(compute_dtype).astype(jnp.float32).reshape(bg * n, h)
    x_all = x_ref[...].astype(jnp.float32).reshape(bg * n, h)
    gout = g_ref[...].astype(jnp.float32).reshape(bg * n, h)
    x1 = x_all + alpha * m_all
    _, zh, inv_sigma, z, p, h1, q = _boom_graph_fwd(
        x1, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
        alpha, compute_dtype,
    )

    # ---- BOOM backward (whole block at once) ----
    dq = alpha * gout
    dq_cd = dq.astype(compute_dtype)
    h1_cd = h1.astype(compute_dtype)
    dw2_ref[...] += jax.lax.dot_general(
        h1_cd, dq_cd, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[0, :] += jnp.sum(dq, axis=0)
    dh1 = jax.lax.dot_general(
        dq_cd, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jnp.where(p > 0.0, dh1, 0.01 * dh1)
    dp_cd = dp.astype(compute_dtype)
    dw1_ref[...] += jax.lax.dot_general(
        z.astype(compute_dtype), dp_cd,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[0, :] += jnp.sum(dp, axis=0)
    dz = jax.lax.dot_general(
        dp_cd, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dln_scale_ref[0, :] += jnp.sum(dz * zh, axis=0)
    dln_bias_ref[0, :] += jnp.sum(dz, axis=0)
    dzh = dz * ln_scale_ref[0][None, :]
    # LayerNorm backward (per row over H)
    mean_dzh = jnp.mean(dzh, axis=1, keepdims=True)
    mean_dzh_zh = jnp.mean(dzh * zh, axis=1, keepdims=True)
    dx1_ln = (dzh - mean_dzh - zh * mean_dzh_zh) * inv_sigma

    dx1 = gout + dx1_ln
    dalpha_ref[0, 0] = dalpha_ref[0, 0] + jnp.sum(gout * q) + jnp.sum(dx1 * m_all)
    dm = alpha * dx1

    dx_mp = _mp_block_bwd(
        x_ref[...], onehot_ref[...], mask_ref[...], deg_ref[...],
        w_msg_ref, b_msg_ref, p_proj_ref,
        dm.reshape(bg, n, h), dw_msg_ref, db_msg_ref, dp_proj_ref, db_proj_ref,
        k_per_type, use_pna, compute_dtype,
    )
    dx_ref[...] = (dx1.reshape(bg, n, h) + dx_mp).astype(dx_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_per_type", "use_pna", "block_graphs", "bwd_block_graphs", "interpret",
        "compute_dtype",
    ),
)
def fused_gnn_block(
    x, onehot, w_msg, b_msg, p_proj, b_proj, alpha,
    ln_scale, ln_bias, w1, b1, w2, b2,
    *, k_per_type, use_pna=True, block_graphs=16, bwd_block_graphs=None,
    interpret=False, compute_dtype=jnp.bfloat16,
):
    """One whole GNNBlock on the dense layout: returns the next residual
    stream [G, N, H] f32 (x after MP residual AND BOOM residual).
    Like fused_multiaggr_mp, the backward runs on its own smaller block."""
    g, n, h = x.shape
    bg = min(block_graphs, g)
    pad = (-g) % bg
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, n, h), x.dtype)])
        onehot = jnp.concatenate(
            [onehot, jnp.zeros((pad,) + onehot.shape[1:], onehot.dtype)]
        )
    if bwd_block_graphs is None:
        bg_bwd = max(1, bg // 4)
    else:
        bg_bwd = min(bwd_block_graphs, bg)
    if bg % bg_bwd:
        raise ValueError(f"bwd_block_graphs {bg_bwd} must divide block_graphs {bg}")
    # Static slot masks / degrees as kernel inputs (see fused_multiaggr_mp).
    k_tot = sum(k_per_type)
    mask = jnp.sum(onehot.astype(jnp.float32), axis=2, keepdims=True)
    deg = (
        jnp.sum(mask.reshape(mask.shape[0], k_tot, n), axis=1)
        .reshape(mask.shape[0], n, 1)
        .astype(jnp.float32)
    )
    mask = mask.astype(compute_dtype)
    op = _make_block_op(
        tuple(k_per_type), use_pna, bg, bg_bwd, interpret, jnp.dtype(compute_dtype).name
    )
    out = op(
        x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj.reshape(1, -1),
        jnp.asarray(alpha, jnp.float32).reshape(1, 1),
        ln_scale, ln_bias, w1, b1, w2, b2,
    )
    return out[:g]


def _block_specs(x, mask, w_msg, b_msg, p_proj, bg, h, i_dim, onehot_spec):
    blocked = lambda idx: (idx, 0, 0)
    fixed = lambda idx: (0, 0)
    fixed3 = lambda idx: (0, 0, 0)
    n = x.shape[1]
    k_tot_n = mask.shape[1]
    return [
        pl.BlockSpec((bg, n, h), blocked, memory_space=pltpu.VMEM),
        onehot_spec,  # block-diagonal one-hot (fwd: superblock; bwd: diagonal sub-block)
        pl.BlockSpec((bg, k_tot_n, 1), blocked, memory_space=pltpu.VMEM),  # mask
        pl.BlockSpec((bg, n, 1), blocked, memory_space=pltpu.VMEM),        # deg
        pl.BlockSpec(w_msg.shape, fixed3, memory_space=pltpu.VMEM),
        pl.BlockSpec(b_msg.shape, fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec(p_proj.shape, fixed3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),     # alpha
        pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),     # ln_scale
        pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),     # ln_bias
        pl.BlockSpec((h, i_dim), fixed, memory_space=pltpu.VMEM),  # w1
        pl.BlockSpec((1, i_dim), fixed, memory_space=pltpu.VMEM),  # b1
        pl.BlockSpec((i_dim, h), fixed, memory_space=pltpu.VMEM),  # w2
        pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),     # b2
    ]


@functools.lru_cache(maxsize=64)
def _make_block_op(k_per_type, use_pna, bg, bg_bwd, interpret, compute_dtype_name):
    compute_dtype = jnp.dtype(compute_dtype_name)
    static = dict(
        bg=bg, k_per_type=k_per_type, use_pna=use_pna, compute_dtype=compute_dtype
    )
    static_bwd = dict(static, bg=bg_bwd)

    def fwd_call(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, alpha2d,
                 ln_scale, ln_bias, w1, b1, w2, b2):
        gp, n, h = x.shape
        i_dim = w1.shape[1]
        blocked = lambda idx: (idx, 0, 0)
        oh_spec = pl.BlockSpec(
            (bg,) + onehot.shape[1:], blocked, memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            functools.partial(_block_kernel, **static),
            out_shape=jax.ShapeDtypeStruct((gp, n, h), jnp.float32),
            grid=(gp // bg,),
            in_specs=_block_specs(x, mask, w_msg, b_msg, p_proj, bg, h, i_dim, oh_spec),
            out_specs=pl.BlockSpec((bg, n, h), blocked, memory_space=pltpu.VMEM),
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, alpha2d,
          ln_scale, ln_bias, w1, b1, w2, b2)

    def bwd_call(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, alpha2d,
                 ln_scale, ln_bias, w1, b1, w2, b2, grad):
        gp, n, h = x.shape
        i_dim = w1.shape[1]
        blocked = lambda idx: (idx, 0, 0)
        fixed = lambda idx: (0, 0)
        fixed3 = lambda idx: (0, 0, 0)
        oh_spec = pl.BlockSpec(
            (bg_bwd,) + onehot.shape[1:], blocked, memory_space=pltpu.VMEM
        )
        in_specs = _block_specs(
            x, mask, w_msg, b_msg, p_proj, bg_bwd, h, i_dim, oh_spec
        ) + [
            pl.BlockSpec((bg_bwd, n, h), blocked, memory_space=pltpu.VMEM),  # grad
        ]
        return pl.pallas_call(
            functools.partial(_block_bwd_kernel, **static_bwd),
            out_shape=(
                jax.ShapeDtypeStruct((gp, n, h), jnp.float32),   # dx
                jax.ShapeDtypeStruct(w_msg.shape, jnp.float32),
                jax.ShapeDtypeStruct(b_msg.shape, jnp.float32),
                jax.ShapeDtypeStruct(p_proj.shape, jnp.float32),
                jax.ShapeDtypeStruct((1, h), jnp.float32),       # db_proj
                jax.ShapeDtypeStruct((1, 1), jnp.float32),       # dalpha
                jax.ShapeDtypeStruct((1, h), jnp.float32),       # dln_scale
                jax.ShapeDtypeStruct((1, h), jnp.float32),       # dln_bias
                jax.ShapeDtypeStruct((h, i_dim), jnp.float32),   # dw1
                jax.ShapeDtypeStruct((1, i_dim), jnp.float32),   # db1
                jax.ShapeDtypeStruct((i_dim, h), jnp.float32),   # dw2
                jax.ShapeDtypeStruct((1, h), jnp.float32),       # db2
            ),
            grid=(gp // bg_bwd,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((bg_bwd, n, h), blocked, memory_space=pltpu.VMEM),
                pl.BlockSpec(w_msg.shape, fixed3, memory_space=pltpu.VMEM),
                pl.BlockSpec(b_msg.shape, fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec(p_proj.shape, fixed3, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), fixed, memory_space=pltpu.SMEM),  # dalpha
                pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((h, i_dim), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, i_dim), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((i_dim, h), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, alpha2d,
          ln_scale, ln_bias, w1, b1, w2, b2, grad)

    @jax.custom_vjp
    def op(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, alpha2d,
           ln_scale, ln_bias, w1, b1, w2, b2):
        return fwd_call(x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d,
                        alpha2d, ln_scale, ln_bias, w1, b1, w2, b2)

    def fwd(*args):
        return fwd_call(*args), args

    def bwd(res, grad):
        (x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, alpha2d,
         ln_scale, ln_bias, w1, b1, w2, b2) = res
        (dx, dw_msg, db_msg, dp_proj, db_proj, dalpha,
         dln_scale, dln_bias, dw1, db1, dw2, db2) = bwd_call(
            x, onehot, mask, deg, w_msg, b_msg, p_proj, b_proj2d, alpha2d,
            ln_scale, ln_bias, w1, b1, w2, b2, grad,
        )
        return (
            dx.astype(x.dtype),
            jnp.zeros_like(onehot),
            jnp.zeros_like(mask),
            jnp.zeros_like(deg),
            dw_msg.astype(w_msg.dtype),
            db_msg.astype(b_msg.dtype),
            dp_proj.astype(p_proj.dtype),
            db_proj.astype(jnp.float32),
            dalpha.astype(jnp.float32),
            dln_scale.astype(ln_scale.dtype),
            dln_bias.astype(ln_bias.dtype),
            dw1.astype(w1.dtype),
            db1.astype(jnp.float32),
            dw2.astype(w2.dtype),
            db2.astype(jnp.float32),
        )

    op.defvjp(fwd, bwd)
    return op
