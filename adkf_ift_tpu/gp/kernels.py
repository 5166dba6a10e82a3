"""Covariance functions for the exact-GP layer, as pure JAX functions.

Capability parity with the reference kernel menu
(fs_mol/utils/gp_utils.py:22-43 and 106-135): linear, RBF, Matérn-5/2
(the default), polynomial p∈{1,2}, cosine-similarity (fixed-variance
linear over L2-normalized features) and Tanimoto over fingerprints.

Design notes (TPU-first):
  * All kernels are pure functions of a small parameter pytree; no
    stateful modules, so they vmap/jit/grad freely.
  * Pairwise distances route through a single matmul (MXU) plus
    row/col norms instead of an explicit [n, m, d] difference tensor.
  * Everything is computed in float32 with `preferred` high matmul
    precision — the GP path must not silently drop to bf16 (Cholesky
    conditioning; see SURVEY.md §7 "Hard parts" #4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from adkf_ift_tpu.gp.transforms import raw_to_positive

_HIGHEST = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class KernelConfig:
    """Static kernel configuration.

    kind: one of "matern" (Matérn-5/2), "rbf", "linear", "poli1",
        "poli2", "cossim", "tanimoto".
    ard_dims: number of lengthscale dimensions (None => single shared
        lengthscale), only used by matern/rbf.
    """

    kind: str = "matern"
    ard_dims: Optional[int] = None

    @property
    def has_lengthscale(self) -> bool:
        return self.kind in ("matern", "rbf", "RBF")

    @property
    def num_inner_params(self) -> int:
        """Number of scalar GP hyperparameters optimized in the inner loop
        (raw_noise + raw_outputscale [+ raw_lengthscale(s)] [+ raw_variance/offset])."""
        n = 2
        if self.has_lengthscale:
            n += self.ard_dims or 1
        if self.kind in ("poli1", "poli2"):
            n += 1  # offset
        if self.kind == "linear":
            n += 1  # variance
        return n


def init_raw_params(config: KernelConfig) -> dict:
    """Fresh raw kernel parameters (excluding noise, which lives with the
    likelihood). Values chosen so the transformed params start at
    softplus(0) ≈ 0.693, matching default raw-zero initialization."""
    params = {"raw_outputscale": jnp.zeros(())}
    if config.has_lengthscale:
        shape = (config.ard_dims,) if config.ard_dims else ()
        params["raw_lengthscale"] = jnp.zeros(shape)
    if config.kind in ("poli1", "poli2"):
        params["raw_offset"] = jnp.zeros(())
    if config.kind == "linear":
        params["raw_variance"] = jnp.zeros(())
    return params


def _sq_dist(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distances via one MXU matmul."""
    # Mean-center for numerical stability (standard trick; affects
    # nothing mathematically since distances are translation invariant).
    mean = jnp.mean(jnp.concatenate([x1, x2], axis=0), axis=0, keepdims=True)
    x1 = x1 - mean
    x2 = x2 - mean
    x1_norm = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    x2_norm = jnp.sum(x2 * x2, axis=-1, keepdims=True)
    inner = jnp.matmul(x1, x2.T, precision=_HIGHEST)
    sq = x1_norm + x2_norm.T - 2.0 * inner
    return jnp.maximum(sq, 0.0)


def matern52(x1: jnp.ndarray, x2: jnp.ndarray, lengthscale: jnp.ndarray) -> jnp.ndarray:
    x1 = x1 / lengthscale
    x2 = x2 / lengthscale
    r = jnp.sqrt(_sq_dist(x1, x2) + 1e-20)
    sqrt5_r = math.sqrt(5.0) * r
    return (1.0 + sqrt5_r + (5.0 / 3.0) * r * r) * jnp.exp(-sqrt5_r)


def rbf(x1: jnp.ndarray, x2: jnp.ndarray, lengthscale: jnp.ndarray) -> jnp.ndarray:
    x1 = x1 / lengthscale
    x2 = x2 / lengthscale
    return jnp.exp(-0.5 * _sq_dist(x1, x2))


def tanimoto(x1: jnp.ndarray, x2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Batch Tanimoto similarity over count fingerprints (reference:
    batch_tanimoto_sim, fs_mol/utils/gp_utils.py:106-117)."""
    dot = jnp.matmul(x1, x2.T, precision=_HIGHEST)
    n1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)
    n2 = jnp.sum(x2 * x2, axis=-1, keepdims=True)
    return (dot + eps) / (eps + n1 + n2.T - dot)


def gram_supported(config: KernelConfig) -> bool:
    """Whether this kernel factors as K = g(theta, GRAM(x1, x2)) with a
    theta-INDEPENDENT Gram intermediate (used by the IFT backward's
    precision split, gp/ift.py: theta-space second-order in f64 over the
    tiny [n, n] Gram objects, feature-space first-order in f32)."""
    if config.ard_dims:
        return False  # per-dim scaling mixes theta into the Gram
    return config.kind in ("matern", "rbf", "RBF", "linear", "cossim", "poli1", "poli2", "tanimoto")


def base_gram(config: KernelConfig, x1: jnp.ndarray, x2: jnp.ndarray):
    """The theta-independent Gram intermediate (see gram_supported)."""
    kind = config.kind
    if kind in ("matern", "rbf", "RBF"):
        return _sq_dist(x1, x2)
    if kind == "tanimoto":
        dot = jnp.matmul(x1, x2.T, precision=_HIGHEST)
        n1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)
        n2 = jnp.sum(x2 * x2, axis=-1, keepdims=True)
        return (dot, n1, n2)
    # linear / cossim / poli1 / poli2
    return jnp.matmul(x1, x2.T, precision=_HIGHEST)


def kernel_matrix_from_gram(config: KernelConfig, params: dict, gram) -> jnp.ndarray:
    """kernel_matrix with the feature-dependent Gram precomputed (same
    math as kernel_matrix; scalar-lengthscale kernels rescale the
    squared distances by 1/ls^2 instead of scaling the features)."""
    kind = config.kind
    outputscale = raw_to_positive(params["raw_outputscale"])
    if kind in ("matern", "rbf", "RBF"):
        ls = raw_to_positive(params["raw_lengthscale"])
        sq = gram / (ls * ls)
        if kind == "matern":
            r = jnp.sqrt(sq + 1e-20)
            sqrt5_r = math.sqrt(5.0) * r
            base = (1.0 + sqrt5_r + (5.0 / 3.0) * r * r) * jnp.exp(-sqrt5_r)
        else:
            base = jnp.exp(-0.5 * sq)
    elif kind == "linear":
        base = raw_to_positive(params["raw_variance"]) * gram
    elif kind == "cossim":
        base = gram
    elif kind in ("poli1", "poli2"):
        power = 1 if kind == "poli1" else 2
        base = (gram + raw_to_positive(params["raw_offset"])) ** power
    elif kind == "tanimoto":
        dot, n1, n2 = gram
        eps = 1e-6
        base = (dot + eps) / (eps + n1 + n2.T - dot)
    else:
        raise ValueError(f"Unsupported gram kernel '{kind}'")
    return outputscale * base


def kernel_matrix(
    config: KernelConfig,
    params: dict,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
) -> jnp.ndarray:
    """Evaluate outputscale * base_kernel(x1, x2) -> [n1, n2]."""
    kind = config.kind
    outputscale = raw_to_positive(params["raw_outputscale"])
    if kind == "matern":
        base = matern52(x1, x2, raw_to_positive(params["raw_lengthscale"]))
    elif kind in ("rbf", "RBF"):
        base = rbf(x1, x2, raw_to_positive(params["raw_lengthscale"]))
    elif kind == "linear":
        variance = raw_to_positive(params["raw_variance"])
        base = variance * jnp.matmul(x1, x2.T, precision=_HIGHEST)
    elif kind == "cossim":
        # Fixed variance = 1; features are L2-normalized by the caller
        # (reference: adaptive_dkt.py:69-72, 158-160).
        base = jnp.matmul(x1, x2.T, precision=_HIGHEST)
    elif kind in ("poli1", "poli2"):
        power = 1 if kind == "poli1" else 2
        offset = raw_to_positive(params["raw_offset"])
        base = (jnp.matmul(x1, x2.T, precision=_HIGHEST) + offset) ** power
    elif kind == "tanimoto":
        base = tanimoto(x1, x2)
    else:
        raise ValueError(f"Unsupported kernel '{kind}'")
    return outputscale * base


def median_lengthscale_init(x: jnp.ndarray, mask: jnp.ndarray = None) -> jnp.ndarray:
    """Median heuristic lengthscale (reference:
    ADKTModel.compute_median_lengthscale_init, adaptive_dkt.py:128-131):
    sqrt(0.5 * median of strictly-positive pairwise squared distances).

    Uses masked median over the strict upper triangle, jit-friendly.
    `mask` excludes padded rows from the pair statistics.
    """
    sq = _sq_dist(x, x)
    n = x.shape[0]
    iu = jnp.triu_indices(n, k=1)
    vals = sq[iu]
    pos = vals > 0.0
    if mask is not None:
        pair_valid = (mask[:, None] * mask[None, :])[iu] > 0
        pos = pos & pair_valid
    # Median over positive entries only: sort with +inf fill and index
    # the middle of the valid prefix.
    num_pos = jnp.sum(pos)
    # stable=False: sorted VALUES are identical either way, and the
    # stable variant carries a u32 iota payload through the TPU sort
    # lowering whose scratch blew the 16 MB scoped-vmem limit inside the
    # (large) VGP outer step — "reduce-window.168 ... exceeded scoped
    # vmem limit", .zoo/logs/ADKT-VGP.log.
    sorted_vals = jnp.sort(jnp.where(pos, vals, jnp.inf), stable=False)
    # torch.median returns the lower middle element for even counts.
    med_idx = jnp.maximum((num_pos - 1) // 2, 0)
    median = sorted_vals[med_idx]
    median = jnp.where(num_pos > 0, median, 1.0)
    return jnp.sqrt(0.5 * median)
