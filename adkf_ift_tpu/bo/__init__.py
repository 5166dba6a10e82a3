"""Bayesian-optimization application layer (reference bayes_opt/**):
GP-EI molecule design loops over frozen meta-trained representations,
dataset loaders for the four public design tasks, and predictive-
performance evaluation of frozen encoders."""

from adkf_ift_tpu.bo.bo_utils import (
    BOGPConfig,
    expected_improvement,
    fit_bo_gp,
    get_representation,
    min_so_far,
    run_gp_ei_bo,
)

__all__ = [
    "BOGPConfig",
    "expected_improvement",
    "fit_bo_gp",
    "get_representation",
    "min_so_far",
    "run_gp_ei_bo",
]
