"""Pure-function exact-GP layer: kernels, MLL+priors, posterior, compiled
inner-loop fitting, and IFT hypergradients (replaces the reference's
GPyTorch/botorch/scipy stack; see SURVEY.md §2.4-2.5)."""

from adkf_ift_tpu.gp.exact import (
    ExactGPConfig,
    GPPosterior,
    marginal_log_likelihood,
    mvn_nll,
    posterior,
    predictive_nll,
)
from adkf_ift_tpu.gp.fit import (
    LBFGSConfig,
    LBFGSResult,
    ard_warmstart_init,
    fit_gp,
    flatten_gp_params,
    isotropic_config,
    lbfgs_minimize,
    minimize,
    newton_minimize,
    make_inner_loss,
    unflatten_gp_params,
)
from adkf_ift_tpu.gp.ift import fit_gp_implicit
from adkf_ift_tpu.gp.kernels import KernelConfig, init_raw_params, kernel_matrix, median_lengthscale_init
from adkf_ift_tpu.gp.priors import GPPriorConfig, lognormal_logpdf, mode_to_loc, prior_log_prob
from adkf_ift_tpu.gp.transforms import (
    NOISE_LOWER_BOUND,
    inv_softplus,
    noise_to_raw,
    positive_to_raw,
    raw_to_noise,
    raw_to_positive,
    softplus,
)

__all__ = [
    "ExactGPConfig",
    "GPPosterior",
    "GPPriorConfig",
    "KernelConfig",
    "LBFGSConfig",
    "LBFGSResult",
    "NOISE_LOWER_BOUND",
    "ard_warmstart_init",
    "fit_gp",
    "isotropic_config",
    "fit_gp_implicit",
    "flatten_gp_params",
    "init_raw_params",
    "inv_softplus",
    "kernel_matrix",
    "lbfgs_minimize",
    "minimize",
    "newton_minimize",
    "lognormal_logpdf",
    "make_inner_loss",
    "marginal_log_likelihood",
    "median_lengthscale_init",
    "mode_to_loc",
    "mvn_nll",
    "noise_to_raw",
    "positive_to_raw",
    "posterior",
    "predictive_nll",
    "prior_log_prob",
    "raw_to_noise",
    "raw_to_positive",
    "softplus",
    "unflatten_gp_params",
]
