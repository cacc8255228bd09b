from . import hmc
from .diagnostics import effective_sample_size, split_rhat, summarize_chains
from .hmc import (HMCConfig, hmc_sample, hmc_sample_full_logreg,
                  hmc_sample_weighted_logreg, hmc_sample_weighted_poisson,
                  make_weighted_hmc, run_chains, run_chains_sharded,
                  run_chains_weighted_logreg, run_chains_weighted_poisson,
                  weighted_logreg_logprob)
from .shf import (SHFConfig, SHFParams, beta_log_joint, gaussian_log_joint, init_shf_params,
                  make_sharded_shf_trainer, make_shf_trainer, shf_sample)
from .laplace import LaplaceApprox, newton_laplace, newton_laplace_diag, sample_laplace
from .samplers import (
    fixed_sampler,
    gaussian_conjugate_sampler,
    linreg_conjugate_sampler,
    logreg_laplace_sampler,
    poisson_laplace_sampler,
    prior_gaussian_sampler,
)

__all__ = [
    "hmc",
    "HMCConfig",
    "hmc_sample",
    "hmc_sample_full_logreg",
    "hmc_sample_weighted_logreg",
    "hmc_sample_weighted_poisson",
    "make_weighted_hmc",
    "run_chains",
    "run_chains_sharded",
    "run_chains_weighted_logreg",
    "run_chains_weighted_poisson",
    "weighted_logreg_logprob",
    "effective_sample_size",
    "split_rhat",
    "summarize_chains",
    "SHFConfig",
    "SHFParams",
    "beta_log_joint",
    "gaussian_log_joint",
    "init_shf_params",
    "make_sharded_shf_trainer",
    "make_shf_trainer",
    "shf_sample",
    "LaplaceApprox",
    "newton_laplace",
    "newton_laplace_diag",
    "sample_laplace",
    "fixed_sampler",
    "gaussian_conjugate_sampler",
    "linreg_conjugate_sampler",
    "logreg_laplace_sampler",
    "poisson_laplace_sampler",
    "prior_gaussian_sampler",
]
