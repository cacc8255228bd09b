from .laplace import LaplaceApprox, newton_laplace, newton_laplace_diag, sample_laplace
from .samplers import (
    fixed_sampler,
    gaussian_conjugate_sampler,
    linreg_conjugate_sampler,
    logreg_laplace_sampler,
    prior_gaussian_sampler,
)

__all__ = [
    "LaplaceApprox",
    "newton_laplace",
    "newton_laplace_diag",
    "sample_laplace",
    "fixed_sampler",
    "gaussian_conjugate_sampler",
    "linreg_conjugate_sampler",
    "logreg_laplace_sampler",
    "prior_gaussian_sampler",
]
