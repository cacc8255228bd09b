from .perturb import perturb_groups, perturb_logreg, perturb_regression
from .synthetic import (gen_synthetic_gaussian, gen_synthetic_linreg,
                        gen_synthetic_logreg, gen_synthetic_multiclass,
                        gen_synthetic_poisson)

__all__ = [
    "perturb_groups",
    "perturb_logreg",
    "perturb_regression",
    "gen_synthetic_gaussian",
    "gen_synthetic_linreg",
    "gen_synthetic_logreg",
    "gen_synthetic_multiclass",
    "gen_synthetic_poisson",
]
