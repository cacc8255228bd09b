from . import gaussian, linreg, logreg, multiclass, mvn, neural_linear, poisson
from .base import ModelFns, beta_gradient_from_autodiff

__all__ = ["gaussian", "linreg", "logreg", "multiclass", "neural_linear", "poisson",
           "ModelFns", "beta_gradient_from_autodiff"]
