from . import gaussian, linreg, logreg, neural_linear
from .base import ModelFns, beta_gradient_from_autodiff

__all__ = ["gaussian", "linreg", "logreg", "neural_linear", "ModelFns",
           "beta_gradient_from_autodiff"]
