from . import gaussian, linreg, logreg
from .base import ModelFns, beta_gradient_from_autodiff

__all__ = ["gaussian", "linreg", "logreg", "ModelFns", "beta_gradient_from_autodiff"]
