"""Evaluation metrics.

The reference computes metrics post-hoc in its drivers: reverse/forward
Gaussian KL (zellner_gaussian/main.py:157-167), predictive accuracy and
log-likelihood via MCMC samples (zellner_logreg/main.py:210-230), RMSE/NLL
for neural-linear regression (zellner_neural_linear/main.py:174-205,
neural.py:205-250). Here they are library functions over posterior samples
or closed-form posteriors.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..models.gaussian import GaussianPosterior, gaussian_KL
from ..models.logreg import compute_accuracy, predictive_loglik


def reverse_forward_kl(post_w: GaussianPosterior, post_full: GaussianPosterior):
    """(reverse, forward) KL between a coreset posterior and the full
    posterior, both given as precision-Cholesky Gaussians."""
    rkl = gaussian_KL(post_w.mu, post_w.cov, post_full.mu, post_full.prec)
    fkl = gaussian_KL(post_full.mu, post_full.cov, post_w.mu, post_w.prec)
    return rkl, fkl


def regression_rmse_nll(Xt, yt, thetas, sigsq):
    """Posterior-averaged test RMSE and Gaussian predictive NLL for
    (neural-)linear regression. thetas: (S, d); yt: (Nt,) or (Nt, 1)."""
    yt = yt.reshape(-1)
    preds = Xt @ thetas.T  # (Nt, S)
    mean_pred = preds.mean(axis=1)
    rmse = jnp.sqrt(jnp.mean((mean_pred - yt) ** 2))
    # predictive NLL: -log mean_s N(y | x th_s, sigsq)
    ll = -0.5 * jnp.log(2 * math.pi * sigsq) - (yt[:, None] - preds) ** 2 / (2 * sigsq)
    S = thetas.shape[0]
    nll = -jnp.mean(jax.scipy.special.logsumexp(ll, axis=1) - jnp.log(S))
    return rmse, nll


__all__ = [
    "reverse_forward_kl",
    "regression_rmse_nll",
    "compute_accuracy",
    "predictive_loglik",
    "gaussian_KL",
]
