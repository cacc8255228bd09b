"""Bayesian linear regression (known noise variance) and the neural-linear
Gaussian likelihood over learned features.

Spec: reference examples/common/model_linreg.py and
examples/common/model_neurlinr.py:90-122. Data rows are z_n = [x_n, y_n]
(features with y appended as the last column, the reference's convention);
the likelihood is y_n | x_n, th ~ N(x_n . th, sigsq).

The weighted posterior is conjugate:
    SigpInv = Sig0inv + X^T diag(w) X / sigsq
    mu      = Sigp (Sig0inv th0 + sum_n w_n y_n x_n / sigsq)
(correct-triangular-factor version; see models/gaussian.py for the
reference's factor-order bug that we do not reproduce).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .base import ModelFns, beta_gradient_from_autodiff
from .gaussian import GaussianPosterior

_LOG2PI = math.log(2.0 * math.pi)


def _split(z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return z[:, :-1], z[:, -1]


def log_likelihood(z, th, sigsq):
    """(N, S): log N(y_n | x_n . th_s, sigsq).
    Spec: reference model_linreg.py:4-10 / model_neurlinr.py:90-97."""
    x, y = _split(z)
    pred = x @ th.T  # (N, S)
    # factored (y - pred)^2, NOT the reference's expanded
    # y^2 - 2 pred y + pred^2 (model_linreg.py:10): the expansion
    # catastrophically cancels in f32 at |y| >> |resid| (same failure
    # models/mvn.py:55-62 measured at up to 6 nats); equally XLA-fusable
    resid_sq = (y[:, None] - pred) ** 2
    return -0.5 * jnp.log(2.0 * math.pi * sigsq) - resid_sq / (2.0 * sigsq)


def beta_likelihood(z, th, beta, sigsq):
    """(N, S) beta-divergence surrogate for the Gaussian regression
    likelihood, positive convention:
        (2 pi sigsq)^(-beta/2) [ (beta+1)/beta exp(-beta (y - x.th)^2 / (2 sigsq))
                                 - 1/sqrt(1+beta) ]
    Spec: reference model_neurlinr.py:102-110 (negated there)."""
    x, y = _split(z)
    pred = x @ th.T
    resid_sq = (y[:, None] - pred) ** 2  # factored: see log_likelihood
    cnst = (2.0 * math.pi * sigsq) ** (-0.5 * beta)
    return cnst * (
        (beta + 1.0) / beta * jnp.exp(-beta / (2.0 * sigsq) * resid_sq)
        - 1.0 / jnp.sqrt(1.0 + beta)
    )


def grad_z_log_likelihood(z, th, sigsq):
    """(N, S, D) gradient w.r.t. the full data row z = [x, y]:
    d/dx = (y - x.th)/sigsq * th, d/dy = -(y - x.th)/sigsq.
    Spec: reference model_linreg.py:12-17, which uses +1 for the d/dy column —
    the true derivative of -(y - x.th)^2/(2 sigsq) w.r.t. y is negative
    (autodiff-verified); we implement the correct sign."""
    x, y = _split(z)
    r = (y[:, None] - x @ th.T) / sigsq  # (N, S)
    neg_ones = -jnp.ones((th.shape[0], 1), dtype=th.dtype)
    th_aug = jnp.concatenate([th, neg_ones], axis=1)  # (S, D)
    return r[:, :, None] * th_aug[None, :, :]


def weighted_post(th0, Sig0inv, sigsq, z, w) -> GaussianPosterior:
    """Exact conjugate weighted posterior over regression weights.
    Spec: reference model_linreg.py:25-34 (with the correct factor order)."""
    x, y = _split(z)
    prec = Sig0inv + (w[:, None] * x).T @ x / sigsq
    L = jnp.linalg.cholesky(prec)
    rhs = Sig0inv @ th0 + jnp.sum(w[:, None] * y[:, None] * x, axis=0) / sigsq
    mu = jax.scipy.linalg.cho_solve((L, True), rhs)
    return GaussianPosterior(mu=mu, prec_chol=L)


def bundle(sigsq) -> ModelFns:
    def _blik(pts, thetas, beta):
        return beta_likelihood(pts, thetas, beta, sigsq)

    return ModelFns(
        log_likelihood=lambda pts, thetas: log_likelihood(pts, thetas, sigsq),
        beta_likelihood=_blik,
        beta_gradient=beta_gradient_from_autodiff(_blik),
        grad_z_log_likelihood=lambda pts, thetas: grad_z_log_likelihood(pts, thetas, sigsq),
    )
