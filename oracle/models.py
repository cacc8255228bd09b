"""Oracle model math (NumPy float64).

Same formulas as betacores_tpu.models (specs cited there), written
independently against plain NumPy for golden-value testing.
"""

from __future__ import annotations

import numpy as np

LOG2PI = np.log(2.0 * np.pi)


# --- Gaussian (known covariance) --------------------------------------------


def gauss_maha_sq(x, th, Siginv):
    x = np.atleast_2d(x)
    th = np.atleast_2d(th)
    xS = x @ Siginv
    thS = th @ Siginv
    return (
        np.sum(xS * x, axis=1)[:, None]
        + np.sum(thS * th, axis=1)[None, :]
        - 2.0 * xS @ th.T
    )


def gauss_log_likelihood(x, th, Siginv, logdetSig):
    d = x.shape[-1]
    return -0.5 * d * LOG2PI - 0.5 * logdetSig - 0.5 * gauss_maha_sq(x, th, Siginv)


def gauss_beta_likelihood(x, th, beta, Siginv):
    d = x.shape[-1]
    d2 = gauss_maha_sq(x, th, Siginv)
    return np.exp(-0.5 * beta * d2) / beta - (1.0 + beta) ** (-0.5 * d - 1.0)


def gauss_beta_gradient(x, th, beta, Siginv):
    """Exact d/d(beta) of :func:`gauss_beta_likelihood` (the derivative the
    live learn-beta path computes by autodiff):
      d/db [ e^{-b d2/2}/b - (1+b)^{-d/2-1} ]
        = -e^{-b d2/2} (1/b^2 + d2/(2 b)) + (d/2+1)(1+b)^{-d/2-2}.
    NOT the reference's hand-derived gradient (gaussian.py:46-62), which
    includes normalizer terms its own beta_likelihood drops."""
    d = x.shape[-1]
    d2 = gauss_maha_sq(x, th, Siginv)
    e = np.exp(-0.5 * beta * d2)
    return -e * (1.0 / beta**2 + d2 / (2.0 * beta)) + (0.5 * d + 1.0) * (1.0 + beta) ** (-0.5 * d - 2.0)


def gauss_grad_x_log_likelihood(x, th, Siginv):
    return (th @ Siginv)[None, :, :] - (x @ Siginv)[:, None, :]


def gauss_weighted_post(th0, Sig0inv, Siginv, x, w):
    """Correct conjugate weighted posterior; returns (mu, Sigp)."""
    prec = Sig0inv + np.sum(w) * Siginv
    Sigp = np.linalg.inv(prec)
    mu = Sigp @ (Sig0inv @ th0 + Siginv @ np.sum(w[:, None] * x, axis=0))
    return mu, Sigp


def gaussian_KL(mu0, Sig0, mu1, Sig1inv):
    t1 = np.trace(Sig1inv @ Sig0)
    diff = mu1 - mu0
    t2 = diff @ Sig1inv @ diff
    t3 = -np.linalg.slogdet(Sig1inv)[1] - np.linalg.slogdet(Sig0)[1]
    return 0.5 * (t1 + t2 + t3 - mu0.shape[0])


# --- Logistic regression ------------------------------------------------------


def _softplus(m):
    return np.maximum(m, 0.0) + np.log1p(np.exp(-np.abs(m)))


def lr_log_likelihood(z, th):
    m = -(np.atleast_2d(z) @ np.atleast_2d(th).T)
    return -_softplus(m)


def lr_beta_likelihood(z, th, beta):
    m = -(np.atleast_2d(z) @ np.atleast_2d(th).T)
    sp, sn = _softplus(m), _softplus(-m)
    return (
        (beta + 1.0) / beta * np.exp(-beta * sp)
        - np.exp(-(beta + 1.0) * sp)
        - np.exp(-(beta + 1.0) * sn)
    )


def _sigmoid(m):
    return np.where(m >= 0, 1.0 / (1.0 + np.exp(-np.clip(m, -700, 700))),
                    np.exp(np.clip(m, -700, 700)) / (1.0 + np.exp(np.clip(m, -700, 700))))


def lr_grad_z_log_likelihood(z, th):
    z, th = np.atleast_2d(z), np.atleast_2d(th)
    m = -(z @ th.T)
    return _sigmoid(m)[:, :, None] * th[None, :, :]


def lr_log_joint(z, th, wts):
    m = -(z @ th)
    prior = -0.5 * th.shape[-1] * LOG2PI - 0.5 * np.sum(th * th)
    return np.sum(wts * (-_softplus(m))) + prior


def lr_grad_th_log_joint(z, th, wts):
    m = -(z @ th)
    return -th + (wts * _sigmoid(m)) @ z


def lr_hess_th_log_joint(z, th, wts):
    m = -(z @ th)
    s = _sigmoid(m)
    c = wts * s * (1.0 - s)
    return -np.eye(th.shape[-1]) - (c[:, None] * z).T @ z


# --- Linear regression --------------------------------------------------------


def linreg_log_likelihood(z, th, sigsq):
    z, th = np.atleast_2d(z), np.atleast_2d(th)
    x, y = z[:, :-1], z[:, -1]
    pred = x @ th.T
    rs = y[:, None] ** 2 - 2 * pred * y[:, None] + pred**2
    return -0.5 * np.log(2 * np.pi * sigsq) - rs / (2 * sigsq)


def linreg_beta_likelihood(z, th, beta, sigsq):
    z, th = np.atleast_2d(z), np.atleast_2d(th)
    x, y = z[:, :-1], z[:, -1]
    pred = x @ th.T
    rs = y[:, None] ** 2 - 2 * pred * y[:, None] + pred**2
    cnst = (2 * np.pi * sigsq) ** (-0.5 * beta)
    return cnst * ((beta + 1.0) / beta * np.exp(-beta / (2 * sigsq) * rs)
                   - 1.0 / np.sqrt(1.0 + beta))


def linreg_weighted_post(th0, Sig0inv, sigsq, z, w):
    z = np.atleast_2d(z)
    x, y = z[:, :-1], z[:, -1]
    prec = Sig0inv + (w[:, None] * x).T @ x / sigsq
    Sigp = np.linalg.inv(prec)
    mu = Sigp @ (Sig0inv @ th0 + np.sum(w[:, None] * y[:, None] * x, axis=0) / sigsq)
    return mu, Sigp


# --- Exact moments of the log-likelihood under a Gaussian posterior ----------
# (test idea from reference tests/not_yet_updated/test_kl/test_gaussian.py)


def gauss_ll_moments_exact(x, mu, Sig, Siginv, logdetSig):
    """E[ll_n(th)] and Var[ll_n(th)] for th ~ N(mu, Sig), Gaussian model.

    ll_n(th) = c - 1/2 (x_n - th)' Siginv (x_n - th). With delta = x_n - mu:
      E  = c - 1/2 (delta' Siginv delta + tr(Siginv Sig))
      Var = 1/2 tr((Siginv Sig)^2) + delta' Siginv Sig Siginv delta
    """
    x = np.atleast_2d(x)
    d = x.shape[1]
    c = -0.5 * d * LOG2PI - 0.5 * logdetSig
    A = Siginv @ Sig
    delta = x - mu[None, :]
    quad = np.sum((delta @ Siginv) * delta, axis=1)
    mean = c - 0.5 * (quad + np.trace(A))
    var = 0.5 * np.trace(A @ A) + np.sum((delta @ (Siginv @ Sig @ Siginv)) * delta, axis=1)
    return mean, var
