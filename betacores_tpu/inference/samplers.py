"""Posterior samplers for projection construction.

The sampler protocol is the framework's replacement for the reference's
callback soup (reference: BlackBoxProjector.update at projector.py:36-37,
per-experiment ``sampler_w`` closures at zellner_gaussian/main.py:87-94 and
zellner_logreg/main.py:139-144):

    sampler(key, n_samples, wts, pts, aux) -> (samples (S, d), aux)

``aux`` threads warm-start state (the Laplace mode) through scan loops; pure
conjugate samplers ignore it. ``wts``/``pts`` may be zero-padded fixed-size
buffers — zero weights contribute nothing, which also covers the reference's
empty-coreset special case (sampling from the prior; zellner_gaussian
main.py:88-91 emulates it with a single zero-weight point).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..models import gaussian as gauss_model
from ..models import linreg as linreg_model
from ..models import logreg as logreg_model
from ..models import poisson as poisson_model
from .laplace import (newton_laplace, newton_laplace_diag, sample_laplace,
                      sample_laplace_from_noise)

SamplerFn = Callable  # (key, n, wts, pts, aux) -> (samples, aux)
# Samplers may additionally carry a ``from_noise`` attribute:
#     sampler.from_noise(z, wts, pts, aux) -> (samples, aux)
# with z an (n, theta_dim) block of pre-drawn standard normals, plus a
# ``theta_dim`` attribute (int, or None meaning "same as pts.shape[1]").
# Builders use it to pre-draw a whole refinement loop's noise in ONE vmapped
# call (bit-identical values to the per-step key path — the PRNG is
# functional) instead of one randn kernel per Adam step; the build loop is
# latency-bound, so each removed per-step kernel is wall-clock off the
# headline build.


def gaussian_conjugate_sampler(mu0, Sig0inv, Siginv) -> SamplerFn:
    """Exact weighted-posterior sampler for the known-covariance Gaussian
    model (reference zellner_gaussian/main.py:87-94, exact instead of the
    reference's wrong-factor-order draw)."""

    def sampler(key, n, wts, pts, aux):
        post = gauss_model.weighted_post(mu0, Sig0inv, Siginv, pts, wts)
        return gauss_model.sample_gaussian_prec(key, post, n), aux

    def from_noise(z, wts, pts, aux):
        post = gauss_model.weighted_post(mu0, Sig0inv, Siginv, pts, wts)
        return gauss_model.sample_gaussian_prec_from_noise(post, z), aux

    sampler.from_noise = from_noise
    sampler.theta_dim = int(mu0.shape[0])
    sampler.theta_dtype = jnp.asarray(mu0).dtype
    return sampler


def linreg_conjugate_sampler(mu0, Sig0inv, sigsq) -> SamplerFn:
    """Exact weighted-posterior sampler for Bayesian linear regression /
    neural-linear last layer (reference model_neurlinr.py:115-122)."""

    def sampler(key, n, wts, pts, aux):
        post = linreg_model.weighted_post(mu0, Sig0inv, sigsq, pts, wts)
        return gauss_model.sample_gaussian_prec(key, post, n), aux

    def from_noise(z, wts, pts, aux):
        post = linreg_model.weighted_post(mu0, Sig0inv, sigsq, pts, wts)
        return gauss_model.sample_gaussian_prec_from_noise(post, z), aux

    sampler.from_noise = from_noise
    sampler.theta_dim = int(mu0.shape[0])
    sampler.theta_dtype = jnp.asarray(mu0).dtype
    return sampler


def logreg_laplace_sampler(diag: bool = False, n_newton: int = 8, warm_start: bool = True,
                           exact_final: bool = False) -> SamplerFn:
    """Laplace-approximation sampler for Bayesian logistic regression
    (reference zellner_logreg/main.py:139-144). ``aux`` is the previous mode
    (warm start); pass zeros initially.

    ``exact_final`` is kept for API compatibility and ignored: the Newton
    loop now tests the decrement before each line search and the returned
    factor is always exact at the returned mode at no extra cost
    (laplace.py::newton_laplace docstring)."""

    def _fit(wts, pts, aux):
        mu_ws = aux if warm_start else jnp.zeros_like(aux)
        lj = lambda th: logreg_model.log_joint(pts, th, wts)
        g = lambda th: logreg_model.grad_th_log_joint(pts, th, wts)
        if diag:
            dh = lambda th: logreg_model.diag_hess_th_log_joint(pts, th, wts)
            return newton_laplace_diag(lj, g, dh, mu_ws, n_iters=n_newton + 4)
        h = lambda th: logreg_model.hess_th_log_joint(pts, th, wts)
        return newton_laplace(lj, g, h, mu_ws, n_iters=n_newton,
                              exact_final=exact_final)

    def sampler(key, n, wts, pts, aux):
        lap = _fit(wts, pts, aux)
        return sample_laplace(key, lap, n), lap.mu

    def from_noise(z, wts, pts, aux):
        lap = _fit(wts, pts, aux)
        return sample_laplace_from_noise(lap, z), lap.mu

    sampler.from_noise = from_noise
    sampler.theta_dim = None  # theta lives in the data row space; dtype = aux's
    sampler.theta_dtype = None
    return sampler


def poisson_laplace_sampler(diag: bool = False, n_newton: int = 10,
                            warm_start: bool = True,
                            exact_final: bool = False) -> SamplerFn:
    """Laplace sampler for Poisson regression (softplus link). Newton uses
    the expected (Fisher) Hessian — globally negative definite — so this is
    Fisher scoring, the standard GLM fit (models/poisson.py docstring).
    ``exact_final`` is ignored, as in ``logreg_laplace_sampler``."""

    def _fit(wts, pts, aux):
        mu_ws = aux if warm_start else jnp.zeros_like(aux)
        lj = lambda th: poisson_model.log_joint(pts, th, wts)
        g = lambda th: poisson_model.grad_th_log_joint(pts, th, wts)
        if diag:
            dh = lambda th: poisson_model.diag_hess_th_log_joint(pts, th, wts)
            return newton_laplace_diag(lj, g, dh, mu_ws, n_iters=n_newton + 4)
        h = lambda th: poisson_model.hess_th_log_joint(pts, th, wts)
        return newton_laplace(lj, g, h, mu_ws, n_iters=n_newton,
                              exact_final=exact_final)

    def sampler(key, n, wts, pts, aux):
        lap = _fit(wts, pts, aux)
        return sample_laplace(key, lap, n), lap.mu

    def from_noise(z, wts, pts, aux):
        lap = _fit(wts, pts, aux)
        return sample_laplace_from_noise(lap, z), lap.mu

    sampler.from_noise = from_noise
    sampler.theta_dim = None
    sampler.theta_dtype = None
    return sampler


def fixed_sampler(samples: jnp.ndarray) -> SamplerFn:
    """Deterministic sampler returning a fixed (S, d) matrix — used by the
    optimally/realistically-tuned Hilbert projectors (reference
    zellner_gaussian/main.py:71-84) and by golden tests that drive the JAX
    and oracle builds down identical trajectories."""

    def sampler(key, n, wts, pts, aux):
        return samples[:n], aux

    return sampler


def prior_gaussian_sampler(mu, LSig) -> SamplerFn:
    """Draws from a fixed Gaussian N(mu, LSig @ LSig.T) regardless of the
    coreset — the 'realistic' mis-tuned projector pattern."""

    def sampler(key, n, wts, pts, aux):
        z = jax.random.normal(key, (n, mu.shape[0]), dtype=mu.dtype)
        return mu + z @ LSig.T, aux

    return sampler
