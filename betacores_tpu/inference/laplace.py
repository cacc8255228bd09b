"""Jitted Laplace approximation via damped Newton.

Replaces the reference's scipy BFGS-with-10-jittered-retries Laplace fit
(reference: examples/zellner_logreg/main.py:86-111, util/opt.py:10-33) with a
fixed-iteration damped Newton solve that is jit/scan-friendly and supports
warm starting — the critical hot-path optimization: the reference re-runs a
cold BFGS inside *every* Adam gradient step of every selection round
(call stack SURVEY.md 3.2).

The target log-joint is concave for all supported models (Gaussian prior +
log-concave likelihood), so Newton with backtracking converges
quadratically; from a warm start 2-3 iterations reach float32 precision.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


class LaplaceApprox(NamedTuple):
    mu: jnp.ndarray          # (d,) mode of the weighted log-joint
    prec_chol: jnp.ndarray   # (d, d) lower chol of -Hessian at the mode
    # diagonal variant: prec_chol holds sqrt(-diag_hess) on the diagonal


# Backtracking grid: candidate step sizes tried per Newton iteration.
# (numpy, not jnp: must not initialize the JAX backend at import time)
import numpy as _np

_TS = _np.asarray([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.0078125])


def newton_laplace(
    log_joint: Callable[[jnp.ndarray], jnp.ndarray],
    grad: Callable[[jnp.ndarray], jnp.ndarray],
    hess: Callable[[jnp.ndarray], jnp.ndarray],
    mu0: jnp.ndarray,
    n_iters: int = 8,
    exact_final: bool = True,
) -> LaplaceApprox:
    """Maximize a concave log-joint by damped Newton with a static
    backtracking grid (each candidate evaluation is O(M d) — tiny next to
    the N x S projection work).

    The loop is adaptive: it stops early once the Newton decrement
    lambda^2 = g . (-H)^{-1} g falls below ``tol`` relative to |log_joint|
    (affine-invariant; quadratic convergence makes the remaining mode error
    O(lambda^4)). Warm-started refits inside the Adam hot loop therefore pay
    1-2 iterations instead of the full ``n_iters`` budget — measured 2.4x
    off the N=1M headline build — while cold starts keep the full budget.

    ``exact_final=True`` (default) refactorizes -H at the final iterate, so
    ``prec_chol`` is the exact Cholesky factor at the returned mode (the
    standalone-Laplace contract). ``exact_final=False`` is the hot-loop
    variant for samplers: the mode trajectory is IDENTICAL (same steps, same
    warm-start stream, same iteration counts), but the factor carried out of
    the last executed iteration is returned instead of refactorizing —
    saving one hess+cholesky chain per call (~25% of the per-Adam-step
    latency in the headline build; a 10x10 TPU Cholesky alone costs ~3 us of
    serial latency). That factor is evaluated one (converged, hence O(tol)-
    sized) backtracking step before the returned mode, a relative covariance
    perturbation far below the Monte-Carlo noise of any projection built
    from S posterior samples."""

    tol = 1e-7 if mu0.dtype == jnp.float64 else 1e-5

    def step(mu):
        g = grad(mu)
        H = hess(mu)
        # Newton direction: solve (-H) p = g ; -H is SPD for concave targets.
        L = jnp.linalg.cholesky(-H)
        p = jax.scipy.linalg.cho_solve((L, True), g)
        f0 = log_joint(mu)
        lam2 = g @ p  # Newton decrement^2: predicted improvement scale
        converged = lam2 <= tol * (1.0 + jnp.abs(f0))
        # grid cast to the carry dtype: f64 _TS must not promote an f32 mu
        # (scan carry type mismatch under enable_x64)
        cands = mu[None, :] + jnp.asarray(_TS, dtype=mu.dtype)[:, None] * p[None, :]
        vals = jax.vmap(log_joint)(cands)
        vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
        best = jnp.argmax(vals)
        improved = vals[best] > f0
        mu_new = jnp.where(improved, cands[best], mu)
        return mu_new, L, converged

    def cond(carry):
        _, _, it, done = carry
        return (it < n_iters) & ~done

    def body(carry):
        mu, _, it, _ = carry
        mu_new, L, converged = step(mu)
        return mu_new, L, it + 1, converged

    L0 = jnp.eye(mu0.shape[0], dtype=mu0.dtype)
    mu, L, _, done = jax.lax.while_loop(
        cond, body, (mu0, L0, jnp.asarray(0, dtype=jnp.int32), jnp.asarray(False)))
    if exact_final:
        L = jnp.linalg.cholesky(-hess(mu))
    # else: the carried L — exact at the last executed iteration's entry
    # point, O(tol) stale at the returned mode on the (typical) converged
    # exit, one Newton step stale on a budget-exhausted exit. A lax.cond
    # refactorization for the budget case was measured SLOWER than the
    # factorization it saved (conditionals break fusion in the hot loop),
    # so the fast path accepts the staleness unconditionally.
    return LaplaceApprox(mu=mu, prec_chol=L)


def newton_laplace_diag(
    log_joint: Callable,
    grad: Callable,
    diag_hess: Callable,
    mu0: jnp.ndarray,
    n_iters: int = 12,
) -> LaplaceApprox:
    """Diagonal-Hessian variant (reference ``graddiag`` flag,
    zellner_logreg/main.py:104-106): Newton direction g / (-diag_hess),
    covariance approximated as diag(1 / -diag_hess)."""

    def body(mu, _):
        g = grad(mu)
        dh = diag_hess(mu)
        p = g / (-dh)
        cands = mu[None, :] + jnp.asarray(_TS, dtype=mu.dtype)[:, None] * p[None, :]
        vals = jax.vmap(log_joint)(cands)
        vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
        best = jnp.argmax(vals)
        improved = vals[best] > log_joint(mu)
        return jnp.where(improved, cands[best], mu), None

    mu, _ = jax.lax.scan(body, mu0, None, length=n_iters)
    L = jnp.diag(jnp.sqrt(-diag_hess(mu)))
    return LaplaceApprox(mu=mu, prec_chol=L)


def sample_laplace_from_noise(lap: LaplaceApprox, z: jnp.ndarray) -> jnp.ndarray:
    """theta = mu + L^{-T} z for pre-drawn standard normals z (n, d): the
    noise-in half of ``sample_laplace``, used by builders that pre-draw the
    whole refinement loop's noise in one vmapped call (bit-identical values,
    one kernel instead of one per step)."""
    return lap.mu + solve_triangular(lap.prec_chol.T, z.T, lower=False).T


def sample_laplace(key: jax.Array, lap: LaplaceApprox, n_samples: int) -> jnp.ndarray:
    """(S, d) draws theta = mu + L^{-T} z with the *correct* covariance
    Sig = L^{-T} L^{-1} = (-H)^{-1}. (The reference draws mu + z @ LSig.T
    with LSig = L^{-1}, i.e. covariance L^{-1} L^{-T} — the factor-order bug
    documented in models/gaussian.py; not reproduced.)"""
    d = lap.mu.shape[0]
    z = jax.random.normal(key, (n_samples, d), dtype=lap.mu.dtype)
    return sample_laplace_from_noise(lap, z)
