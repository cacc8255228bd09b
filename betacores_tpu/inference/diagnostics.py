"""MCMC convergence diagnostics: split-R-hat and effective sample size.

The reference evaluates coreset posteriors with single-chain PyStan NUTS and
no convergence checking (examples/common/mcmc.py:21-59, ``chains=1``).
``inference.hmc.run_chains`` already runs vmapped chains; these are the
standard cross-chain diagnostics (Gelman et al., BDA3 / Vehtari et al. 2021
rank-normalization omitted — this is the classic split-R-hat and the
Geyer-truncated ESS that Stan reports as ``n_eff``), jittable and O(C n log n)
via FFT autocovariance.

Convention: ``samples`` is (C, n, d) — chains x draws x params (the stacked
output of ``run_chains``). Diagnostics are per-parameter (d,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_chains(samples: jnp.ndarray) -> jnp.ndarray:
    """(C, n, d) -> (2C, n//2, d): split each chain in half (split-R-hat
    catches within-chain non-stationarity that plain R-hat misses)."""
    C, n, d = samples.shape
    half = n // 2
    return samples[:, : 2 * half].reshape(C * 2, half, d)


def split_rhat(samples: jnp.ndarray) -> jnp.ndarray:
    """Split potential-scale-reduction factor per parameter (d,).

    ~1 at convergence; Stan's guidance flags > 1.01-1.1. Requires C >= 1,
    n >= 4 (each split half needs >= 2 draws)."""
    s = _split_chains(jnp.asarray(samples))
    m, n = s.shape[0], s.shape[1]
    chain_mean = s.mean(axis=1)                      # (m, d)
    chain_var = s.var(axis=1, ddof=1)                # (m, d)
    W = chain_var.mean(axis=0)                       # within
    B = n * chain_mean.var(axis=0, ddof=1)           # between
    var_plus = (n - 1) / n * W + B / n
    rhat = jnp.sqrt(var_plus / jnp.where(W > 0, W, 1.0))
    # stuck chains (zero within-chain variance) at DIFFERENT values are the
    # worst non-convergence, not the best: flag as +inf, never 0
    return jnp.where(W > 0, rhat, jnp.where(B > 0, jnp.inf, 1.0))


def _autocovariance(x: jnp.ndarray) -> jnp.ndarray:
    """Biased (1/n) autocovariance of each column of an (n, d) chain via FFT."""
    n = x.shape[0]
    xc = x - x.mean(axis=0)
    nfft = 1 << (2 * n - 1).bit_length()  # next pow2 >= 2n (linear, not circular)
    f = jnp.fft.rfft(xc, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:n]
    return acov.real / n


def effective_sample_size(samples: jnp.ndarray) -> jnp.ndarray:
    """Per-parameter ESS over all chains (d,), Stan's n_eff: combined
    autocorrelation from within/between-chain variances, truncated by
    Geyer's initial monotone positive-pair-sum sequence."""
    s = _split_chains(jnp.asarray(samples))
    m, n, d = s.shape
    acov = jax.vmap(_autocovariance)(s)              # (m, n, d)
    chain_mean = s.mean(axis=1)
    chain_var = acov[:, 0] * n / (n - 1.0)           # (m, d) unbiased
    W = chain_var.mean(axis=0)
    B_over_n = chain_mean.var(axis=0, ddof=1) if m > 1 else jnp.zeros(d, s.dtype)
    var_plus = (n - 1.0) / n * W + B_over_n
    # combined autocorrelations rho_t (Stan ref manual eq. for n_eff)
    rho = 1.0 - (W - acov.mean(axis=0)) / jnp.where(var_plus > 0, var_plus, jnp.inf)
    rho = rho.at[0].set(1.0)                          # (n, d)

    # Geyer pair sums P_k = rho_{2k} + rho_{2k+1}: keep while positive AND
    # enforce monotone non-increase, then sum
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2, d).sum(axis=1)   # (n_pairs, d)
    positive = jnp.cumprod(pairs > 0, axis=0).astype(s.dtype)
    pairs = pairs * positive
    pairs = jax.lax.associative_scan(jnp.minimum, pairs, axis=0)    # monotone envelope
    pairs = jnp.maximum(pairs, 0.0)
    # tau = -1 + 2 * sum_k P_k  (includes the k=0 pair rho_0 + rho_1)
    tau = -1.0 + 2.0 * pairs.sum(axis=0)
    return m * n / jnp.maximum(tau, 1.0 / (m * n))


def summarize_chains(samples: jnp.ndarray) -> dict:
    """{'rhat': (d,), 'ess': (d,), 'mean': (d,), 'sd': (d,)} for a (C, n, d)
    stack of chains."""
    samples = jnp.asarray(samples)
    flat = samples.reshape(-1, samples.shape[-1])
    return {
        "rhat": split_rhat(samples),
        "ess": effective_sample_size(samples),
        "mean": flat.mean(axis=0),
        "sd": flat.std(axis=0, ddof=1),
    }
