"""Synthetic dataset generators.

Specs: reference examples/common/model_lr.py:62-70 (``gen_synthetic``) and
examples/zellner_gaussian/main.py:33-54 (Gaussian + three outlier clusters).
All generators take explicit PRNG keys and return numpy-compatible jnp
arrays; labels use the reference's {-1, +1} convention with Z = y * X rows.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gen_synthetic_logreg(key: jax.Array, n: int, d: int = 2, mean_val: float = 1.0,
                         std_val: float = 1.0, theta_val: float = 1.0,
                         dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw X ~ N(mean 1, std I), labels from the logistic model with
    theta = theta_val * 1. Returns (X, y, Z=y*X)."""
    kx, ky = jax.random.split(key)
    X = mean_val + jnp.sqrt(std_val) * jax.random.normal(kx, (n, d), dtype=dtype)
    th = theta_val * jnp.ones(d, dtype=dtype)
    ps = jax.nn.sigmoid(X @ th)
    y = jnp.where(jax.random.uniform(ky, (n,), dtype=dtype) <= ps, 1.0, -1.0).astype(dtype)
    return X, y, y[:, None] * X


def gen_synthetic_multiclass(key: jax.Array, n: int, d: int = 4,
                             n_classes: int = 3, spread: float = 2.0,
                             dtype=jnp.float32):
    """K-class softmax synthetic: class parameters th_k ~ spread * N(0, I),
    X ~ N(0, I), labels from the softmax model. Returns (X, y, Z=[X, y])
    with y float class indices in the last column (models/multiclass.py
    row convention)."""
    kt, kx, ky = jax.random.split(key, 3)
    Th = spread * jax.random.normal(kt, (n_classes, d), dtype=dtype)
    X = jax.random.normal(kx, (n, d), dtype=dtype)
    y = jax.random.categorical(ky, X @ Th.T, axis=-1).astype(dtype)
    Z = jnp.concatenate([X, y[:, None]], axis=1)
    return X, y, Z


def gen_synthetic_gaussian(key: jax.Array, N: int = 5000, d: int = 100,
                           sig_scale: float = 500.0, dtype=jnp.float32):
    """The zellner_gaussian synthetic: X ~ N(0, sig_scale I) plus three
    outlier clusters — +200 shifted (N/50), +150 tight (N/50), 10x inflated
    (N/10) (reference zellner_gaussian/main.py:42-54). Returns
    (X_clean, X_corrupted, Sig)."""
    k0, k1, k2, k3 = jax.random.split(key, 4)
    s = jnp.sqrt(sig_scale)
    X = s * jax.random.normal(k0, (N, d), dtype=dtype)
    o1 = 200.0 + jnp.sqrt(0.5) * s * jax.random.normal(k1, (N // 50, d), dtype=dtype)
    o2 = 150.0 + jnp.sqrt(0.1) * s * jax.random.normal(k2, (N // 50, d), dtype=dtype)
    o3 = jnp.sqrt(10.0) * s * jax.random.normal(k3, (N // 10, d), dtype=dtype)
    Xc = jnp.concatenate([X, o1, o2, o3], axis=0)
    return X, Xc, sig_scale * jnp.eye(d, dtype=dtype)


def gen_synthetic_linreg(key: jax.Array, N: int = 2000, D: int = 40,
                         noise_std: float = 0.1, dtype=jnp.float32):
    """Bayesian linear-regression synthetic (reference
    model_neurlinr.py:80-88 ``build_synthetic_dataset``): w ~ 10 + N(0, I),
    X with intercept column, y = Xw + noise."""
    kw, kx, ke = jax.random.split(key, 3)
    d = D + 1
    w = 10.0 + jax.random.normal(kw, (d,), dtype=dtype)
    X = jax.random.normal(kx, (N, d), dtype=dtype)
    X = X.at[:, -1].set(1.0)
    y = X @ w + noise_std * jax.random.normal(ke, (N,), dtype=dtype)
    return X, y[:, None], w


def gen_synthetic_poisson(key: jax.Array, N: int = 2000, d: int = 5,
                          theta_scale: float = 0.5, dtype=jnp.float32):
    """Poisson-regression synthetic matching the reference's Stan model
    (stan_code.py:22-42): X with intercept column, rate f = softplus(X th),
    counts y ~ Poisson(f). Returns (X, y, Z=[X, y], theta_true)."""
    kt, kx, ky = jax.random.split(key, 3)
    th = theta_scale * jax.random.normal(kt, (d,), dtype=dtype)
    X = jax.random.normal(kx, (N, d), dtype=dtype)
    X = X.at[:, -1].set(1.0)
    f = jax.nn.softplus(X @ th)
    y = jax.random.poisson(ky, f).astype(dtype)
    return X, y, jnp.concatenate([X, y[:, None]], axis=1), th
