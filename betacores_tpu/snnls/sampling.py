"""Sampling-based snnls baselines.

Spec: reference bayesiancoresets/snnls/sampling.py. Importance sampling with
p_n proportional to ||A_n|| (uniform for UniformSampling); after ``itrs``
draws the weights are w = (counts / total) / p. The reference draws
sequentially from the global numpy stream, but the result depends only on
the multiset of draws, so the jitted build vectorizes all draws into one
``jax.random.choice`` + bincount — an exact semantic match and a one-kernel
TPU op. Monotone-error checking is disabled (reference sampling.py:16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger
from ..utils.prng import KeySequence, key_from_seed


def sampling_build(key: jax.Array, ps: jnp.ndarray, counts: jnp.ndarray, itrs: int):
    """Draw ``itrs`` indices from p and fold them into running counts;
    returns (counts, w) with w = (counts/sum) / ps."""
    draws = jax.random.choice(key, ps.shape[0], shape=(itrs,), p=ps)
    counts = counts + jnp.bincount(draws, length=ps.shape[0]).astype(ps.dtype)
    w = (counts / jnp.sum(counts)) / ps
    return counts, w


class ImportanceSampling:
    """Eager wrapper mirroring the reference API (plus an explicit seed)."""

    check_error_monotone = False

    def __init__(self, A, b, seed: int | jax.Array = 0):
        self.A = jnp.asarray(A)
        self.b = jnp.asarray(b)
        self.log = get_logger(self.__class__.__name__)
        self.keys = KeySequence(key_from_seed(seed))
        self.ps = self._probs()
        self.counts = jnp.zeros(self.A.shape[1], dtype=self.A.dtype)
        self.w = jnp.zeros(self.A.shape[1], dtype=self.A.dtype)
        self.reached_numeric_limit = False
        self._jit_build = jax.jit(
            lambda k, c, itrs: sampling_build(k, self.ps, c, itrs), static_argnums=2
        )

    def _probs(self):
        ps = jnp.sqrt(jnp.sum(self.A * self.A, axis=0))
        total = jnp.sum(ps)
        n = self.A.shape[1]
        return jnp.where(total > 0, ps / total, jnp.ones(n, dtype=self.A.dtype) / n)

    def reset(self):
        self.counts = jnp.zeros_like(self.counts)
        self.w = jnp.zeros_like(self.w)
        self.reached_numeric_limit = False

    def size(self) -> int:
        return int((self.w > 0).sum())

    def weights(self) -> np.ndarray:
        return np.asarray(self.w).copy()

    def error(self) -> float:
        return float(jnp.linalg.norm(self.A @ self.w - self.b))

    def build(self, itrs: int) -> None:
        self.counts, self.w = self._jit_build(self.keys(), self.counts, int(itrs))

    def optimize(self) -> None:  # parity: reference inherits the nnls re-solve
        from .base import optimize as _opt

        w_new, rolled_back = _opt(self.A, self.b, self.w, min(self.A.shape))
        self.w = w_new
        if bool(rolled_back):
            self.reached_numeric_limit = True


class UniformSampling(ImportanceSampling):
    def _probs(self):
        n = self.A.shape[1]
        return jnp.ones(n, dtype=self.A.dtype) / n
