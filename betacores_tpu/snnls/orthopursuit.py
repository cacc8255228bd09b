"""Orthogonal matching pursuit with full NNLS re-solve.

Spec: reference bayesiancoresets/snnls/orthopursuit.py. Selection searches
the positive residual-correlation direction over all columns and the
negative direction over the active set (allowing weight decreases); the
reweight step re-solves NNLS restricted to the active support, here via the
jitted FISTA solver (snnls/nnls.py) instead of scipy.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .base import SparseNNLS
from .nnls import nnls_on_support


class OMPPre(NamedTuple):
    A: jnp.ndarray
    An: jnp.ndarray
    b: jnp.ndarray


def omp_step(pre: OMPPre, w: jnp.ndarray, max_support: int, nnls_iters: int = 400) -> Tuple[jnp.ndarray, jnp.ndarray]:
    A, An, b = pre
    dots = An.T @ (b - A @ w)
    active = w > 0
    fpos = jnp.argmax(dots)
    neg_scores = jnp.where(active, -dots, -jnp.inf)
    fneg = jnp.argmax(neg_scores)
    has_active = jnp.any(active)
    take_pos = jnp.logical_or(jnp.logical_not(has_active), dots[fpos] >= neg_scores[fneg])
    f = jnp.where(take_pos, fpos, fneg)
    support = active.at[f].set(True)
    w_new = nnls_on_support(A, b, support, max_support, n_iters=nnls_iters)
    return w_new, jnp.asarray(True)


class OrthoPursuit(SparseNNLS):
    def _precompute(self) -> OMPPre:
        norms = jnp.sqrt(jnp.sum(self.A * self.A, axis=0))
        if bool(jnp.any(norms == 0)):
            raise ValueError("OrthoPursuit: A must not have any zero columns")
        return OMPPre(A=self.A, An=self.A / norms[None, :], b=self.b)

    def _step_pre(self, pre, w, tol):
        del tol  # OMP's guards are geometric, not tolerance-based
        return omp_step(pre, w, self.max_support)
