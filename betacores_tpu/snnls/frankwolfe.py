"""Frank-Wolfe on the weighted simplex.

Spec: reference bayesiancoresets/snnls/frankwolfe.py (Campbell & Broderick
2017). Selects argmax_n <An, b - Aw>; the first step places the iterate on
the constraint polytope (w_f = sum_n ||A_n|| / ||A_f||); subsequent steps use
the closed-form line search gamma = <(sigma/sigma_f) x_f - xw, b - xw> /
||(sigma/sigma_f) x_f - xw||^2 with the reference's precision guards.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .base import SparseNNLS


class FWPre(NamedTuple):
    A: jnp.ndarray
    An: jnp.ndarray
    norms: jnp.ndarray
    b: jnp.ndarray


def fw_precompute(A: jnp.ndarray, b: jnp.ndarray) -> FWPre:
    norms = jnp.sqrt(jnp.sum(A * A, axis=0))
    return FWPre(A=A, An=A / norms[None, :], norms=norms, b=b)


def fw_step(pre: FWPre, w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    A, An, norms, b = pre
    xw = A @ w
    f = jnp.argmax(An.T @ (b - xw))
    nsum = jnp.sum(norms)
    nf = norms[f]
    xf = A[:, f]

    # first-point special case (frankwolfe.py:20-23)
    first = jnp.logical_not(jnp.any(w > 0))

    dirn = nsum / nf * xf - xw
    num = dirn @ (b - xw)
    den = jnp.sum(dirn * dirn)
    ok_ls = jnp.logical_and(num >= 0.0, jnp.logical_and(den > 0.0, num <= den))
    den_safe = jnp.where(den == 0.0, 1.0, den)
    gamma = num / den_safe

    alpha = jnp.where(first, 0.0, 1.0 - gamma)
    beta = jnp.where(first, nsum / nf, nsum / nf * gamma)
    w_new = alpha * w
    w_new = w_new.at[f].set(jnp.maximum(0.0, alpha * w[f] + beta))
    ok = jnp.logical_or(first, ok_ls)
    return w_new, ok


class FrankWolfe(SparseNNLS):
    def _precompute(self) -> FWPre:
        norms = jnp.sqrt(jnp.sum(self.A * self.A, axis=0))
        if bool(jnp.any(norms == 0)):
            raise ValueError("FrankWolfe: A must not have any zero columns")
        return fw_precompute(self.A, self.b)

    def _step_pre(self, pre, w, tol):
        del tol  # FW's precision guard is scale-relative (fw_step)
        return fw_step(pre, w)
