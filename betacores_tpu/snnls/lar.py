"""Least-angle-regression sparse NNLS (LARS homotopy on the weight path).

The reference ships this solver dead: bayesiancoresets/snnls/lar.py raises
NotImplementedError at :9, the event calculus in ``select`` computes into
local variables that ``_reweight`` cannot see, and it is excluded from the
package exports (snnls/__init__.py:5). This is a working implementation of
the evident intent:

per iteration, from weights w with active set {w > 0}:
  1. solve NNLS restricted to the active set -> w_opt (reference lar.py:34);
  2. move along the segment w(g) = (1 - g) w + g w_opt and find the first
     *event* g in (0, 1]:
       - ENTER (lar.py:45-52): inactive column a_n becomes as aligned with
         the moving residual r(g) = b - A w(g) as the step direction s,
         i.e. the g solving  a_n . r(g) = s . r(g):
            g_n = (a_n - s).(b - A w) / (a_n - s).(A w_opt - A w)
       - LEAVE (lar.py:55-61): an active weight crosses zero,
         g_n = w_n / (w_n - w_opt_n) for w_opt_n < 0 (cannot trigger with a
         nonnegative restricted solve; kept for contract parity);
  3. step to w(g*) and toggle the event variable's membership; if no event
     occurs before g = 1, jump to w_opt — the restricted optimum — and the
     solve is converged (idempotent under further iterations).

Static shapes throughout: the active set is the w > 0 mask, events are
computed as masked argmins over all N columns, and the restricted solve is
the fixed-width FISTA of snnls/nnls.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .base import SparseNNLS
from .nnls import nnls_on_support


class LARPre(NamedTuple):
    A: jnp.ndarray
    An: jnp.ndarray   # unit columns
    b: jnp.ndarray


def lar_step(pre: LARPre, w: jnp.ndarray, max_support: int,
             nnls_iters: int = 400) -> Tuple[jnp.ndarray, jnp.ndarray]:
    A, An, b = pre
    eps = jnp.asarray(1e-12, dtype=w.dtype)
    active = w > 0
    has_active = jnp.any(active)
    # cold start (reference __init__/reset, lar.py:12-14): activate the
    # column most aligned with the residual
    r0 = b - A @ w
    f0 = jnp.argmax(An.T @ r0)
    active = jnp.where(has_active, active, active.at[f0].set(True))

    w_opt = nnls_on_support(A, b, active, max_support, n_iters=nnls_iters)
    xw = A @ w
    x_opt = A @ w_opt
    dx = x_opt - xw
    dxn = jnp.sqrt(jnp.sum(dx * dx))
    s = dx / jnp.maximum(dxn, eps)                     # step direction

    # ENTER events over inactive columns (reference lar.py:45-52); no
    # entries once the support fills the restricted-solve width
    num = (An - s[:, None]).T @ (b - xw)               # (N,)
    den = (An - s[:, None]).T @ dx
    bad = jnp.logical_or(jnp.abs(den) <= eps, num * den < 0)
    at_capacity = jnp.sum(active) >= max_support
    blocked = jnp.logical_or(jnp.logical_or(bad, active), at_capacity)
    g_enter = jnp.where(blocked, jnp.inf, num / jnp.where(bad, 1.0, den))
    g_enter = jnp.where(g_enter <= eps, jnp.inf, g_enter)  # ignore zero-length steps
    f_enter = jnp.argmin(g_enter)

    # LEAVE events over active columns (reference lar.py:55-61)
    leave = jnp.logical_and(active, w_opt < 0)
    g_leave = jnp.where(leave, w / jnp.where(leave, w - w_opt, 1.0), jnp.inf)
    f_leave = jnp.argmin(g_leave)

    ge, gl = g_enter[f_enter], g_leave[f_leave]
    g = jnp.minimum(jnp.minimum(ge, gl), 1.0)
    converged = jnp.logical_and(ge >= 1.0, gl >= 1.0)

    w_new = (1.0 - g) * w + g * w_opt
    # toggle the event variable's membership. The active set is the w > 0
    # mask, so an ENTER event must seed the entrant with a tiny positive
    # weight — the next restricted solve assigns its true value.
    seed = jnp.maximum(jnp.max(w_new), 1.0) * jnp.asarray(1e-7, dtype=w.dtype)
    stepped = jnp.where(gl < ge,
                        w_new.at[f_leave].set(0.0),
                        w_new.at[f_enter].set(jnp.maximum(w_new[f_enter], seed)))
    # prune faded variables: with a nonnegative restricted solve, a variable
    # the solver zeros (w_opt_n = 0) only decays geometrically along the
    # path and never crosses zero — drop it once negligible, so the active
    # set stays within max_support and size() counts real support
    is_entrant = jnp.arange(w.shape[0]) == jnp.where(gl < ge, -1, f_enter)
    faded = jnp.logical_and(w_opt == 0.0, stepped <= 2.0 * seed)
    stepped = jnp.where(jnp.logical_and(faded, jnp.logical_not(is_entrant)), 0.0, stepped)
    w_new = jnp.where(converged, w_opt, stepped)
    w_new = jnp.maximum(w_new, 0.0)
    # already at the restricted optimum with no events left: the path has
    # terminated (reference lar.py:66-70 latches here) — signal failure so
    # the build loop's retry/latch contract stops iterating
    # dtype-aware: the restricted FISTA re-solve reproduces w_opt only to
    # ~sqrt(machine eps) relative accuracy (1e-12 would never fire in f32)
    lat_tol = jnp.sqrt(jnp.finfo(w.dtype).eps)
    already_opt = jnp.logical_and(converged,
                                  jnp.max(jnp.abs(w - w_opt)) <= lat_tol * (1.0 + jnp.max(w_opt)))
    ok = jnp.logical_and(jnp.isfinite(jnp.sum(w_new)), jnp.logical_not(already_opt))
    return w_new, ok


class LAR(SparseNNLS):
    # homotopy steps can pass through intermediate points whose residual
    # exceeds the previous iterate's before the path bends; the reference's
    # own design accepts each event point as-is
    check_error_monotone = False

    def _precompute(self) -> LARPre:
        norms = jnp.sqrt(jnp.sum(self.A * self.A, axis=0))
        if bool(jnp.any(norms == 0)):
            raise ValueError("LAR: A must not have any zero columns (reference lar.py:17)")
        if float(jnp.linalg.norm(self.b)) == 0.0:
            raise ValueError("LAR: norm of b must be > 0 (reference lar.py:21)")
        return LARPre(A=self.A, An=self.A / norms, b=self.b)

    def _step_pre(self, pre, w, tol):
        del tol
        return lar_step(pre, w, self.max_support)
