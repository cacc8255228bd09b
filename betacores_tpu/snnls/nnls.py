"""Jitted non-negative least squares.

Replaces scipy.optimize.nnls (used by the reference at snnls/snnls.py:86 and
snnls/orthopursuit.py:39-41) with an accelerated projected-gradient (FISTA)
solve restricted to a dynamic support, entirely under jit with static
shapes: the active columns are gathered into a fixed-width (D, K) block via
``jnp.nonzero(size=K)``, so the same compiled kernel serves every call.

FISTA with monotone restart on a strictly convex quadratic reaches the exact
active-set solution geometrically; the test battery checks agreement with an
independent Lawson-Hanson oracle to <= 1e-6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nnls_fista(G: jnp.ndarray, c: jnp.ndarray, valid: jnp.ndarray, n_iters: int = 400) -> jnp.ndarray:
    """min_w 1/2 w'Gw - c'w  s.t. w >= 0, restricted to ``valid`` slots.
    G: (K, K) PSD Gram, c: (K,), valid: (K,) bool."""
    # Lipschitz bound via a few power iterations on G.
    def pw(v, _):
        v = G @ v
        return v / (jnp.linalg.norm(v) + 1e-300), None

    v0 = jnp.ones_like(c) / jnp.sqrt(c.shape[0])
    v, _ = jax.lax.scan(pw, v0, None, length=16)
    L = jnp.maximum(v @ (G @ v), 1e-300) * 1.01
    inv_L = 1.0 / L

    def step(carry, _):
        w, y, t = carry
        g = G @ y - c
        w_new = jnp.maximum(y - inv_L * g, 0.0) * valid
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = w_new + (t - 1.0) / t_new * (w_new - w)
        # monotone restart: if momentum points uphill, reset to plain step
        restart = jnp.vdot(g, w_new - w) > 0
        y_new = jnp.where(restart, w_new, y_new)
        t_new = jnp.where(restart, 1.0, t_new)
        return (w_new, y_new, t_new), None

    w0 = jnp.zeros_like(c)
    (w, _, _), _ = jax.lax.scan(step, (w0, w0, jnp.asarray(1.0, dtype=c.dtype)), None, length=n_iters)
    return w


def nnls_on_support(A: jnp.ndarray, b: jnp.ndarray, support: jnp.ndarray,
                    max_support: int, n_iters: int = 400) -> jnp.ndarray:
    """Solve NNLS over the columns flagged in ``support`` (bool (N,)),
    scattering the solution back into an (N,) vector; zeros elsewhere.
    ``max_support`` is the static width K (>= true support size)."""
    N = A.shape[1]
    K = min(max_support, N)
    (idx,) = jnp.nonzero(support, size=K, fill_value=N - 1)
    valid_slots = jnp.arange(K) < jnp.sum(support)
    As = A[:, idx] * valid_slots[None, :]
    G = As.T @ As
    c = As.T @ b
    ws = nnls_fista(G, c, valid_slots, n_iters=n_iters)
    w = jnp.zeros(N, dtype=A.dtype)
    return w.at[idx].add(jnp.where(valid_slots, ws, 0.0))
