"""Oracle projected-Adam optimizer (NumPy), spec: reference util/opt.py:36-77."""

from __future__ import annotations

import numpy as np


def nn_adam(x0, grad_fn, n_steps, step_sched, nn_mask=None, b1=0.9, b2=0.999, eps=1e-8):
    """grad_fn(x, i) -> g. step_sched(i) -> lr. nn_mask: bool mask of
    coordinates projected to >= 0 (None = all)."""
    x = np.array(x0, dtype=np.float64, copy=True)
    mask = np.ones_like(x, dtype=bool) if nn_mask is None else nn_mask
    m1 = np.zeros_like(x)
    m2 = np.zeros_like(x)
    for i in range(n_steps):
        g = grad_fn(x, i)
        m1 = b1 * m1 + (1.0 - b1) * g
        m2 = b2 * m2 + (1.0 - b2) * g * g
        upd = step_sched(i) * (m1 / (1.0 - b1 ** (i + 1))) / (eps + np.sqrt(m2 / (1.0 - b2 ** (i + 1))))
        x = x - upd
        x[mask] = np.maximum(x[mask], 0.0)
    return x


def nnls_lawson_hanson(A, b, max_iter=None, tol=1e-12):
    """Classic active-set NNLS: min ||A w - b|| s.t. w >= 0.
    Independent implementation of the algorithm scipy.optimize.nnls uses,
    for golden tests of the jitted solver."""
    m, n = A.shape
    if max_iter is None:
        max_iter = 3 * n
    w = np.zeros(n)
    passive = np.zeros(n, dtype=bool)
    resid = b - A @ w
    it = 0
    while it < max_iter:
        grad = A.T @ resid
        grad_masked = np.where(passive, -np.inf, grad)
        j = int(np.argmax(grad_masked))
        if grad_masked[j] <= tol:
            break
        passive[j] = True
        while True:
            idx = np.where(passive)[0]
            s = np.zeros(n)
            s[idx], *_ = np.linalg.lstsq(A[:, idx], b, rcond=None)
            if np.all(s[idx] > tol):
                w = s
                break
            neg = idx[s[idx] <= tol]
            alpha = np.min(w[neg] / (w[neg] - s[neg] + 1e-300))
            w = w + alpha * (s - w)
            passive &= w > tol
            it += 1
            if it >= max_iter:
                break
        resid = b - A @ w
        it += 1
    return w
