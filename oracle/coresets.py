"""Oracle coreset builds (NumPy float64), driven deterministically.

These mirror the reference's incremental select/optimize skeleton
(spec: reference coreset/bcores.py:27-150, coreset/sparsevi.py:26-139) but
take an explicit deterministic ``sampler_fn(w, pts) -> (S, d)`` and run with
no subsampling, so the JAX build can be compared trajectory-for-trajectory
in golden tests. The beta-likelihood projection ``proj_fn(pts, samples)``
already has beta bound; SparseVI is the same skeleton with the plain
log-likelihood projection.
"""

from __future__ import annotations

import numpy as np

from .opt import nn_adam


def center(v):
    return v - v.mean(axis=1, keepdims=True)


def incremental_build_deterministic(
    data, M, opt_itrs, step_sched, sampler_fn, lik_fn
):
    """Greedy incremental coreset (BetaCoreset/SparseVI skeleton).

    lik_fn(pts, samples) -> (N, S) un-centered likelihood matrix.
    Returns (wts, idcs, pts) arrays over selected slots (possibly w == 0).
    """
    data = np.asarray(data, dtype=np.float64)
    N, D = data.shape
    wts = np.zeros(0)
    idcs = np.zeros(0, dtype=np.int64)
    pts = np.zeros((0, D))

    def projections(w, p):
        samples = sampler_fn(w, p)
        vecs = center(lik_fn(data, samples))
        corevecs = center(lik_fn(p, samples)) if p.shape[0] > 0 else np.zeros((0, vecs.shape[1]))
        return vecs, corevecs

    for _ in range(M):
        # --- select (spec: bcores.py:74-90) ---
        vecs, corevecs = projections(wts, pts)
        resid = vecs.sum(axis=0) - wts @ corevecs
        S = vecs.shape[1]
        corrs = vecs @ resid / np.sqrt((vecs**2).sum(axis=1)) / S
        if corevecs.shape[0] > 0:
            corecorrs = np.abs(corevecs @ resid / np.sqrt((corevecs**2).sum(axis=1))) / S
            take_new = corrs.max() > corecorrs.max()
        else:
            take_new = True
        if take_new:
            f = int(np.argmax(corrs))
            if f not in idcs:
                wts = np.append(wts, 0.0)
                idcs = np.append(idcs, f)
                pts = np.vstack([pts, data[f]])

        # --- optimize (spec: bcores.py:141-150) ---
        def grd(w, i):
            vecs_, corevecs_ = projections(w, pts)
            resid_ = vecs_.sum(axis=0) - w @ corevecs_
            return -corevecs_ @ resid_ / corevecs_.shape[1]

        wts = nn_adam(wts, grd, opt_itrs, step_sched)

    return wts, idcs, pts


def incremental_build_learn_beta_deterministic(
    data, M, opt_itrs, step_sched, sampler_fn, beta_lik_fn, beta_grad_fn,
    beta0, beta_grad_scale=1e-5, beta_floor=1e-3, beta_cap=1.0,
):
    """Greedy incremental beta-coreset with JOINT (w, beta) refinement — the
    reference's intended-but-crashing learn_beta path (bcores.py:126-140:
    wgrad = -corevecs @ resid / S stacked with
    betagrad = -scale * w . (betagrads @ resid) / S, all coordinates
    Adam-projected to >= 0 via partial_nn_opt over arange). Adds the
    positive beta floor the live build uses (the beta-likelihood has a
    1/beta pole at 0, which the reference's >= 0 projection alone hits)
    and the beta_cap ceiling (the raw residual objective has a degenerate
    minimum at beta -> inf; see coresets/incremental.py).

    beta_lik_fn(pts, samples, beta) -> (N, S) un-centered;
    beta_grad_fn(pts, samples, beta) -> (N, S) un-centered d/d(beta).
    Returns (wts, idcs, pts, beta)."""
    data = np.asarray(data, dtype=np.float64)
    N, D = data.shape
    wts = np.zeros(0)
    idcs = np.zeros(0, dtype=np.int64)
    pts = np.zeros((0, D))
    beta = float(beta0)

    for _ in range(M):
        # --- select (spec: bcores.py:74-90), at the CURRENT beta ---
        samples = sampler_fn(wts, pts)
        vecs = center(beta_lik_fn(data, samples, beta))
        corevecs = (center(beta_lik_fn(pts, samples, beta))
                    if pts.shape[0] > 0 else np.zeros((0, vecs.shape[1])))
        resid = vecs.sum(axis=0) - wts @ corevecs
        S = vecs.shape[1]
        corrs = vecs @ resid / np.sqrt((vecs**2).sum(axis=1)) / S
        if corevecs.shape[0] > 0:
            corecorrs = np.abs(corevecs @ resid / np.sqrt((corevecs**2).sum(axis=1))) / S
            take_new = corrs.max() > corecorrs.max()
        else:
            take_new = True
        if take_new:
            f = int(np.argmax(corrs))
            if f not in idcs:
                wts = np.append(wts, 0.0)
                idcs = np.append(idcs, f)
                pts = np.vstack([pts, data[f]])

        # --- joint (w, beta) optimize (spec: bcores.py:126-140) ---
        def grd(x, i):
            w, b = x[:-1], min(max(x[-1], beta_floor), beta_cap)
            samples_ = sampler_fn(w, pts)
            vecs_ = center(beta_lik_fn(data, samples_, b))
            corevecs_ = center(beta_lik_fn(pts, samples_, b))
            betagrads_ = center(beta_grad_fn(pts, samples_, b))
            S_ = vecs_.shape[1]
            resid_ = vecs_.sum(axis=0) - w @ corevecs_
            wgrad = -corevecs_ @ resid_ / S_
            betagrad = -beta_grad_scale * (w @ (betagrads_ @ resid_)) / S_
            return np.concatenate([wgrad, [betagrad]])

        x = nn_adam(np.concatenate([wts, [beta]]), grd, opt_itrs, step_sched)
        wts, beta = x[:-1], min(max(float(x[-1]), beta_floor), beta_cap)

    return wts, idcs, pts, beta


def bpsvi_build_deterministic(data, init_idcs, opt_itrs, step_sched, sampler_fn, lik_fn, grad_lik_fn):
    """Batch pseudo-coreset (spec: reference coreset/bpsvi.py:17-62):
    joint Adam over (w, pts) with w >= 0 only; point gradients via the
    model's grad-wrt-z, both projections centered over the sample axis."""
    data = np.asarray(data, dtype=np.float64)
    N, D = data.shape
    sz = len(init_idcs)
    pts0 = data[init_idcs]
    w0 = N / sz * np.ones(sz)

    def grd(x, i):
        w = x[:sz]
        p = x[sz:].reshape(sz, D)
        samples = sampler_fn(w, p)
        vecs = center(lik_fn(data, samples))
        corevecs = center(lik_fn(p, samples))
        pg = grad_lik_fn(p, samples)  # (sz, S, D)
        pg = pg - pg.mean(axis=1, keepdims=True)
        S = vecs.shape[1]
        resid = vecs.sum(axis=0) - w @ corevecs
        wgrad = -corevecs @ resid / S
        ugrad = -(w[:, None, None] * pg * resid[None, :, None]).sum(axis=1) / S
        return np.concatenate([wgrad, ugrad.reshape(-1)])

    mask = np.zeros(sz + sz * D, dtype=bool)
    mask[:sz] = True
    xf = nn_adam(np.concatenate([w0, pts0.reshape(-1)]), grd, opt_itrs, step_sched, nn_mask=mask)
    return xf[:sz], xf[sz:].reshape(sz, D)
