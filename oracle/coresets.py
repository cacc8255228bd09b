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
    data, M, opt_itrs, step_sched, sampler_fn, lik_fn, dedup=False
):
    """Greedy incremental coreset (BetaCoreset/SparseVI skeleton).

    lik_fn(pts, samples) -> (N, S) un-centered likelihood matrix.
    Returns (wts, idcs, pts) arrays over selected slots (possibly w == 0).

    ``dedup=True`` is the golden counterpart of the JAX builder's
    ``dedup_select`` mode: already-selected indices are excluded from the
    candidate argmax and the best remaining candidate is ALWAYS added (no
    corecorrs comparison) — every step grows the coreset by one until
    min(M, N).
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
        # zero-norm guard matching the weighted/group variants below (a
        # sample-constant row would otherwise score 0/0 = nan, and argmax
        # treats nan as maximal — round-3 review)
        vn = np.sqrt((vecs**2).sum(axis=1))
        vn[vn == 0] = np.inf
        corrs = vecs @ resid / vn / S
        if dedup:
            corrs[idcs] = -np.inf
            if len(idcs) < N and np.isfinite(corrs.max()):
                f = int(np.argmax(corrs))
                wts = np.append(wts, 0.0)
                idcs = np.append(idcs, f)
                pts = np.vstack([pts, data[f]])
        else:
            if corevecs.shape[0] > 0:
                cn = np.sqrt((corevecs**2).sum(axis=1))
                cn[cn == 0] = np.inf
                corecorrs = np.abs(corevecs @ resid / cn) / S
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
        vn = np.sqrt((vecs**2).sum(axis=1))
        vn[vn == 0] = np.inf  # zero-norm guard (see point variant above)
        corrs = vecs @ resid / vn / S
        if corevecs.shape[0] > 0:
            cn = np.sqrt((corevecs**2).sum(axis=1))
            cn[cn == 0] = np.inf
            corecorrs = np.abs(corevecs @ resid / cn) / S
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


def incremental_build_weighted_deterministic(
    data, data_weights, M, opt_itrs, step_sched, sampler_fn, lik_fn
):
    """Weighted-target greedy incremental coreset: row n counts ``u_n``
    times in the residual target ``resid = sum_n u_n v_n - w . corevecs``
    (the merge-reduce streaming contract, coresets/incremental.py
    data_weights). Selection scoring stays per-row but u==0 rows (non-data:
    padding / dead leaf slots) are never selectable. Independent NumPy
    golden for the jitted ``data_weights`` path.
    Returns (wts, idcs, pts)."""
    data = np.asarray(data, dtype=np.float64)
    u = np.asarray(data_weights, dtype=np.float64)
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
        # --- select: per-row scores, u==0 rows masked out ---
        vecs, corevecs = projections(wts, pts)
        resid = u @ vecs - wts @ corevecs
        S = vecs.shape[1]
        vn = np.sqrt((vecs**2).sum(axis=1))
        vn[vn == 0] = np.inf
        corrs = vecs @ resid / vn / S
        corrs[u <= 0] = -np.inf
        if corevecs.shape[0] > 0:
            cn = np.sqrt((corevecs**2).sum(axis=1))
            cn[cn == 0] = np.inf
            corecorrs = np.abs(corevecs @ resid / cn) / S
            take_new = corrs.max() > corecorrs.max()
        else:
            take_new = True
        if take_new and np.isfinite(corrs.max()):
            f = int(np.argmax(corrs))
            if f not in idcs:
                wts = np.append(wts, 0.0)
                idcs = np.append(idcs, f)
                pts = np.vstack([pts, data[f]])

        # --- optimize: weighted full-data target ---
        def grd(w, i):
            vecs_, corevecs_ = projections(w, pts)
            resid_ = u @ vecs_ - w @ corevecs_
            return -corevecs_ @ resid_ / corevecs_.shape[1]

        wts = nn_adam(wts, grd, opt_itrs, step_sched)

    return wts, idcs, pts


def group_incremental_build_deterministic(
    data, groups, itrs, opt_itrs, step_sched, sampler_fn, lik_fn, dedup=False
):
    """Group-mode greedy incremental coreset (reference bcores.py:91-123 /
    sparsevi.py:97-126 group branches), deterministic sampler, no
    subsampling: a group's tangent vector is the SUM of its members'
    centered projections; the winning group's members are ALL appended with
    zero weight; refinement runs at the individual-point level against the
    full grouped-data target. Re-selecting an already-selected group is a
    no-op iteration (reference semantics). Independent NumPy golden for
    ``make_group_incremental_builder``.

    ``groups`` is a list of member-index lists. Returns
    (wts, idcs, pts, selected) with selected a (G,) bool array."""
    data = np.asarray(data, dtype=np.float64)
    N, D = data.shape
    G = len(groups)
    members = [np.asarray(g, dtype=np.int64) for g in groups]
    wts = np.zeros(0)
    idcs = np.zeros(0, dtype=np.int64)
    pts = np.zeros((0, D))
    selected = np.zeros(G, dtype=bool)
    grouped = np.concatenate(members) if G else np.zeros(0, dtype=np.int64)

    def projections(w, p):
        samples = sampler_fn(w, p)
        vecs = center(lik_fn(data, samples))
        corevecs = center(lik_fn(p, samples)) if p.shape[0] > 0 else np.zeros((0, vecs.shape[1]))
        return vecs, corevecs

    for _ in range(itrs):
        # --- select (whole-group argmax) ---
        vecs, corevecs = projections(wts, pts)
        gvecs = np.stack([vecs[m].sum(axis=0) for m in members])   # (G, S)
        S = vecs.shape[1]
        resid = gvecs.sum(axis=0) - wts @ corevecs
        vn = np.sqrt((gvecs**2).sum(axis=1))
        vn[vn == 0] = np.inf
        corrs = gvecs @ resid / vn / S
        if dedup:
            # golden counterpart of the JAX builders' dedup_select group
            # mode: selected groups are masked out of the argmax and the
            # best remaining group ALWAYS adds (capacity never binds here —
            # the oracle grows unboundedly; golden tests size the JAX
            # buffer so `fits` never masks either)
            corrs = corrs.copy()
            corrs[selected] = -np.inf
            if not selected.all() and np.isfinite(corrs.max()):
                f = int(np.argmax(corrs))
                wts = np.concatenate([wts, np.zeros(len(members[f]))])
                idcs = np.concatenate([idcs, members[f]])
                pts = np.vstack([pts, data[members[f]]])
                selected[f] = True
        else:
            if corevecs.shape[0] > 0:
                cn = np.sqrt((corevecs**2).sum(axis=1))
                cn[cn == 0] = np.inf
                corecorrs = np.abs(corevecs @ resid / cn) / S
                take_new = corrs.max() > corecorrs.max()
            else:
                take_new = True
            if take_new:
                f = int(np.argmax(corrs))
                if not selected[f]:
                    wts = np.concatenate([wts, np.zeros(len(members[f]))])
                    idcs = np.concatenate([idcs, members[f]])
                    pts = np.vstack([pts, data[members[f]]])
                    selected[f] = True

        # --- optimize (point-level weights, full grouped-data target) ---
        def grd(w, i):
            vecs_, corevecs_ = projections(w, pts)
            resid_ = vecs_[grouped].sum(axis=0) - w @ corevecs_
            return -corevecs_ @ resid_ / corevecs_.shape[1]

        if wts.shape[0] > 0:
            wts = nn_adam(wts, grd, opt_itrs, step_sched)

    return wts, idcs, pts, selected


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
