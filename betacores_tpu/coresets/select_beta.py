"""Robust external selection of the density-power robustness parameter beta.

Why this exists: the in-build tangent-space objective CANNOT identify the
beta that best matches the clean posterior. Measured on the d=2
contaminated-gaussian testbed (RESULTS.md "learn_beta validation"): the
relative tangent residual ||b - w.C||^2/||b||^2 is *lowest* at beta -> 0,
exactly where reverse KL against the clean posterior is catastrophic —
at tiny beta the outliers dominate the tangent space and a coreset drawn
from them matches it perfectly. The raw residual is even worse: it has a
degenerate global minimum at beta -> inf (every projection scales like
exp(beta*ll) -> 0). So the reference's intended gradient-ascent
``learn_beta`` (bcores.py:126-140, dead code there, working and capped
here) is kept for parity, but *selecting* beta needs an external,
contamination-robust criterion — the standard position in the
density-power-divergence literature (Basu et al. 1998; Warwick & Jones
2005 tune their alpha against an external risk estimate, not the fitted
divergence itself).

The criterion here: build at each candidate beta, score each build by the
TRIMMED mean of per-point held-out predictive log-likelihood, and pick the
argmax. Trimming the lowest ``trim`` fraction removes the (unknown)
contaminated rows of the held-out split — with trim >= the contamination
rate the criterion evaluates fit on the clean majority only, which is the
quantity beta-robustness is supposed to protect. Because every incremental
builder takes beta as *traced* state (``CoresetState.beta``), the whole
grid reuses ONE compiled build program (CLAUDE.md: never recompile per
hyperparameter).
"""

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["trimmed_mean", "select_beta", "padded_scorer", "driver_select_beta"]


def trimmed_mean(x: jnp.ndarray, trim: float) -> jnp.ndarray:
    """Mean of ``x`` after dropping its lowest ``trim`` fraction.

    One-sided on purpose: contamination shows up as extremely *negative*
    per-point predictive log-likelihoods; the upper tail is informative and
    is kept. ``trim`` is clipped to [0, 0.5]."""
    x = jnp.ravel(x)
    n = x.shape[0]
    k = int(np.floor(float(np.clip(trim, 0.0, 0.5)) * n))
    return jnp.sort(x)[k:].mean()


def select_beta(
    build_fn: Callable[[float], Tuple[np.ndarray, np.ndarray]],
    betas: Sequence[float],
    score_fn: Callable[[np.ndarray, np.ndarray], jnp.ndarray],
    trim: float = 0.2,
) -> Tuple[float, np.ndarray]:
    """Pick the beta whose coreset maximizes trimmed held-out predictive ll.

    build_fn(beta) -> (weights, points): a fresh coreset build at ``beta``
        (e.g. ``lambda b: BetaCoreset(X, prj, beta=b, ...).build(M, M)`` then
        ``get()[:2]``). Builds at different beta share one compiled program
        when the builder takes beta as traced state (all of ours do).
    score_fn(weights, points) -> (n_val,): per-point predictive
        log-likelihood of a HELD-OUT split under the coreset posterior.
        The split may be contaminated — that is the point of the trimming.
    trim: fraction of lowest scores to drop; choose >= the suspected
        contamination rate (0.2 covers the 10-14% used across the
        reference's experiments).

    Returns (best_beta, scores) with ``scores[i]`` the trimmed mean for
    ``betas[i]``.
    """
    scores = []
    for b in betas:
        w, p = build_fn(float(b))
        scores.append(float(trimmed_mean(jnp.asarray(score_fn(w, p)), trim)))
    scores = np.asarray(scores)
    # a degenerate build (NaN predictive ll) must never win the grid:
    # np.argmax treats NaN as maximal
    ranked = np.where(np.isfinite(scores), scores, -np.inf)
    if not np.isfinite(ranked).any():
        raise ValueError(f"select_beta: every candidate build scored NaN/inf "
                         f"(scores={scores})")
    return float(betas[int(np.argmax(ranked))]), scores


def padded_scorer(M: int, D: int, pred_ll: Callable, dtype=np.float32) -> Callable:
    """Wrap a jitted ``pred_ll(wts, pts, *extra)`` into a ``score_fn(w, p)``
    that zero-weight-pads every build to ONE static (M, D) shape, so the
    whole beta grid reuses a single compiled scorer (driver-surface glue
    shared by examples/zellner_gaussian.py and zellner_logreg.py)."""
    def score_fn(wm, pm):
        wm, pm = np.atleast_1d(wm), np.atleast_2d(pm)
        wp = np.zeros(M, dtype=dtype)
        pp = np.zeros((M, D), dtype=dtype)
        wp[: len(wm)], pp[: len(wm)] = wm, pm
        return pred_ll(jnp.asarray(wp), jnp.asarray(pp))
    return score_fn


def driver_select_beta(alg_sel, grid: Sequence[float], score_fn: Callable,
                       trim: float, M_sel: int):
    """The --select-beta driver block shared by the example drivers: run the
    grid through ``select_beta`` on a warm eager coreset (beta is traced
    state, so one compiled build program serves the whole grid), time it,
    and assemble the results-pickle record.

    Returns (best_beta, record, cache) where cache[beta] = (wts, pts) of
    each candidate build (the gaussian driver scores them against its
    closed-form oracle for reporting)."""
    import time

    cache = {}

    def build_fn(b):
        alg_sel._beta0 = b
        alg_sel.reset()
        alg_sel.build(M_sel, M_sel)
        wb, pb = alg_sel.get()[:2]
        cache[b] = (wb, pb)
        return wb, pb

    t0 = time.perf_counter()
    best_beta, scores = select_beta(build_fn, list(grid), score_fn, trim=trim)
    t_sel = time.perf_counter() - t0
    record = {"grid": [float(b) for b in grid],
              "scores": [float(s) for s in scores],
              "beta": best_beta, "trim": trim, "select_time_s": t_sel}
    return best_beta, record, cache
