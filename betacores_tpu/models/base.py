"""Model bundle interface.

The reference wires model math into algorithms through "projector" objects
holding loose callbacks (reference: bayesiancoresets/coreset/projector.py).
Here a model family is a :class:`ModelFns` bundle of pure, jit/vmap-friendly
functions over

    pts     : (N, D) data points (for regression models a row is z = [x, y]
              or z = y*x, matching the reference's conventions)
    thetas  : (S, d) posterior parameter samples
    beta    : scalar beta-divergence robustness parameter

All (N, S) likelihood matrices follow these conventions:
  * ``log_likelihood(pts, thetas)[n, s]`` = log p(pts[n] | thetas[s])
  * ``beta_likelihood`` is the beta-divergence surrogate likelihood
    f_beta(z, th) = (beta+1)/beta * p^beta - integral p^(beta+1)
    (positive convention). NOTE: the reference's logistic-regression
    variant returns the *negation* of this (reference:
    examples/common/model_lr.py:81-86); since every use of the projection
    is bilinear (corrs = vecs . resid, wgrad = -corevecs . resid), a global
    sign flip leaves selection and optimization trajectories unchanged, so
    we use the positive convention everywhere for consistency.
  * ``beta_gradient`` is d/d(beta) of ``beta_likelihood`` — computed with
    autodiff, which makes the reference's dead ``learn_beta`` path
    (reference: coreset/bcores.py:127-140, missing ``_get_projection_ii``)
    actually work.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class ModelFns(NamedTuple):
    """Pure-function bundle for one model family."""

    # (N, D), (S, d) -> (N, S)
    log_likelihood: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    # (N, D), (S, d), beta -> (N, S)
    beta_likelihood: Optional[Callable] = None
    # (N, D), (S, d), beta -> (N, S): d/d(beta) of beta_likelihood
    beta_gradient: Optional[Callable] = None
    # (N, D), (S, d) -> (N, S, D): gradient w.r.t. the data point (BPSVI)
    grad_z_log_likelihood: Optional[Callable] = None
    # optional single-HBM-pass Pallas projections returning CENTERED (N, S)
    # matrices (ops/pallas_kernels.py); used by the projection engine for
    # large row blocks
    fused_ll_projection: Optional[Callable] = None      # (pts, thetas) -> (N, S)
    fused_beta_projection: Optional[Callable] = None    # (pts, thetas, beta) -> (N, S)
    # optional single-launch Pallas REFINEMENT STEP for the incremental
    # builder's latency-bound Adam hot loop (samples-from-noise + joint
    # projection + centering + residual + weight gradient + projected-Adam
    # update in ONE kernel; ops/pallas_kernels.py::logreg_adam_step_fused).
    # Signature (xin, z, mu, linv, w, m1, m2, sc, sclr, s_true) ->
    # (w', m1', m2'); routed by coresets/incremental.py when the sampler is
    # a Laplace family (fit/from_fit) — see IncrementalConfig.fused_grad_step
    fused_ll_grad_step: Optional[Callable] = None
    fused_beta_grad_step: Optional[Callable] = None
    # optional single-launch Pallas SHARD-LOCAL refinement-step partials for
    # the SHARDED incremental builder (parallel/sharded.py fused branch):
    # samples from this device's pre-drawn noise column block + joint
    # [local subsample; coreset] projection + every local reduction the
    # distributed gradient needs, in one launch; the two psums and an O(M)
    # Adam epilogue stay outside (ops/pallas_kernels.py::
    # logreg_shard_step_partials). Signature
    # (xin, z_loc, mu, linv, w_row, sc, s_loc_true) ->
    # (colsum (1, s_pad), core (M_pad, s_pad), corerow (1, M_pad),
    #  wcore (1, s_pad)).
    fused_ll_shard_partials: Optional[Callable] = None
    fused_beta_shard_partials: Optional[Callable] = None


def beta_gradient_from_autodiff(beta_likelihood: Callable) -> Callable:
    """Exact d/d(beta) of a beta-likelihood via forward-mode autodiff.

    Forward mode is the right transform here: beta is a scalar input and the
    output is the full (N, S) matrix, so one JVP gives the whole gradient.
    """

    def beta_gradient(pts, thetas, beta):
        beta = jnp.asarray(beta, dtype=jnp.result_type(pts))
        _, tangent = jax.jvp(
            lambda b: beta_likelihood(pts, thetas, b), (beta,), (jnp.ones_like(beta),)
        )
        return tangent

    return beta_gradient
