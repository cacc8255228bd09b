"""Differentially-private batch pseudo-coreset (DP-BPSVI).

The reference package exports ``DiffPrivBatchPSVICoreset``
(bayesiancoresets/coreset/__init__.py:6) but the implementing module was
deleted from the tree — the import is broken (SURVEY.md section 0). This is
a working implementation of the evident design: BPSVI whose optimization
touches the private data ONLY through the per-step projection sum
Sigma_n v_n (the resid term, coreset/bpsvi.py:52), privatized by the
Gaussian mechanism —

  1. each data point's centered projection vector v_n (an S-vector) is
     clipped to L2 norm <= clip_norm;
  2. isotropic Gaussian noise N(0, (noise_multiplier * clip_norm)^2 I) is
     added to the (rescaled) sum.

Everything downstream (weight/pseudo-point gradients, Adam updates) is
post-processing of that privatized statistic plus the SYNTHETIC pseudo-
points, so the released coreset satisfies (eps, delta)-DP by T-fold
composition of the Gaussian mechanism. ``epsilon(delta)`` reports the RDP
composition bound (Mironov 2017), conservatively ignoring subsampling
amplification. NOTE: the pseudo-point INITIALIZATION must also be private —
points are initialized from the prior predictive (noised data means), not
from raw data rows as in non-private BPSVI.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.projection import center, draw_subsample, project_ll_with_grad
from ..utils.opt import nn_adam, step_schedule
from .bpsvi import BPSVIConfig


@dataclasses.dataclass(frozen=True)
class DPConfig:
    clip_norm: float = 1.0
    noise_multiplier: float = 1.0
    delta: float = 1e-5


def gaussian_rdp_epsilon(steps: int, noise_multiplier: float, delta: float) -> float:
    """(eps) for T-fold composition of the Gaussian mechanism via RDP:
    RDP_alpha = T * alpha / (2 sigma^2); eps = min_alpha RDP_alpha +
    log(1/delta)/(alpha - 1). Conservative (no subsampling amplification)."""
    sigma = noise_multiplier
    alphas = np.concatenate([np.linspace(1.01, 64.0, 512), np.arange(65, 512)])
    rdp = steps * alphas / (2.0 * sigma**2)
    eps = rdp + math.log(1.0 / delta) / (alphas - 1.0)
    return float(np.min(eps))


def make_dp_bpsvi_builder(data: jnp.ndarray, model, sampler: Callable,
                          config: BPSVIConfig, dp: DPConfig,
                          step_sizes=None) -> Callable:
    """Returns jitted ``build(key, sz, aux0) -> (wts, pts)``. The returned
    coreset contains only pseudo-points (no data indices are released)."""
    N, D = data.shape
    S = config.projection_dim
    n_opt = min(N, config.n_subsample_opt) if config.n_subsample_opt else N
    if step_sizes is None:
        step_sizes = step_schedule(config.i0, config.opt_itrs, dtype=data.dtype)
    step_sizes = jnp.asarray(step_sizes, dtype=data.dtype)
    C = dp.clip_norm
    noise_std = dp.noise_multiplier * C

    # private initialization: data mean + prior noise, each coordinate's
    # mean privatized with the same Gaussian mechanism (sensitivity bounded
    # by per-point clip to C_init in L2 over coordinates)
    def _private_init(key, sz):
        k1, k2, k3 = jax.random.split(key, 3)
        row_norms = jnp.linalg.norm(data, axis=1, keepdims=True)
        C_init = jnp.median(row_norms)
        clipped = data * jnp.minimum(1.0, C_init / jnp.maximum(row_norms, 1e-12))
        mean = clipped.sum(axis=0) / N + (dp.noise_multiplier * C_init / N) * \
            jax.random.normal(k1, (D,), dtype=data.dtype)
        std = jnp.std(data) + 1.0  # order-of-magnitude scale; not released
        pts0 = mean + std * jax.random.normal(k2, (sz, D), dtype=data.dtype)
        return pts0

    def _build(key, sz: int, aux0):
        k_init, k_opt = jax.random.split(key)
        pts0 = _private_init(k_init, sz)
        w0 = (N / sz) * jnp.ones(sz, dtype=data.dtype)

        def grad_fn(x, aux, k):
            w = x[:sz]
            p = x[sz:].reshape(sz, D)
            k_samp, k_sub, k_noise = jax.random.split(k, 3)
            samples, aux = sampler(k_samp, S, w, p, aux)
            sub_idcs, scaling = draw_subsample(k_sub, N, n_opt)
            vecs = center(model.log_likelihood(data[sub_idcs], samples))
            # --- the ONLY data-dependent statistic: clip + noise its sum ---
            norms = jnp.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs * jnp.minimum(1.0, C / jnp.maximum(norms, 1e-12))
            vec_sum = vecs.sum(axis=0) + noise_std * jax.random.normal(
                k_noise, (S,), dtype=data.dtype)
            # ---------------------------------------------------------------
            corevecs, pgrads = project_ll_with_grad(model, p, samples)
            resid = scaling * vec_sum - w @ corevecs
            wgrad = -(corevecs @ resid) / S
            ugrad = -jnp.einsum("i,isd,s->id", w, pgrads, resid) / S
            return jnp.concatenate([wgrad, ugrad.reshape(-1)]), aux

        nn_mask = jnp.concatenate([jnp.ones(sz, dtype=bool), jnp.zeros(sz * D, dtype=bool)])
        x0 = jnp.concatenate([w0, pts0.reshape(-1)])
        xf, _ = nn_adam(x0, grad_fn, aux0, k_opt, step_sizes, nn_mask=nn_mask)
        return xf[:sz], xf[sz:].reshape(sz, D)

    return jax.jit(_build, static_argnums=1)


class DiffPrivBatchPSVICoreset:
    """Eager wrapper (the class the reference exports but does not ship).
    API mirrors BatchPSVICoreset; ``get()`` returns (wts, pts) only —
    pseudo-points carry no data indices."""

    def __init__(self, data, ll_projector, opt_itrs: int = 100, n_subsample_opt=None,
                 step_sched: Callable = lambda m: (lambda i: 1.0 / (1.0 + i)),
                 clip_norm: float = 1.0, noise_multiplier: float = 1.0,
                 delta: float = 1e-5, seed: int = 0):
        from ..utils.prng import KeySequence

        self.data = jnp.asarray(data)
        self.projector = ll_projector
        self.opt_itrs = opt_itrs
        self.n_subsample_opt = n_subsample_opt
        self.step_sched = step_sched
        self.dp = DPConfig(clip_norm=clip_norm, noise_multiplier=noise_multiplier, delta=delta)
        self.keys = KeySequence(seed)
        self.wts = np.zeros(0)
        self.pts = np.zeros((0, self.data.shape[1]))
        self._builders = {}

    def epsilon(self, delta: Optional[float] = None) -> float:
        """(eps, delta)-DP guarantee of one completed build."""
        return gaussian_rdp_epsilon(self.opt_itrs, self.dp.noise_multiplier,
                                    delta if delta is not None else self.dp.delta)

    def build(self, itrs: int, sz: int) -> None:
        if sz not in self._builders:
            sched = self.step_sched(sz)
            steps = np.asarray([float(sched(i)) for i in range(self.opt_itrs)])
            cfg = BPSVIConfig(projection_dim=self.projector.projection_dimension,
                              n_subsample_opt=self.n_subsample_opt,
                              opt_itrs=self.opt_itrs)
            self._builders[sz] = make_dp_bpsvi_builder(
                self.data, self.projector.model, self.projector.sampler, cfg,
                self.dp, step_sizes=steps)
        aux0 = jnp.zeros(self.data.shape[1], dtype=self.data.dtype)
        w, p = self._builders[sz](self.keys(), sz, aux0)
        self.wts, self.pts = np.asarray(w), np.asarray(p)

    def get(self):
        keep = self.wts > 0
        return self.wts[keep], self.pts[keep]

    def size(self) -> int:
        return int((self.wts > 0).sum())
