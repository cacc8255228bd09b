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
post-processing of the privatized statistics plus the SYNTHETIC pseudo-
points, so the released coreset satisfies (eps, delta)-DP under the
SUBSTITUTION neighboring relation by RDP composition (Mironov 2017) of
T + 1 Gaussian mechanisms: T per-step sum releases (the per-step
subsample is drawn WITHOUT replacement, so one substituted record moves
the clipped sum by at most 2 * clip_norm — the accounted sensitivity) plus
ONE noised clipped-mean release seeding the pseudo-point initialization
(clip/spread are the PUBLIC ``DPConfig.init_clip_norm/init_spread``
constants; no other data statistic touches the init). ``epsilon(delta)``
reports the composed bound; subsampling amplification is NOT claimed
(the bound is valid without it and would only improve with it).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.projection import center, project_ll_with_grad
from ..utils.opt import nn_adam, step_schedule
from .bpsvi import BPSVIConfig


@dataclasses.dataclass(frozen=True)
class DPConfig:
    clip_norm: float = 1.0
    noise_multiplier: float = 1.0
    delta: float = 1e-5
    # PUBLIC init constants (round-3 review: the original init read
    # jnp.std(data) and the median row norm un-noised, which leaked through
    # the released pseudo-points; all init knobs must be data-independent)
    init_clip_norm: float = 10.0   # per-row L2 clip of the noised-mean release
    init_spread: float = 1.0       # public pseudo-point scatter around the mean


def _rdp_epsilon_from_ratio2(total_ratio2: float, delta: float) -> float:
    """eps for a composition of Gaussian mechanisms with
    ``total_ratio2 = sum_i (Delta_i / sigma_i)^2`` via RDP (Mironov 2017):
    RDP_alpha = total_ratio2 * alpha / 2; eps = min_alpha RDP_alpha +
    log(1/delta)/(alpha - 1)."""
    alphas = np.concatenate([np.linspace(1.01, 64.0, 512), np.arange(65, 512)])
    rdp = total_ratio2 * alphas / 2.0
    eps = rdp + math.log(1.0 / delta) / (alphas - 1.0)
    return float(np.min(eps))


def gaussian_rdp_epsilon(steps: int, noise_multiplier: float, delta: float,
                         sens_factor: float = 2.0,
                         init_releases: int = 1) -> float:
    """(eps, delta) bound for one DP-BPSVI build: ``steps`` releases of the
    clipped per-step projection sum plus ``init_releases`` noised-mean init
    release, composed via RDP. No subsampling amplification is claimed.

    Neighboring relation: SUBSTITUTION of one record in a fixed-size
    dataset. The per-step subsample is drawn WITHOUT replacement, so a
    substituted record changes the clipped sum by at most
    ``sens_factor = 2`` clip norms (remove its vector, add the
    replacement's); the init mean release has substitution sensitivity
    ``2 * init_clip_norm / N`` and noise ``noise_multiplier`` times exactly
    that. Per-step noise is ``noise_multiplier * clip_norm`` against a
    ``sens_factor * clip_norm`` sensitivity, so the (Delta/sigma)^2 terms
    are ``sens_factor^2 / noise_multiplier^2`` (steps) and
    ``1 / noise_multiplier^2`` (init)."""
    nm2 = noise_multiplier ** 2
    return _rdp_epsilon_from_ratio2(
        (steps * sens_factor ** 2 + init_releases) / nm2, delta)


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

    # private initialization: pseudo-points scatter around a Gaussian-
    # mechanism release of the clipped data mean. EVERY data-dependent
    # quantity here is clipped to the PUBLIC dp.init_clip_norm and noised
    # (accounted as one extra mechanism in epsilon()); the scatter scale is
    # the public dp.init_spread constant. Round-3 review: the previous init
    # read jnp.std(data) and the median row norm raw — unbounded-sensitivity
    # statistics flowing into the released points with no covering noise.
    def _private_init(key, sz):
        k1, k2 = jax.random.split(key)
        C_init = jnp.asarray(dp.init_clip_norm, dtype=data.dtype)
        row_norms = jnp.linalg.norm(data, axis=1, keepdims=True)
        clipped = data * jnp.minimum(1.0, C_init / jnp.maximum(row_norms, 1e-12))
        # substitution sensitivity of the mean is 2*C_init/N; noise is
        # noise_multiplier times THAT, so this release's (Delta/sigma)^2 is
        # 1/nm^2 — exactly the init_releases=1 term in epsilon()
        mean = clipped.sum(axis=0) / N + (dp.noise_multiplier * 2.0 * C_init / N) * \
            jax.random.normal(k1, (D,), dtype=data.dtype)
        pts0 = mean + dp.init_spread * jax.random.normal(
            k2, (sz, D), dtype=data.dtype)
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
            # WITHOUT replacement (round-3 review): with replacement a
            # record drawn k times shifts the clipped sum by k*C while the
            # noise covers only the accounted 2*C substitution sensitivity
            sub_idcs = jax.random.permutation(k_sub, N)[:n_opt]
            scaling = jnp.asarray(N / n_opt, dtype=data.dtype)
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
                 delta: float = 1e-5, seed: int = 0,
                 init_clip_norm: float = 10.0, init_spread: float = 1.0):
        from ..utils.prng import KeySequence

        self.data = jnp.asarray(data)
        self.projector = ll_projector
        self.opt_itrs = opt_itrs
        self.n_subsample_opt = n_subsample_opt
        self.step_sched = step_sched
        self.dp = DPConfig(clip_norm=clip_norm, noise_multiplier=noise_multiplier,
                           delta=delta, init_clip_norm=init_clip_norm,
                           init_spread=init_spread)
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
