"""Incremental pseudo-coreset (PSVI).

The reference ships this algorithm broken — coreset/psvi.py has a literal
syntax error at :13 and an unfinished ``_build`` (:16-18), and is excluded
from the package exports (SURVEY.md section 0). This is a working
implementation of the evident intent: the SparseVI greedy skeleton, but
after each selection the refinement jointly optimizes the weights AND the
selected points' locations (pseudo-points), i.e. BPSVI's joint update
(coreset/bpsvi.py:44-62) inside SparseVI's incremental loop.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.projection import draw_subsample, project_ll, project_ll_with_grad
from ..utils.opt import nn_adam, step_schedule
from .incremental import IncrementalConfig
from .state import CoresetState


def make_psvi_builder(data: jnp.ndarray, model, sampler: Callable,
                      config: IncrementalConfig,
                      step_sizes: Optional[jnp.ndarray] = None) -> Callable:
    """Returns jitted ``build(key, state, itrs) -> state``. Requires
    ``model.grad_z_log_likelihood``."""
    if model.grad_z_log_likelihood is None:
        raise ValueError("PSVI needs model.grad_z_log_likelihood")
    if config.use_beta or config.learn_beta:
        raise ValueError("PSVI is KL-projection only; use_beta/learn_beta "
                         "are not supported (pass a plain BlackBoxProjector)")
    N, D = data.shape
    S = config.projection_dim
    n_sel = None if config.n_subsample_select is None else min(N, config.n_subsample_select)
    n_opt = None if config.n_subsample_opt is None else min(N, config.n_subsample_opt)
    dtype = data.dtype
    if step_sizes is None:
        step_sizes = step_schedule(config.i0, config.opt_itrs, dtype=dtype)
    step_sizes = jnp.asarray(step_sizes, dtype=dtype)

    def _bind(data):
        # data is a jit ARGUMENT (see incremental._bind: closed-over
        # datasets embed into the HLO)
        def _select(key, st: CoresetState) -> CoresetState:
            k_samp, k_sub = jax.random.split(key)
            samples, aux = sampler(k_samp, S, st.wts, st.pts, st.sampler_aux)
            if n_sel is None:
                vecs = project_ll(model, data, samples)
                scaling = jnp.asarray(1.0, dtype=dtype)
                sub_idcs = None
            else:
                sub_idcs, scaling = draw_subsample(k_sub, N, n_sel)
                vecs = project_ll(model, data[sub_idcs], samples)
            corevecs = project_ll(model, st.pts, samples) * st.slot_mask[:, None].astype(dtype)
            resid = scaling * vecs.sum(axis=0) - st.wts @ corevecs
            vn = jnp.sqrt(jnp.sum(vecs * vecs, axis=1))
            vn = jnp.where(vn > 0, vn, jnp.inf)
            corrs = (vecs @ resid) / vn / S
            # Duplicate guard only: never re-append an already-used
            # initializer row (a duplicate initialization gives identical
            # gradients forever). Unlike SparseVI, no take-new comparison
            # against existing slots — pseudo-points MOVE toward the
            # residual after selection, so moved slots' correlations would
            # beat any fresh candidate and block growth (measured: m stuck
            # at 1 after 20 iterations with the comparison in place).
            fcand = jnp.argmax(corrs)
            f = (fcand if sub_idcs is None else sub_idcs[fcand]).astype(jnp.int32)
            already = jnp.any(jnp.logical_and(st.idcs == f, st.slot_mask))
            M_max = st.wts.shape[0]
            add = jnp.logical_and(jnp.logical_not(already), st.m < M_max)
            slot = jnp.minimum(st.m, M_max - 1)
            return st._replace(
                idcs=jnp.where(add, st.idcs.at[slot].set(f), st.idcs),
                pts=jnp.where(add, st.pts.at[slot].set(data[f]), st.pts),
                m=jnp.where(add, st.m + 1, st.m),
                sampler_aux=aux,
            )

        def _optimize(key, st: CoresetState) -> CoresetState:
            M_max = st.wts.shape[0]
            act = st.slot_mask.astype(dtype)

            def grad_fn(x, aux, k):
                w = x[:M_max] * act
                p = x[M_max:].reshape(M_max, D)
                k_samp, k_sub = jax.random.split(k)
                samples, aux = sampler(k_samp, S, w, p, aux)
                if n_opt is None:
                    vecs = project_ll(model, data, samples)
                    scaling = jnp.asarray(1.0, dtype=dtype)
                else:
                    sub_idcs, scaling = draw_subsample(k_sub, N, n_opt)
                    vecs = project_ll(model, data[sub_idcs], samples)
                corevecs, pgrads = project_ll_with_grad(model, p, samples)
                corevecs = corevecs * act[:, None]
                resid = scaling * vecs.sum(axis=0) - w @ corevecs
                wgrad = -(corevecs @ resid) / S * act
                ugrad = -jnp.einsum("i,isd,s->id", w, pgrads, resid) / S * act[:, None]
                return jnp.concatenate([wgrad, ugrad.reshape(-1)]), aux

            nn_mask = jnp.concatenate([jnp.ones(M_max, dtype=bool),
                                       jnp.zeros(M_max * D, dtype=bool)])
            x0 = jnp.concatenate([st.wts, st.pts.reshape(-1)])
            xf, aux = nn_adam(x0, grad_fn, st.sampler_aux, key, step_sizes, nn_mask=nn_mask)
            return st._replace(wts=xf[:M_max] * act, pts=xf[M_max:].reshape(M_max, D),
                               sampler_aux=aux)

        return _select, _optimize

    @jax.jit
    def _build_d(data, key, st: CoresetState, itrs) -> CoresetState:
        # dynamic itrs: one compiled program for all build sizes
        _select, _optimize = _bind(data)

        def body(i, st):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            st = _select(k1, st)
            st = _optimize(k2, st)
            return st

        return jax.lax.fori_loop(0, itrs, body, st)

    build = lambda key, st, itrs: _build_d(data, key, st, itrs)
    return build


class PseudoSparseVICoreset:
    """Eager wrapper (API parity with the reference's intended class)."""

    def __init__(self, data, ll_projector, n_subsample_select=None, n_subsample_opt=None,
                 opt_itrs: int = 100, step_sched: Callable = lambda i: 1.0 / (1.0 + i),
                 seed: int = 0, max_size: int = 64):
        from ..utils.prng import KeySequence
        from .state import init_state

        self.data = jnp.asarray(data)
        steps = jnp.asarray([float(step_sched(i)) for i in range(opt_itrs)],
                            dtype=self.data.dtype)
        cfg = IncrementalConfig(projection_dim=ll_projector.projection_dimension,
                                n_subsample_select=n_subsample_select,
                                n_subsample_opt=n_subsample_opt, opt_itrs=opt_itrs)
        self._builder = make_psvi_builder(self.data, ll_projector.model,
                                          ll_projector.sampler, cfg, step_sizes=steps)
        self.keys = KeySequence(seed)
        self.state = init_state(max_size, self.data.shape[1], dtype=self.data.dtype)

    def build(self, itrs: int, sz: int) -> None:
        if int(self.state.m) + itrs > sz:
            raise ValueError("PseudoSparseVICoreset.build(): size overrun")
        self.state = self._builder(self.keys(), self.state, int(itrs))

    def get(self):
        from . import state as state_lib

        return state_lib.get(self.state)

    def size(self) -> int:
        import numpy as np

        return int((np.asarray(self.state.wts) > 0).sum())
