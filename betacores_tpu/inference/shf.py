"""Sparse Hamiltonian Flows: coreset-parameterized normalizing flows.

Beyond-reference capability from "Bayesian inference via sparse Hamiltonian
flows" (arXiv:2203.05723, Chen, Xu & Campbell, NeurIPS 2022): a variational
family whose transport maps are deterministic Hamiltonian (leapfrog)
dynamics targeting a TRAINED coreset posterior, interleaved with
deterministic invertible "quasi-refreshments" of the momentum. Because
leapfrog is volume-preserving and the refreshments have closed-form
Jacobians, the flow has a tractable density — so unlike the library's
greedy/VI coreset builds (which give a posterior you still have to sample
with HMC), a fitted SHF yields i.i.d. posterior samples AND log-densities
in one forward pass.

    q0(theta, rho) = N(mu0, diag(exp(2 logs0))) x N(0, I)
    T = R_K . H_L . ... . R_1 . H_L          (K blocks)
    H_L  : L leapfrog steps on  U_w(theta) = -log prior - sum_m w_m ll_m
           (|det J| = 1)
    R_k  : rho <- exp(a_k) . rho + b_k       (log|det J| = sum a_k)

Trained by maximizing the ELBO against the FULL-data posterior — the
coreset (w >= 0, trainable, optionally also the pseudo-point locations)
only shapes the DYNAMICS, which is what makes each flow step O(M) instead
of O(N):

    ELBO = E_q0[ log p(theta_T, D) + log N(rho_T; 0, I)
                 + sum_k 1^T a_k - log q0(theta_0, rho_0) ]

with log p(theta, D) estimated on uniform minibatches (unbiased N/B
rescale). Everything is one jitted Adam loop (optax) over
(w, pts [optional], eps, {a_k, b_k}, mu0, logs0).

The model enters through a single callable ``log_joint(Z, theta, w)`` — the
same weighted-joint surface the HMC evaluation targets use (models/logreg,
models/poisson, models/gaussian adapters), so any model family in the
library can be flowed.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class SHFConfig(NamedTuple):
    n_blocks: int = 8          # K quasi-refreshment blocks
    n_leapfrog: int = 10       # L leapfrog steps per block
    init_step: float = 0.05    # initial leapfrog step size
    train_pts: bool = False    # also optimize pseudo-point locations
    n_mc: int = 8              # q0 draws per ELBO estimate
    n_batch: int = 256         # data minibatch for the full log-joint term
    learning_rate: float = 1e-2


class SHFParams(NamedTuple):
    w: jnp.ndarray        # (M,) coreset weights (kept >= 0 by projection)
    pts: jnp.ndarray      # (M, D) coreset points (trained iff train_pts)
    log_eps: jnp.ndarray  # (K,) per-block leapfrog log step sizes
    a: jnp.ndarray        # (K, d) refreshment log-scales
    b: jnp.ndarray        # (K, d) refreshment shifts
    mu0: jnp.ndarray      # (d,) initial-distribution mean
    logs0: jnp.ndarray    # (d,) initial-distribution log-stddevs


def init_shf_params(pts0: jnp.ndarray, theta_dim: int, N: int,
                    config: SHFConfig = SHFConfig()) -> SHFParams:
    """Initialize from a size-M pseudo-coreset (e.g. a uniform subsample,
    reference BPSVI init: weights N/M). Deterministic: all randomness in the
    flow enters at sampling/training time through explicit keys."""
    M = pts0.shape[0]
    dtype = pts0.dtype
    return SHFParams(
        w=jnp.full((M,), N / M, dtype=dtype),
        pts=pts0,
        log_eps=jnp.full((config.n_blocks,), jnp.log(config.init_step), dtype=dtype),
        a=jnp.zeros((config.n_blocks, theta_dim), dtype=dtype),
        b=jnp.zeros((config.n_blocks, theta_dim), dtype=dtype),
        mu0=jnp.zeros(theta_dim, dtype=dtype),
        logs0=jnp.zeros(theta_dim, dtype=dtype),
    )


def _flow_forward(params: SHFParams, log_joint: Callable, theta0, rho0,
                  config: SHFConfig):
    """Push (theta0, rho0) through the flow. Returns (theta_T, rho_T,
    log_det) with log_det = sum_k 1^T a_k (leapfrog is volume-preserving)."""
    grad_U = jax.grad(lambda th: -log_joint(params.pts, th, params.w))

    def block(carry, inp):
        th, rho = carry
        log_eps_k, a_k, b_k = inp
        eps = jnp.exp(log_eps_k)

        def leap(carry, _):
            th, rho = carry
            rho = rho - 0.5 * eps * grad_U(th)
            th = th + eps * rho
            rho = rho - 0.5 * eps * grad_U(th)
            return (th, rho), None

        (th, rho), _ = jax.lax.scan(leap, (th, rho), None,
                                    length=config.n_leapfrog)
        rho = jnp.exp(a_k) * rho + b_k      # quasi-refreshment
        return (th, rho), None

    (th, rho), _ = jax.lax.scan(block, (theta0, rho0),
                                (params.log_eps, params.a, params.b))
    log_det = jnp.sum(params.a)
    return th, rho, log_det


def shf_sample(key, params: SHFParams, log_joint: Callable, n: int,
               config: SHFConfig = SHFConfig()):
    """(n, d) i.i.d. samples from the flow plus per-sample log q(theta, rho)
    (the flow's tractable density at the PUSHED pair)."""
    d = params.mu0.shape[0]
    k_th, k_rho = jax.random.split(key)
    s0 = jnp.exp(params.logs0)
    theta0 = params.mu0 + s0 * jax.random.normal(k_th, (n, d), dtype=params.mu0.dtype)
    rho0 = jax.random.normal(k_rho, (n, d), dtype=params.mu0.dtype)
    log_q0 = (_diag_normal_logpdf(theta0, params.mu0, params.logs0)
              + _std_normal_logpdf(rho0))
    th, rho, log_det = jax.vmap(
        lambda t, r: _flow_forward(params, log_joint, t, r, config))(theta0, rho0)
    return th, rho, log_q0 - log_det


def _std_normal_logpdf(x):
    return -0.5 * x.shape[-1] * jnp.log(2.0 * jnp.pi) - 0.5 * jnp.sum(x * x, axis=-1)


def _diag_normal_logpdf(x, mu, logs):
    z = (x - mu) / jnp.exp(logs)
    return (-0.5 * x.shape[-1] * jnp.log(2.0 * jnp.pi) - jnp.sum(logs)
            - 0.5 * jnp.sum(z * z, axis=-1))


def make_shf_trainer(data: jnp.ndarray, log_joint: Callable,
                     config: SHFConfig = SHFConfig()):
    """Returns jitted ``train(key, params, n_steps) -> (params, elbo_trace)``
    maximizing the full-data ELBO by Adam; ``n_steps`` is static (it sets
    the scan length / trace shape)."""
    N = data.shape[0]
    opt = optax.adam(config.learning_rate)

    def elbo(data, params: SHFParams, key) -> jnp.ndarray:
        k_s, k_b = jax.random.split(key)
        th, rho, log_q = shf_sample(k_s, params, log_joint, config.n_mc, config)
        # unbiased full-data log joint on a uniform minibatch: the model's
        # weighted joint with weights N/B on the batch reproduces
        # log prior + (N/B) sum_batch ll
        idx = jax.random.randint(k_b, (config.n_batch,), 0, N)
        batch = data[idx]
        wb = jnp.full((config.n_batch,), N / config.n_batch, dtype=data.dtype)
        log_p = jax.vmap(lambda t: log_joint(batch, t, wb))(th)
        return jnp.mean(log_p + _std_normal_logpdf(rho) - log_q)

    def train_step(data, carry, key):
        params, opt_state = carry
        loss, g = jax.value_and_grad(lambda p: -elbo(data, p, key))(params)
        if not config.train_pts:
            g = g._replace(pts=jnp.zeros_like(g.pts))
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        params = params._replace(w=jnp.maximum(params.w, 0.0))  # w >= 0
        return (params, opt_state), -loss

    @partial(jax.jit, static_argnums=3)
    def _train_d(data, key, params: SHFParams, n_steps: int):
        # data is a jit ARGUMENT (a closed-over dataset embeds into the HLO,
        # CLAUDE.md / coresets/incremental.py::_bind)
        opt_state = opt.init(params)
        keys = jax.random.split(key, n_steps)
        (params, _), trace = jax.lax.scan(
            lambda c, k: train_step(data, c, k), (params, opt_state), keys)
        return params, trace

    return lambda key, params, n_steps: _train_d(data, key, params, n_steps)


def make_sharded_shf_trainer(data: jnp.ndarray, log_joint: Callable, mesh,
                             config: SHFConfig = SHFConfig()):
    """Mesh-sharded flow training: the ELBO's Monte-Carlo lanes are split
    over ALL mesh devices (like the BPSVI size axis and the sharded HMC
    chains) — each device pushes its n_mc/P flow samples and draws its own
    minibatch; the only collective is one psum of the (tiny) parameter
    gradient per Adam step. Params and data are replicated (flow dynamics
    cost O(M); data appears only through B-row minibatches). ``config.n_mc``
    must divide the device count P (use n_mc = k*P).

    Same signature as ``make_shf_trainer``: returns
    ``train(key, params, n_steps) -> (params, elbo_trace)``."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, SAMP_AXIS, require_axes

    n_data, n_samp = require_axes(mesh)
    n_dev = n_data * n_samp
    if config.n_mc % n_dev:
        raise ValueError(f"n_mc {config.n_mc} must divide over {n_dev} devices")
    n_mc_loc = config.n_mc // n_dev
    N = data.shape[0]
    opt = optax.adam(config.learning_rate)
    cfg_loc = config._replace(n_mc=n_mc_loc)

    def _local_neg_elbo_sum(data, params, key):
        """Sum (not mean) of this device's ELBO terms; the psum'd gradient
        divided by n_mc reproduces the replicated-mean gradient."""
        k_s, k_b = jax.random.split(key)
        th, rho, log_q = shf_sample(k_s, params, log_joint, n_mc_loc, cfg_loc)
        idx = jax.random.randint(k_b, (config.n_batch,), 0, N)
        batch = data[idx]
        wb = jnp.full((config.n_batch,), N / config.n_batch, dtype=data.dtype)
        log_p = jax.vmap(lambda t: log_joint(batch, t, wb))(th)
        return -jnp.sum(log_p + _std_normal_logpdf(rho) - log_q)

    def _step_local(data, carry, key):
        params, opt_state = carry
        dev = jax.lax.axis_index(DATA_AXIS) * n_samp + jax.lax.axis_index(SAMP_AXIS)
        k_dev = jax.random.fold_in(key, dev)
        loss_loc, g = jax.value_and_grad(
            lambda p: _local_neg_elbo_sum(data, p, k_dev))(params)
        g = jax.tree.map(lambda x: jax.lax.psum(
            jax.lax.psum(x, DATA_AXIS), SAMP_AXIS) / config.n_mc, g)
        if not config.train_pts:
            g = g._replace(pts=jnp.zeros_like(g.pts))
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        params = params._replace(w=jnp.maximum(params.w, 0.0))
        elbo = -jax.lax.psum(jax.lax.psum(loss_loc, DATA_AXIS), SAMP_AXIS) / config.n_mc
        return (params, opt_state), elbo

    @partial(jax.jit, static_argnums=3)
    def _train_d(data, key, params: SHFParams, n_steps: int):
        def local(data, key, params):
            opt_state = opt.init(params)
            keys = jax.random.split(key, n_steps)
            (params, _), trace = jax.lax.scan(
                lambda c, k: _step_local(data, c, k), (params, opt_state), keys)
            return params, trace

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), jax.tree.map(lambda _: P(), params)),
            out_specs=(jax.tree.map(lambda _: P(), params), P()),
            check_vma=False,
        )(data, key, params)

    return lambda key, params, n_steps: _train_d(data, key, params, n_steps)


def beta_log_joint(model, beta: float, log_prior: Callable = None):
    """Robust beta-divergence training target with the ``log_joint(Z, theta,
    w)`` signature: log prior + sum_n w_n f_beta(z_n, theta), built from any
    ModelFns bundle's ``beta_likelihood``. Training the flow against THIS
    target instead of the standard log joint makes the fitted flow robust to
    contamination — the same mechanism that makes beta-Cores robust
    (density-power downweighting of low-likelihood points), composed with
    SHF. Default prior: standard normal on theta."""
    blik = model.beta_likelihood

    def log_joint(Z, th, w):
        f = blik(Z, th[None, :], beta)[:, 0]
        lp = (-0.5 * th.shape[-1] * jnp.log(2.0 * jnp.pi)
              - 0.5 * jnp.sum(th * th)) if log_prior is None else log_prior(th)
        return jnp.sum(w * f) + lp

    return log_joint


def gaussian_log_joint(Siginv, mu0=None, Sig0inv=None):
    """Adapter: weighted Gaussian-mean log joint (known covariance) with the
    ``log_joint(Z, theta, w)`` signature the flow (and weighted HMC) expect."""

    def log_joint(Z, th, w):
        d = th.shape[-1]
        m0 = jnp.zeros(d, th.dtype) if mu0 is None else mu0
        S0 = jnp.eye(d, dtype=th.dtype) if Sig0inv is None else Sig0inv
        diff = Z - th[None, :]
        ll = -0.5 * jnp.einsum("nd,de,ne->n", diff, Siginv, diff)
        dp = th - m0
        return jnp.sum(w * ll) - 0.5 * dp @ S0 @ dp

    return log_joint
