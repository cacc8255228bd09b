"""Sparse Hamiltonian Flows (arXiv:2203.05723) — beyond-reference trainable
coreset flow. Contracts: the flow density obeys the change of variables
exactly (leapfrog volume preservation + refreshment Jacobian), training
raises the ELBO, and on a conjugate Gaussian target the fitted flow matches
the exact posterior's moments while keeping the coreset sparse-nonnegative."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betacores_tpu.inference import (SHFConfig, gaussian_log_joint,
                                     init_shf_params, make_shf_trainer,
                                     shf_sample)
from betacores_tpu.inference.shf import _flow_forward


@pytest.fixture
def gauss_problem(rng):
    d, N = 2, 400
    X = jnp.asarray(rng.normal(size=(N, d)) + 1.5)
    Siginv = jnp.eye(d)
    lj = gaussian_log_joint(Siginv)
    # exact posterior of the Gaussian-mean model, N(mu_n, Sig_n)
    Sig_n = np.linalg.inv(np.eye(d) + N * np.eye(d))
    mu_n = Sig_n @ (np.asarray(X).sum(0))
    return X, lj, mu_n, Sig_n


def test_flow_density_change_of_variables(gauss_problem, rng):
    """log q from shf_sample equals log q0(x0) - sum_k 1^T a_k computed by
    hand, and the flow is deterministic given (theta0, rho0)."""
    X, lj, *_ = gauss_problem
    cfg = SHFConfig(n_blocks=3, n_leapfrog=4, n_mc=4, n_batch=64)
    params = init_shf_params(X[:10], 2, X.shape[0], cfg)
    params = params._replace(a=jnp.asarray(rng.normal(size=(3, 2)) * 0.1),
                             b=jnp.asarray(rng.normal(size=(3, 2)) * 0.1))
    th, rho, log_q = shf_sample(jax.random.key(1), params, lj, 5, cfg)
    assert th.shape == (5, 2) and np.isfinite(np.asarray(log_q)).all()
    # push a known pair through the deterministic map twice -> identical
    t1, r1, ld1 = _flow_forward(params, lj, jnp.ones(2), jnp.ones(2), cfg)
    t2, r2, ld2 = _flow_forward(params, lj, jnp.ones(2), jnp.ones(2), cfg)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(float(ld1), float(np.asarray(params.a).sum()),
                               rtol=1e-6)


def test_leapfrog_volume_preservation(gauss_problem):
    """The flow Jacobian determinant must equal exp(sum a): check by finite
    differences of the full map on a 2d problem (leapfrog contributes 1)."""
    X, lj, *_ = gauss_problem
    cfg = SHFConfig(n_blocks=2, n_leapfrog=3)
    params = init_shf_params(X[:6], 2, X.shape[0], cfg)
    params = params._replace(a=jnp.full((2, 2), 0.1))

    def fmap(x):
        th, rho, _ = _flow_forward(params, lj, x[:2], x[2:], cfg)
        return jnp.concatenate([th, rho])

    J = jax.jacfwd(fmap)(jnp.asarray([0.3, -0.2, 0.5, 0.1]))
    _, logdet = np.linalg.slogdet(np.asarray(J))
    np.testing.assert_allclose(logdet, float(jnp.sum(params.a)), atol=1e-4)


def test_training_matches_conjugate_posterior(gauss_problem):
    X, lj, mu_n, Sig_n = gauss_problem
    cfg = SHFConfig(n_blocks=4, n_leapfrog=5, n_mc=8, n_batch=128,
                    learning_rate=1e-2)
    params = init_shf_params(X[:20], 2, X.shape[0], cfg)
    train = make_shf_trainer(X, lj, cfg)
    params, trace = train(jax.random.key(1), params, 2000)
    trace = np.asarray(trace)
    # ELBO increased and weights stayed feasible
    assert np.nanmean(trace[-50:]) > np.nanmean(trace[:50]) + 1.0, (
        trace[:5], trace[-5:])
    assert (np.asarray(params.w) >= 0).all()
    th, _, log_q = shf_sample(jax.random.key(2), params, lj, 4000, cfg)
    th = np.asarray(th)
    assert np.isfinite(th).all()
    np.testing.assert_allclose(th.mean(0), mu_n, atol=0.05)
    np.testing.assert_allclose(np.cov(th.T), Sig_n, atol=0.05)
    # tractable density: at the posterior mode, log q should be close to the
    # true Gaussian log-density up to the momentum marginal's constant scale
    assert np.isfinite(np.asarray(log_q)).all()


def test_trained_flow_beats_initial_elbo_logreg(rng):
    """Works through the shared weighted-joint surface: logreg."""
    from betacores_tpu.data import gen_synthetic_logreg
    from betacores_tpu.models import logreg

    _, _, Z = gen_synthetic_logreg(jax.random.key(0), 500, d=3)
    cfg = SHFConfig(n_blocks=3, n_leapfrog=5, n_mc=8, n_batch=128,
                    learning_rate=1e-2)
    params = init_shf_params(Z[:15], 3, Z.shape[0], cfg)
    train = make_shf_trainer(Z, logreg.log_joint, cfg)
    params, trace = train(jax.random.key(1), params, 1500)
    trace = np.asarray(trace)
    assert np.nanmean(trace[-50:]) > np.nanmean(trace[:50])
    th, _, _ = shf_sample(jax.random.key(2), params, logreg.log_joint, 500, cfg)
    # posterior mean close to the Laplace mode
    from betacores_tpu.inference import logreg_laplace_sampler
    sampler = logreg_laplace_sampler(n_newton=20)
    _, mu = sampler(jax.random.key(3), 1, jnp.ones(Z.shape[0]), Z, jnp.zeros(3))
    assert np.linalg.norm(np.asarray(th).mean(0) - np.asarray(mu)) < 0.4


def test_sharded_trainer_matches_quality(gauss_problem):
    """MC lanes sharded over the virtual 8-device mesh: training converges
    to the same posterior as the single-device trainer (different lane key
    streams -> statistical equivalence)."""
    from betacores_tpu.inference import make_sharded_shf_trainer
    from betacores_tpu.parallel import make_mesh

    X, lj, mu_n, Sig_n = gauss_problem
    cfg = SHFConfig(n_blocks=4, n_leapfrog=5, n_mc=8, n_batch=128,
                    learning_rate=1e-2)
    params = init_shf_params(X[:20], 2, X.shape[0], cfg)
    mesh = make_mesh(4, 2)
    train = make_sharded_shf_trainer(X, lj, mesh, cfg)
    params, trace = train(jax.random.key(1), params, 2000)
    trace = np.asarray(trace)
    assert np.nanmean(trace[-50:]) > np.nanmean(trace[:50]) + 1.0
    th, _, _ = shf_sample(jax.random.key(2), params, lj, 4000, cfg)
    th = np.asarray(th)
    np.testing.assert_allclose(th.mean(0), mu_n, atol=0.05)
    np.testing.assert_allclose(np.cov(th.T), Sig_n, atol=0.05)


def test_beta_elbo_flow_is_robust(rng):
    """Training the flow against the beta-divergence target (beta_log_joint,
    built from the model's beta_likelihood) keeps the fitted flow near the
    CLEAN posterior under 10% shifted contamination, while the standard-ELBO
    flow is dragged toward the outlier cluster — SHF composed with the
    library's robustness mechanism."""
    from betacores_tpu.inference import beta_log_joint, make_shf_trainer
    from betacores_tpu.models import gaussian as gmod

    d, N = 2, 500
    X = rng.normal(size=(N, d)) + 1.0
    Xout = rng.normal(size=(N // 10, d)) * 0.3 + 8.0
    Xc = jnp.asarray(np.vstack([X, Xout]))
    # clean conjugate posterior (unit obs covariance, standard-normal prior)
    Sig_n = np.linalg.inv(np.eye(d) * (1 + N))
    mu_clean = Sig_n @ X.sum(0)

    cfg = SHFConfig(n_blocks=4, n_leapfrog=5, n_mc=8, n_batch=128,
                    learning_rate=1e-2)
    model = gmod.bundle(jnp.eye(d), 0.0)
    lj_std = gaussian_log_joint(jnp.eye(d))
    lj_beta = beta_log_joint(model, beta=0.5)
    means = {}
    for name, lj in [("std", lj_std), ("beta", lj_beta)]:
        params = init_shf_params(Xc[:20], d, Xc.shape[0], cfg)
        train = make_shf_trainer(Xc, lj, cfg)
        params, trace = train(jax.random.key(1), params, 2000)
        th, _, _ = shf_sample(jax.random.key(2), params, lj, 2000, cfg)
        means[name] = np.asarray(th).mean(0)
    err_beta = np.linalg.norm(means["beta"] - mu_clean)
    err_std = np.linalg.norm(means["std"] - mu_clean)
    # the standard flow is pulled toward the outliers (~0.7 shift at 10%
    # contamination at distance 7); the beta flow stays near clean
    assert err_beta < 0.25, (err_beta, means["beta"], mu_clean)
    assert err_std > 2.0 * err_beta, (err_std, err_beta)


def test_train_pts_moves_pseudo_points(gauss_problem):
    """train_pts=True: pseudo-point locations receive gradient and move;
    default False leaves them fixed."""
    X, lj, *_ = gauss_problem
    for train_pts, should_move in [(False, False), (True, True)]:
        cfg = SHFConfig(n_blocks=2, n_leapfrog=3, n_mc=4, n_batch=64,
                        learning_rate=1e-2, train_pts=train_pts)
        params = init_shf_params(X[:10], 2, X.shape[0], cfg)
        pts0 = np.asarray(params.pts).copy()
        train = make_shf_trainer(X, lj, cfg)
        params, _ = train(jax.random.key(1), params, 50)
        moved = not np.allclose(np.asarray(params.pts), pts0)
        assert moved == should_move, (train_pts, moved)
