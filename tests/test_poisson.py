"""Poisson regression model family (reference stan_code.py:22-42 Poisson
program; beta-likelihood is new here — the reference has none for counts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import betacores_tpu as bc
from betacores_tpu.data import gen_synthetic_poisson
from betacores_tpu.inference import poisson_laplace_sampler
from betacores_tpu.models import poisson


@pytest.fixture
def problem(rng):
    X, y, Z, th_true = gen_synthetic_poisson(jax.random.key(0), N=400, d=4,
                                             dtype=jnp.float64)
    ths = jnp.asarray(th_true + 0.3 * rng.normal(size=(6, 4)))
    return Z, ths, th_true


def test_log_likelihood_matches_scipy(problem):
    Z, ths, _ = problem
    ll = np.asarray(poisson.log_likelihood(Z, ths))
    x, y = np.asarray(Z[:, :-1]), np.asarray(Z[:, -1])
    f = np.logaddexp(0.0, x @ np.asarray(ths).T)  # softplus
    expected = stats.poisson.logpmf(y[:, None], f)
    np.testing.assert_allclose(ll, expected, rtol=1e-9, atol=1e-9)


def test_beta_likelihood_truncation_exact(problem):
    """The k_max-truncated mass sum equals a brute-force numpy sum."""
    Z, ths, _ = problem
    beta = 0.4
    got = np.asarray(poisson.beta_likelihood(Z[:50], ths, beta, k_max=64))
    x, y = np.asarray(Z[:50, :-1]), np.asarray(Z[:50, -1])
    f = np.logaddexp(0.0, x @ np.asarray(ths).T)
    p_y = stats.poisson.pmf(y[:, None], f)
    ks = np.arange(0, 200)
    mass = (stats.poisson.pmf(ks[None, None, :], f[:, :, None]) ** (beta + 1.0)).sum(-1)
    expected = (beta + 1.0) / beta * p_y**beta - mass
    np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-9)


def test_beta_likelihood_recovers_ll_as_beta_to_0(problem):
    """(f_beta(z) - f_beta(z')) -> (ll(z) - ll(z')) as beta -> 0 (the
    density-power divergence limit; constants cancel in differences)."""
    Z, ths, _ = problem
    beta = 1e-4
    fb = np.asarray(poisson.beta_likelihood(Z[:50], ths, beta))
    ll = np.asarray(poisson.log_likelihood(Z[:50], ths))
    # (beta+1)/beta p^b = 1/beta + 1 + log p + O(beta): differences across
    # rows converge to log-likelihood differences directly
    d_fb = fb - fb[0:1]
    d_ll = ll - ll[0:1]
    np.testing.assert_allclose(d_fb, d_ll, rtol=0, atol=2e-2)


def test_grads_finite_difference(problem):
    Z, ths, _ = problem
    z0 = Z[3]
    g = np.asarray(poisson.grad_z_log_likelihood(z0[None, :], ths))[0]  # (S, D)
    eps = 1e-6
    for j in range(z0.shape[0]):
        zp = z0.at[j].add(eps)
        zm = z0.at[j].add(-eps)
        fd = (np.asarray(poisson.log_likelihood(zp[None], ths))
              - np.asarray(poisson.log_likelihood(zm[None], ths)))[0] / (2 * eps)
        np.testing.assert_allclose(g[:, j], fd, rtol=1e-4, atol=1e-6)

    th0 = ths[0]
    wts = jnp.ones(Z.shape[0], dtype=Z.dtype)
    g_th = np.asarray(poisson.grad_th_log_joint(Z, th0, wts))
    fd = np.zeros_like(g_th)
    for j in range(th0.shape[0]):
        tp, tm = th0.at[j].add(eps), th0.at[j].add(-eps)
        fd[j] = (poisson.log_joint(Z, tp, wts) - poisson.log_joint(Z, tm, wts)) / (2 * eps)
    np.testing.assert_allclose(g_th, fd, rtol=1e-5, atol=1e-5)


def test_fisher_hessian_negative_definite(problem):
    Z, ths, _ = problem
    wts = jnp.ones(Z.shape[0], dtype=Z.dtype)
    for th in ths[:3]:
        H = np.asarray(poisson.hess_th_log_joint(Z, th, wts))
        assert (np.linalg.eigvalsh(H) < 0).all()
        dh = np.asarray(poisson.diag_hess_th_log_joint(Z, th, wts))
        np.testing.assert_allclose(np.diag(H), dh, rtol=1e-9)


def test_laplace_recovers_truth(problem):
    Z, _, th_true = problem
    sampler = poisson_laplace_sampler()
    wts = jnp.ones(Z.shape[0], dtype=Z.dtype)
    samples, mu = sampler(jax.random.key(1), 256, wts, Z, jnp.zeros(4, dtype=Z.dtype))
    assert np.linalg.norm(np.asarray(mu) - np.asarray(th_true)) < 0.5
    assert np.linalg.norm(np.asarray(samples).mean(0) - np.asarray(mu)) < 0.2


def test_bcores_poisson_end_to_end(rng):
    """beta-Cores on contaminated counts: corrupted rows get huge counts;
    the robust build should recover a better posterior mode than uniform."""
    X, y, Z, th_true = gen_synthetic_poisson(jax.random.key(2), N=600, d=4,
                                             dtype=jnp.float64)
    n_bad = 60
    y_bad = y.at[:n_bad].set(y[:n_bad] + 40.0)  # gross count corruption
    Zc = jnp.concatenate([X, y_bad[:, None]], axis=1)

    model = poisson.bundle(k_max=96)
    sampler = poisson_laplace_sampler()
    prj = bc.BetaBlackBoxProjector(sampler, 32, model.beta_likelihood,
                                   model.log_likelihood, model.beta_gradient,
                                   theta_dim=4)
    alg = bc.BetaCoreset(Zc, prj, beta=0.5, opt_itrs=50,
                         n_subsample_select=200, n_subsample_opt=100, seed=1)
    alg.build(20, 20)
    w, p, idcs, beta = alg.get()
    assert (w >= 0).all() and 1 <= len(w) <= 20

    # mode of the coreset posterior vs mode of the full corrupted posterior
    def fit(zs, ws):
        _, mu = sampler(jax.random.key(3), 1, jnp.asarray(ws), jnp.asarray(zs),
                        jnp.zeros(4, dtype=Z.dtype))
        return np.asarray(mu)

    mu_core = fit(p, w)
    mu_bad = fit(Zc, np.ones(Zc.shape[0]))
    err_core = np.linalg.norm(mu_core - np.asarray(th_true))
    err_bad = np.linalg.norm(mu_bad - np.asarray(th_true))
    assert err_core < err_bad, (err_core, err_bad)


def test_gaussian_mass_matches_exact_for_large_rates(rng):
    # rates >= ~15: the closed-form Gaussian-approx mass term should agree
    # with the exact truncated sum to ~1%
    d = 3
    X = np.abs(rng.normal(size=(40, d))) + 2.0   # eta = X.th >= ~6 -> f >= 6
    th = np.ones((4, d))
    y = rng.poisson(10.0, size=40).astype(float)
    Z = jnp.asarray(np.c_[X, y])
    ths = jnp.asarray(th)
    beta = 0.4
    exact = np.asarray(poisson.beta_likelihood(Z, ths, beta, k_max=256))
    approx = np.asarray(poisson.beta_likelihood(Z, ths, beta, gaussian_mass=True))
    # compare the mass terms via the difference from the shared p^beta term
    pb = (beta + 1.0) / beta * np.exp(beta * np.asarray(poisson.log_likelihood(Z, ths)))
    np.testing.assert_allclose(pb - approx, pb - exact, rtol=2e-2)


def test_extreme_eta_stability_f32():
    """Underflowing rates (eta << 0) must not overflow y/f to inf in f32
    (the stable sigmoid/softplus ratio -> 1 as eta -> -inf)."""
    d = 2
    x = jnp.asarray([[-50.0, 1.0], [50.0, 1.0]], dtype=jnp.float32)
    y = jnp.asarray([7.0, 3.0], dtype=jnp.float32)
    Z = jnp.concatenate([x, y[:, None]], axis=1)
    th = jnp.asarray([3.0, 0.0], dtype=jnp.float32)   # eta = -150, +150
    wts = jnp.ones(2, dtype=jnp.float32)
    for fn in (poisson.log_joint, poisson.grad_th_log_joint,
               poisson.hess_th_log_joint, poisson.diag_hess_th_log_joint):
        v = np.asarray(fn(Z, th, wts))
        assert np.isfinite(v).all(), (fn.__name__, v)
    ll = np.asarray(poisson.log_likelihood(Z, th[None, :].astype(jnp.float32)))
    assert np.isfinite(ll).all()
    g = np.asarray(poisson.grad_z_log_likelihood(Z, th[None, :]))
    assert np.isfinite(g).all()
    # ratio limit: at eta=-150, y*s/f -> y, so grad coefficient -> y - s ~ y
    c = float((y[0] * jnp.exp(jax.nn.log_sigmoid(jnp.float32(-150.0))
                              - (-150.0))))
    assert abs(c - 7.0) < 1e-3
