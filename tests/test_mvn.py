"""Unknown-covariance Gaussian (Normal-Inverse-Wishart) model family.

The reference's examples/common/mvn.py is dead code (shadowed numpy import,
syntax-invalid math) — these tests pin the working implementation: exact
conjugate weighted posterior vs a NumPy oracle, likelihood values vs dense
formulas, Monte-Carlo checks of the NIW sampler's exact marginal moments,
the beta-likelihood mass integral, autodiff beta-gradient vs finite
differences, and an end-to-end robust coreset build.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import betacores_tpu as bc
from betacores_tpu.models import mvn


@pytest.fixture
def prior():
    d = 3
    mu0 = np.zeros(d)
    kappa0 = 1.0
    Psi0 = np.eye(d) * 2.0
    nu0 = d + 4.0
    return d, mu0, kappa0, Psi0, nu0


def _oracle_niw(mu0, kappa0, Psi0, nu0, x, w):
    W = w.sum()
    xbar = (w[:, None] * x).sum(0) / W
    diff = x - xbar
    scatter = (w[:, None, None] * diff[:, :, None] * diff[:, None, :]).sum(0)
    kappa_n = kappa0 + W
    mu_n = (kappa0 * mu0 + W * xbar) / kappa_n
    nu_n = nu0 + W
    dm = xbar - mu0
    Psi_n = Psi0 + scatter + kappa0 * W / kappa_n * np.outer(dm, dm)
    return mu_n, kappa_n, Psi_n, nu_n


def test_weighted_post_matches_oracle(prior, rng):
    d, mu0, kappa0, Psi0, nu0 = prior
    x = rng.normal(size=(40, d))
    w = rng.uniform(0.1, 3.0, size=40)
    post = mvn.weighted_post(jnp.asarray(mu0), kappa0, jnp.asarray(Psi0), nu0,
                             jnp.asarray(x), jnp.asarray(w))
    mu_n, kappa_n, Psi_n, nu_n = _oracle_niw(mu0, kappa0, Psi0, nu0, x, w)
    np.testing.assert_allclose(np.asarray(post.mu), mu_n, rtol=1e-10)
    np.testing.assert_allclose(float(post.kappa), kappa_n, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(post.Psi), Psi_n, rtol=1e-9)
    np.testing.assert_allclose(float(post.nu), nu_n, rtol=1e-12)
    # zero weights -> the prior
    p0 = mvn.weighted_post(jnp.asarray(mu0), kappa0, jnp.asarray(Psi0), nu0,
                           jnp.asarray(x), jnp.zeros(40))
    np.testing.assert_allclose(np.asarray(p0.mu), mu0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p0.Psi), Psi0, atol=1e-8)


def test_log_likelihood_matches_dense(prior, rng):
    d, *_ = prior
    z = rng.normal(size=(7, d))
    mus = rng.normal(size=(5, d))
    Ls = []
    for _ in range(5):
        A = rng.normal(size=(d, d))
        Lam = A @ A.T + d * np.eye(d)
        Ls.append(np.linalg.cholesky(Lam))
    Ls = np.stack(Ls)
    th = mvn.pack(jnp.asarray(mus), jnp.asarray(Ls))
    ll = np.asarray(mvn.log_likelihood(jnp.asarray(z), th))
    for s in range(5):
        Lam = Ls[s] @ Ls[s].T
        Sig = np.linalg.inv(Lam)
        _, logdet = np.linalg.slogdet(Sig)
        for n in range(7):
            diff = z[n] - mus[s]
            want = -0.5 * d * np.log(2 * np.pi) - 0.5 * logdet - 0.5 * diff @ Lam @ diff
            np.testing.assert_allclose(ll[n, s], want, rtol=1e-8)
    # grad_z vs autodiff
    g = np.asarray(mvn.grad_z_log_likelihood(jnp.asarray(z), th))
    gexp = np.asarray(jax.vmap(lambda zz: jax.jacfwd(
        lambda zr: mvn.log_likelihood(zr[None], th)[0])(zz))(jnp.asarray(z)))
    np.testing.assert_allclose(g, gexp, rtol=1e-7, atol=1e-10)


def test_beta_mass_integral_monte_carlo(rng):
    """The closed-form integral p^(1+beta) dx in beta_likelihood equals the
    Monte-Carlo estimate E_p[p^beta]."""
    d, beta = 2, 0.4
    mu = rng.normal(size=d)
    A = rng.normal(size=(d, d))
    Lam = A @ A.T + d * np.eye(d)
    L = np.linalg.cholesky(Lam)
    th = mvn.pack(jnp.asarray(mu[None]), jnp.asarray(L[None]))
    Sig = np.linalg.inv(Lam)
    xs = rng.multivariate_normal(mu, Sig, size=400_000)
    ll = np.asarray(mvn.log_likelihood(jnp.asarray(xs), th))[:, 0]
    mc = np.exp(beta * ll).mean()
    _, logdet = np.linalg.slogdet(Sig)
    closed = np.exp(-0.5 * beta * (d * np.log(2 * np.pi) + logdet)
                    - 0.5 * d * np.log1p(beta))
    np.testing.assert_allclose(mc, closed, rtol=0.02)
    # and beta_likelihood uses exactly that mass
    bl = np.asarray(mvn.beta_likelihood(jnp.asarray(xs[:4]), th, beta))[:, 0]
    want = (beta + 1.0) / beta * np.exp(beta * ll[:4]) - closed
    np.testing.assert_allclose(bl, want, rtol=1e-6)


def test_beta_gradient_finite_difference(prior, rng):
    d, *_ = prior
    z = rng.normal(size=(6, d))
    mus = rng.normal(size=(4, d))
    L = np.linalg.cholesky(np.eye(d) * 1.5)
    th = mvn.pack(jnp.asarray(mus), jnp.asarray(np.tile(L, (4, 1, 1))))
    m = mvn.bundle(d)
    beta, eps = 0.35, 1e-5
    g = np.asarray(m.beta_gradient(jnp.asarray(z), th, beta))
    fd = (np.asarray(mvn.beta_likelihood(jnp.asarray(z), th, beta + eps))
          - np.asarray(mvn.beta_likelihood(jnp.asarray(z), th, beta - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-4, atol=1e-7)


def test_niw_sampler_moments(prior):
    """Exact NIW marginals: E[Lambda] = nu Psi^{-1}, E[Sigma] =
    Psi/(nu-d-1), E[mu] = mu_n, Cov[mu] = Psi/(kappa (nu-d-1))."""
    d, mu0, kappa0, Psi0, nu0 = prior
    post = mvn.NIWPosterior(mu=jnp.asarray(mu0 + 1.0),
                            kappa=jnp.asarray(4.0),
                            Psi=jnp.asarray(Psi0 * 1.5),
                            nu=jnp.asarray(nu0 + 6.0))
    n = 40_000
    th = mvn.sample_niw(jax.random.key(0), post, n)
    mu, L = mvn.unpack(th, d)
    mu, L = np.asarray(mu), np.asarray(L)
    Lam = L @ np.transpose(L, (0, 2, 1))
    ELam = float(post.nu) * np.linalg.inv(np.asarray(post.Psi))
    np.testing.assert_allclose(Lam.mean(0), ELam, rtol=0.05,
                               atol=0.02 * np.abs(ELam).max())
    Sig = np.linalg.inv(Lam)
    ESig = np.asarray(post.Psi) / (float(post.nu) - d - 1)
    np.testing.assert_allclose(Sig.mean(0), ESig, rtol=0.05,
                               atol=0.02 * np.abs(ESig).max())
    np.testing.assert_allclose(mu.mean(0), np.asarray(post.mu), atol=0.02)
    cov_mu = np.cov(mu.T)
    want = np.asarray(post.Psi) / (float(post.kappa) * (float(post.nu) - d - 1))
    np.testing.assert_allclose(cov_mu, want, rtol=0.08, atol=5e-4)


def test_robust_coreset_build_unknown_cov(prior, rng):
    """End-to-end: a beta-coreset with the NIW sampler survives 10% shifted
    outliers — its posterior mean lands far closer to the clean posterior
    mean than the corrupted full-data fit."""
    d, mu0, kappa0, Psi0, nu0 = prior
    N = 900
    X = rng.normal(size=(N, d)) + 2.0
    Xout = rng.normal(size=(N // 10, d)) * 0.5 + 12.0
    Xc = jnp.asarray(np.vstack([X, Xout]))
    model = mvn.bundle(d)
    sampler = mvn.mvn_niw_sampler(jnp.asarray(mu0), kappa0, jnp.asarray(Psi0), nu0)
    prj = bc.BetaBlackBoxProjector(sampler, 32, model.beta_likelihood,
                                   model.log_likelihood, model.beta_gradient,
                                   theta_dim=d + d * d)
    alg = bc.BetaCoreset(Xc, prj, beta=0.5, opt_itrs=60,
                         n_subsample_select=400, n_subsample_opt=200,
                         max_size=30, seed=3)
    alg.build(15, 15)
    w, p, i, _ = alg.get()
    assert len(w) > 0 and (np.asarray(w) >= 0).all()
    post_c = mvn.weighted_post(jnp.asarray(mu0), kappa0, jnp.asarray(Psi0), nu0,
                               jnp.asarray(p), jnp.asarray(w))
    post_clean = mvn.weighted_post(jnp.asarray(mu0), kappa0, jnp.asarray(Psi0),
                                   nu0, jnp.asarray(X), jnp.ones(N))
    post_bad = mvn.weighted_post(jnp.asarray(mu0), kappa0, jnp.asarray(Psi0),
                                 nu0, Xc, jnp.ones(Xc.shape[0]))
    err_core = np.linalg.norm(np.asarray(post_c.mu) - np.asarray(post_clean.mu))
    err_bad = np.linalg.norm(np.asarray(post_bad.mu) - np.asarray(post_clean.mu))
    assert err_core < 0.5 * err_bad, (err_core, err_bad)
    # the coreset's inferred covariance scale is in the clean ballpark, not
    # inflated by the outlier cluster
    ESig_core = np.asarray(post_c.Psi) / (float(post_c.nu) - d - 1)
    ESig_bad = np.asarray(post_bad.Psi) / (float(post_bad.nu) - d - 1)
    assert np.trace(ESig_core) < 0.5 * np.trace(ESig_bad)


def test_niw_kl_closed_form():
    """KL(p||p) = 0; closed form matches the Monte-Carlo estimate
    E_p[log p - log q] over exact NIW draws (parameterization-invariant
    ratio); positive and direction-sensitive."""
    d = 2
    p = mvn.NIWPosterior(mu=jnp.asarray([1.0, -0.5]), kappa=jnp.asarray(4.0),
                         Psi=jnp.asarray([[2.0, 0.3], [0.3, 1.5]]),
                         nu=jnp.asarray(9.0))
    q = mvn.NIWPosterior(mu=jnp.asarray([0.2, 0.1]), kappa=jnp.asarray(2.0),
                         Psi=jnp.asarray([[1.0, -0.2], [-0.2, 2.5]]),
                         nu=jnp.asarray(7.0))
    assert abs(float(mvn.niw_kl(p, p))) < 1e-8
    assert abs(float(mvn.niw_kl(q, q))) < 1e-8
    kl_pq = float(mvn.niw_kl(p, q))
    kl_qp = float(mvn.niw_kl(q, p))
    assert kl_pq > 0 and kl_qp > 0 and abs(kl_pq - kl_qp) > 1e-3

    # 60k draws: enough for rtol 0.05 in f64; 200k took ~37 s of suite time
    th = mvn.sample_niw(jax.random.key(0), p, 60_000)
    lp = jax.vmap(lambda t: mvn.niw_logpdf(t, p))(th)
    lq = jax.vmap(lambda t: mvn.niw_logpdf(t, q))(th)
    mc = float(jnp.mean(lp - lq))
    np.testing.assert_allclose(mc, kl_pq, rtol=0.05)
    # and the log-pdf itself is a normalized density: E_p[log p] finite,
    # MC of E_p[1] trivially 1 — sanity: quantiles of lp are finite
    assert np.isfinite(np.asarray(lp)).all()


def test_predictive_logpdf_matches_monte_carlo(rng):
    """The Student-t posterior predictive equals E_NIW[N(x; mu, Sigma)]
    (Monte-Carlo over exact NIW draws), and integrates correctly enough
    that importance-reweighted mass is ~1."""
    d = 2
    post = mvn.NIWPosterior(mu=jnp.asarray([0.5, -1.0]), kappa=jnp.asarray(3.0),
                            Psi=jnp.asarray([[2.0, 0.4], [0.4, 1.2]]),
                            nu=jnp.asarray(8.0))
    xs = jnp.asarray(rng.normal(size=(6, d)) * 1.5)
    closed = np.asarray(mvn.predictive_logpdf(xs, post))
    th = mvn.sample_niw(jax.random.key(0), post, 60_000)
    ll = np.asarray(mvn.log_likelihood(xs, th))        # (6, S)
    mc = np.log(np.exp(ll).mean(axis=1))
    np.testing.assert_allclose(closed, mc, atol=0.05)
