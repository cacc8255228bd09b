"""Fused Pallas projection kernels vs the plain XLA path (interpret mode on
the CPU test backend; the same kernels compile with Mosaic on TPU — verified
on hardware, 5 ms/projection at N=2^20 x S=100 f32)."""

import jax.numpy as jnp
import numpy as np
import pytest

from betacores_tpu.models import gaussian as gmod
from betacores_tpu.models import logreg
from betacores_tpu.ops.pallas_kernels import (
    gaussian_projection_fused,
    logreg_projection_fused,
)
from betacores_tpu.ops.projection import center


@pytest.fixture
def shapes(rng):
    N, D, S = 700, 6, 50  # deliberately unaligned rows and columns
    Z = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    TH = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32))
    return Z, TH


def test_logreg_fused_matches_xla(shapes):
    Z, TH = shapes
    ref = center(logreg.log_likelihood(Z, TH))
    got = logreg_projection_fused(Z, TH, use_beta=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    for beta in (0.1, 0.5):
        refb = center(logreg.beta_likelihood(Z, TH, beta))
        gotb = logreg_projection_fused(Z, TH, beta=beta, use_beta=True)
        np.testing.assert_allclose(np.asarray(gotb), np.asarray(refb), atol=2e-5)


def test_gaussian_fused_matches_xla(shapes, rng):
    Z, TH = shapes
    d = Z.shape[1]
    A = rng.normal(size=(d, d))
    Sig = A @ A.T + d * np.eye(d)
    Siginv = jnp.asarray(np.linalg.inv(Sig).astype(np.float32))
    ld = float(np.linalg.slogdet(Sig)[1])
    ref = center(gmod.log_likelihood(Z, TH, Siginv, ld))
    got = gaussian_projection_fused(Z, TH, Siginv, ld, use_beta=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)
    refb = center(gmod.beta_likelihood(Z, TH, 0.3, Siginv, ld))
    gotb = gaussian_projection_fused(Z, TH, Siginv, ld, beta=0.3, use_beta=True)
    np.testing.assert_allclose(np.asarray(gotb), np.asarray(refb), atol=5e-4)


def test_poisson_fused_matches_xla(rng):
    from betacores_tpu.models import poisson as pmod
    from betacores_tpu.ops.pallas_kernels import poisson_projection_fused

    N, D, S = 700, 5, 50
    x = rng.normal(size=(N, D - 1)).astype(np.float32)
    y = rng.poisson(lam=3.0, size=N).astype(np.float32)
    Z = jnp.asarray(np.concatenate([x, y[:, None]], axis=1))
    TH = jnp.asarray(0.5 * rng.normal(size=(S, D - 1)).astype(np.float32))

    ref = center(pmod.log_likelihood(Z, TH))
    got = poisson_projection_fused(Z, TH, use_beta=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
    for beta in (0.1, 0.5):
        refb = center(pmod.beta_likelihood(Z, TH, beta, k_max=32))
        gotb = poisson_projection_fused(Z, TH, beta=beta, use_beta=True, k_max=32)
        np.testing.assert_allclose(np.asarray(gotb), np.asarray(refb), atol=5e-5)
    # closed-form gaussian mass variant
    refg = center(pmod.beta_likelihood(Z, TH, 0.3, gaussian_mass=True))
    gotg = poisson_projection_fused(Z, TH, beta=0.3, use_beta=True, gaussian_mass=True)
    np.testing.assert_allclose(np.asarray(gotg), np.asarray(refg), atol=5e-5)


def test_fused_dispatch_threshold(rng):
    """project_ll routes big blocks to the fused kernel when the bundle has
    one, small blocks to XLA."""
    from betacores_tpu.ops import projection as proj
    from betacores_tpu.ops.pallas_kernels import FUSED_MIN_ROWS

    calls = {"fused": 0}

    def fake_fused(pts, th):
        calls["fused"] += 1
        return center(logreg.log_likelihood(pts, th))

    model = logreg.bundle(fused=False)._replace(fused_ll_projection=fake_fused)
    Z_small = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    Z_big = jnp.asarray(rng.normal(size=(FUSED_MIN_ROWS, 4)).astype(np.float32))
    TH = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    proj.project_ll(model, Z_small, TH)
    assert calls["fused"] == 0
    proj.project_ll(model, Z_big, TH)
    assert calls["fused"] == 1


def test_logreg_grad_step_fused_matches_composition(rng):
    """The single-launch refinement-step gradient kernel == the exact XLA
    composition it replaces (samples-from-noise -> joint beta-projection ->
    centering -> residual -> weight gradient), on the kernel's padded layout
    (interpret mode; on the v5e the kernel cut the N=1M headline build
    0.953 s -> 0.793 s, RESULTS.md)."""
    from betacores_tpu.ops.pallas_kernels import logreg_grad_step_fused

    d, S, n_sub, M = 6, 50, 24, 5
    s_pad, M_pad = 128, 128
    scaling, beta = 41.7, 0.3
    rows = rng.normal(size=(n_sub + M, d)).astype(np.float32)
    mask = np.ones(n_sub + M, np.float32)
    mask[n_sub + 3:] = 0.0  # dead coreset slots
    z = np.zeros((s_pad, d), np.float32)
    z[:S] = rng.normal(size=(S, d))
    mu = rng.normal(size=d).astype(np.float32)
    Lp = np.tril(rng.normal(size=(d, d))).astype(np.float32) + 2 * np.eye(d, dtype=np.float32)
    linv = np.linalg.inv(Lp).astype(np.float32)
    w = np.zeros((1, M_pad), np.float32)
    w[0, :M] = rng.uniform(size=M) * 3

    # the exact composition (coresets/incremental.py grad_fn)
    theta = mu + z[:S] @ linv
    allvecs = center(logreg.beta_likelihood(jnp.asarray(rows), jnp.asarray(theta), beta))
    vals = np.asarray(allvecs) * mask[:, None]
    resid = scaling * vals[:n_sub].sum(axis=0) - w[0, :M] @ vals[n_sub:]
    expected = -(vals[n_sub:] @ resid) / S

    # kernel-layout operands (padded rows/cols; mask packed as last column)
    xin = np.zeros((n_sub + M_pad, d + 1), np.float32)
    xin[:n_sub, :d] = rows[:n_sub]
    xin[:n_sub, d] = 1.0
    xin[n_sub:n_sub + M, :d] = rows[n_sub:]
    xin[n_sub:n_sub + M, d] = mask[n_sub:]
    sc = jnp.asarray([beta, scaling], jnp.float32)
    got = logreg_grad_step_fused(jnp.asarray(xin), jnp.asarray(z),
                                 jnp.asarray(mu)[None, :], jnp.asarray(linv),
                                 jnp.asarray(w), sc, S, use_beta=True)
    got = np.asarray(got)[0]
    np.testing.assert_allclose(got[:M], expected, atol=2e-4, rtol=2e-4)
    # padded / masked slots must be exactly zero, or Adam would update them
    assert (got[M:] == 0.0).all()
    assert (got[3:M][mask[n_sub + 3:n_sub + M] == 0.0] == 0.0).all()


def test_fused_grad_step_build_matches_xla_path(rng):
    """End to end: a build with IncrementalConfig(fused_grad_step=True)
    (kernel in interpret mode on CPU) selects the SAME points as the XLA
    path and lands on the same weights up to float op-order drift."""
    from betacores_tpu.coresets.incremental import (IncrementalConfig,
                                                    make_incremental_builder)
    from betacores_tpu.coresets.state import init_state
    from betacores_tpu.inference.samplers import logreg_laplace_sampler
    import jax

    N, D, M, S = 1500, 5, 15, 40
    th = rng.normal(size=D)
    X = rng.normal(size=(N, D))
    y = np.where(X @ th + 0.3 * rng.normal(size=N) > 0, 1.0, -1.0)
    Z = jnp.asarray((y[:, None] * X).astype(np.float32))
    mdl = logreg.bundle()
    smp = logreg_laplace_sampler()

    def run(fused):
        cfg = IncrementalConfig(projection_dim=S, n_subsample_select=150,
                                n_subsample_opt=150, opt_itrs=25, i0=0.5,
                                use_beta=True, fused_grad_step=fused)
        b = make_incremental_builder(Z, mdl, smp, cfg)
        st = init_state(M, D, beta=0.2,
                        sampler_aux=jnp.zeros(D, jnp.float32))
        st = b.build(jax.random.PRNGKey(3), st, 8)
        return np.asarray(st.wts), np.asarray(st.idcs), int(st.m)

    w0, i0_, m0 = run(False)
    w1, i1_, m1 = run(True)
    assert m0 == m1 and (i0_ == i1_).all()
    np.testing.assert_allclose(w1, w0, atol=5e-3 * max(1.0, np.abs(w0).max()))


def test_multiclass_fused_matches_xla(rng):
    """Fused K-class softmax projection == the XLA composition (interpret
    mode; on the v5e the kernel measured 7.7 ms vs 63 ms XLA at
    N=2^20 x S=100 x K=5 — the XLA path materializes (N, S, K) log-prob
    intermediates in HBM)."""
    from betacores_tpu.models import multiclass as mc
    from betacores_tpu.ops.pallas_kernels import multiclass_projection_fused

    K, d, N, S = 4, 6, 700, 50  # unaligned rows/cols
    Z = jnp.asarray(np.c_[rng.normal(size=(N, d)),
                          rng.integers(0, K, N)].astype(np.float32))
    TH = jnp.asarray(rng.normal(size=(S, K * d)).astype(np.float32))
    ref = center(mc.make_log_likelihood(K)(Z, TH))
    got = multiclass_projection_fused(Z, TH, K, use_beta=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    for beta in (0.1, 0.5):
        refb = center(mc.make_beta_likelihood(K)(Z, TH, beta))
        gotb = multiclass_projection_fused(Z, TH, K, beta=beta, use_beta=True)
        np.testing.assert_allclose(np.asarray(gotb), np.asarray(refb), atol=2e-5)
    # bundle routing: fused=True forces the kernel (interpret mode), and the
    # projection engine produces identical values either way
    from betacores_tpu.ops.projection import project_beta
    m_fused = mc.bundle(K, fused=True)
    m_plain = mc.bundle(K, fused=False)
    # large row count crosses the dispatch threshold
    Zbig = jnp.concatenate([Z] * 12)
    a = project_beta(m_fused, Zbig, TH, jnp.asarray(0.3, jnp.float32))
    b = project_beta(m_plain, Zbig, TH, jnp.asarray(0.3, jnp.float32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
