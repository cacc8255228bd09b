"""The two surviving Pallas kernels vs their XLA compositions (interpret
mode on the CPU test backend; the same kernels compile with Mosaic on TPU —
verified on hardware). The logreg/gaussian/poisson projection kernels were
RETIRED in the round-2 microbenchmark audit (RESULTS.md): XLA fuses those
projections into one HBM pass on its own and measured 1.5-2.5x faster."""

import jax.numpy as jnp
import numpy as np

from betacores_tpu.models import logreg
from betacores_tpu.ops.projection import center


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


def test_logreg_adam_step_fused_matches_composition(rng):
    """The single-launch refinement-step kernel == the exact XLA composition
    it replaces (samples-from-noise -> joint beta-projection -> centering ->
    residual -> weight gradient -> projected-Adam update), on the kernel's
    padded layout (interpret mode; on the v5e the fused step cut the N=1M
    headline build 0.953 s -> 0.70 s, RESULTS.md)."""
    from betacores_tpu.ops.pallas_kernels import (ADAM_B1, ADAM_B2, ADAM_EPS,
                                                  logreg_adam_step_fused)

    d, S, n_sub, M = 6, 50, 24, 5
    s_pad, M_pad = 128, 128
    scaling, beta = 41.7, 0.3
    lr, t = 0.37, 5.0
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
    m1 = np.zeros((1, M_pad), np.float32)
    m2 = np.zeros((1, M_pad), np.float32)
    m1[0, :M] = 0.1 * rng.normal(size=M)
    m2[0, :M] = 0.01 * rng.uniform(size=M)

    # the exact composition (coresets/incremental.py fused branch semantics
    # == utils/opt.py::nn_adam update on the gradient)
    theta = mu + z[:S] @ linv
    allvecs = center(logreg.beta_likelihood(jnp.asarray(rows), jnp.asarray(theta), beta))
    vals = np.asarray(allvecs) * mask[:, None]
    resid = scaling * vals[:n_sub].sum(axis=0) - w[0, :M] @ vals[n_sub:]
    g = -(vals[n_sub:] @ resid) / S
    m1e = ADAM_B1 * m1[0, :M] + (1 - ADAM_B1) * g
    m2e = ADAM_B2 * m2[0, :M] + (1 - ADAM_B2) * g * g
    we = np.maximum(
        w[0, :M] - lr * (m1e / (1 - ADAM_B1**t))
        / (ADAM_EPS + np.sqrt(m2e / (1 - ADAM_B2**t))), 0.0)

    # kernel-layout operands (padded rows/cols; mask packed as last column)
    xin = np.zeros((n_sub + M_pad, d + 1), np.float32)
    xin[:n_sub, :d] = rows[:n_sub]
    xin[:n_sub, d] = 1.0
    xin[n_sub:n_sub + M, :d] = rows[n_sub:]
    xin[n_sub:n_sub + M, d] = mask[n_sub:]
    sc = jnp.asarray([beta, scaling], jnp.float32)
    sclr = jnp.asarray([lr, 1 - ADAM_B1**t, 1 - ADAM_B2**t], jnp.float32)
    wn, m1n, m2n = logreg_adam_step_fused(
        jnp.asarray(xin), jnp.asarray(z), jnp.asarray(mu)[None, :],
        jnp.asarray(linv), jnp.asarray(w), jnp.asarray(m1), jnp.asarray(m2),
        sc, sclr, S, use_beta=True)
    wn, m1n, m2n = (np.asarray(a)[0] for a in (wn, m1n, m2n))
    np.testing.assert_allclose(m1n[:M], m1e, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(wn[:M], we, atol=2e-4, rtol=2e-4)
    # padded slots (zero init + zero grad) must stay exactly zero
    assert (wn[M:] == 0.0).all() and (m1n[M:] == 0.0).all() and (m2n[M:] == 0.0).all()


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


def test_logreg_shard_partials_matches_centered_gradient(rng):
    """The SHARD-LOCAL step kernel (parallel/sharded.py fused branch): run it
    once per simulated samp-shard column block, combine the partials exactly
    as the sharded builder does (psum == sum over blocks; uncentered identity
    g = -(a - mu_core * b)/S), and compare against the CENTERED gradient the
    XLA path computes — pinning both the kernel and the
    centering-cancellation algebra it relies on."""
    from betacores_tpu.ops.pallas_kernels import logreg_shard_step_partials

    d, S, n_sub, M = 6, 64, 24, 5
    n_samp, S_loc = 2, 32
    s_loc_pad, M_pad = 128, 128
    scaling, beta = 17.3, 0.4
    rows = rng.normal(size=(n_sub + M, d)).astype(np.float32)
    slot_mask = np.ones(M, np.float32)
    slot_mask[3:] = 0.0
    z = rng.normal(size=(S, d)).astype(np.float32)
    mu = rng.normal(size=d).astype(np.float32)
    Lp = np.tril(rng.normal(size=(d, d))).astype(np.float32) + 2 * np.eye(d, dtype=np.float32)
    linv = np.linalg.inv(Lp).astype(np.float32)
    w = np.zeros((1, M_pad), np.float32)
    w[0, :M] = rng.uniform(size=M) * 2 * slot_mask

    # centered reference gradient (the sharded XLA path's math)
    theta = mu + z @ linv
    vals = np.array(center(logreg.beta_likelihood(
        jnp.asarray(rows), jnp.asarray(theta), beta)))
    vals[n_sub:] *= slot_mask[:, None]
    resid_c = scaling * vals[:n_sub].sum(axis=0) - w[0, :M] @ vals[n_sub:]
    g_ref = -(vals[n_sub:] @ resid_c) / S

    # kernel partials per samp shard, combined like the builder
    xin = np.zeros((n_sub + M_pad, d + 1), np.float32)
    xin[:n_sub, :d] = rows[:n_sub]
    xin[:n_sub, d] = 1.0
    xin[n_sub:n_sub + M, :d] = rows[n_sub:]
    xin[n_sub:n_sub + M, d] = slot_mask
    sc = jnp.asarray([beta], jnp.float32)
    a = np.zeros((1, M_pad), np.float32)
    r = np.zeros((1, M_pad), np.float32)
    b = 0.0
    for ax_s in range(n_samp):
        z_blk = np.zeros((s_loc_pad, d), np.float32)
        z_blk[:S_loc] = z[ax_s * S_loc:(ax_s + 1) * S_loc]
        colsum, core, corerow, wcore = logreg_shard_step_partials(
            jnp.asarray(xin), jnp.asarray(z_blk), jnp.asarray(mu)[None, :],
            jnp.asarray(linv), jnp.asarray(w), sc, S_loc, use_beta=True)
        # psum('data') is a no-op here (one data shard); builder scales by
        # shard_scale == N/n == scaling / 1 ... the target scaling is applied
        # to colsum before the residual, exactly as in the builder
        r_unc = scaling * np.asarray(colsum) - np.asarray(wcore)  # (1, s_loc_pad)
        a += r_unc @ np.asarray(core).T
        r += np.asarray(corerow)
        b += r_unc.sum()
    g_kernel = -(a[0, :M] - (r[0, :M] / S) * b) / S
    np.testing.assert_allclose(g_kernel, g_ref, atol=3e-4, rtol=3e-4)
    # padded core slots contribute exactly zero
    assert (a[0, M:] == 0.0).all() and (r[0, M:] == 0.0).all()

