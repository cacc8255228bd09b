"""Coreset algorithm tests.

Golden tests drive the jitted builds and the independent NumPy oracle down
identical deterministic trajectories (fixed posterior samples, no
subsampling) and compare weights/support. The end-to-end test is SURVEY.md
section 7's minimum slice: synthetic contaminated Gaussian data, conjugate
posterior, closed-form reverse KL (reference zellner_gaussian/main.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import betacores_tpu as bc
from betacores_tpu.inference import fixed_sampler, gaussian_conjugate_sampler
from betacores_tpu.models import gaussian as gmod
from oracle import coresets as ocs
from oracle import models as om


def _setup_gauss(rng, N=40, d=3, S=8):
    Sig = np.eye(d) * 2.0
    Siginv = np.linalg.inv(Sig)
    logdetSig = np.linalg.slogdet(Sig)[1]
    X = rng.normal(size=(N, d))
    samples = rng.normal(size=(S, d))
    model = gmod.bundle(jnp.asarray(Siginv), logdetSig)
    return X, samples, Siginv, logdetSig, model


class TestIncrementalGolden:
    """JAX build vs oracle build, identical deterministic trajectories."""

    @pytest.mark.parametrize("use_beta", [False, True])
    def test_build_matches_oracle(self, rng, use_beta):
        X, samples, Siginv, logdetSig, model = _setup_gauss(rng)
        beta = 0.4
        M, opt_itrs = 6, 25
        sched = lambda i: 0.5 / (1.0 + i)

        prj_cls = bc.BetaBlackBoxProjector if use_beta else bc.BlackBoxProjector
        if use_beta:
            prj = prj_cls(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                          model.beta_likelihood, model.log_likelihood, model.beta_gradient)
            alg = bc.BetaCoreset(jnp.asarray(X), prj, beta=beta, learn_beta=False,
                                 opt_itrs=opt_itrs, step_sched=sched, seed=1)
        else:
            prj = prj_cls(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                          model.log_likelihood)
            alg = bc.SparseVICoreset(jnp.asarray(X), prj, opt_itrs=opt_itrs,
                                     step_sched=sched, seed=1)

        for m in range(1, M + 1):
            alg.build(1, m)
        got = alg.get()
        w_got, p_got, i_got = got[0], got[1], got[2]

        if use_beta:
            lik = lambda pts, s: om.gauss_beta_likelihood(pts, s, beta, Siginv)
        else:
            lik = lambda pts, s: om.gauss_log_likelihood(pts, s, Siginv, logdetSig)
        w_o, i_o, p_o = ocs.incremental_build_deterministic(
            X, M, opt_itrs, sched, lambda w, p: samples, lik
        )
        keep = w_o > 0
        np.testing.assert_array_equal(np.sort(i_got), np.sort(i_o[keep]))
        # align by index for weight comparison
        order_g, order_o = np.argsort(i_got), np.argsort(i_o[keep])
        np.testing.assert_allclose(w_got[order_g], w_o[keep][order_o], rtol=1e-6, atol=1e-9)

    def test_learn_beta_runs_and_updates(self, rng):
        X, samples, Siginv, logdetSig, model = _setup_gauss(rng)
        prj = bc.BetaBlackBoxProjector(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                                       model.beta_likelihood, model.log_likelihood,
                                       model.beta_gradient)
        alg = bc.BetaCoreset(jnp.asarray(X), prj, beta=0.5, learn_beta=True,
                             opt_itrs=15, seed=2)
        alg.build(3, 3)
        w, p, i, beta = alg.get()
        assert np.isfinite(beta) and beta >= 0.0
        assert len(w) >= 1 and (w >= 0).all()

    def test_learn_beta_matches_oracle(self, rng):
        """Deterministic golden trajectory for the JOINT (w, beta) refinement
        — the reference's intended learn_beta update (bcores.py:126-140,
        projector.py:56-61; its implementation crashes on a missing method)
        reproduced by the independent NumPy oracle with the exact analytic
        d/d(beta)."""
        X, samples, Siginv, logdetSig, model = _setup_gauss(rng)
        beta0 = 0.4
        M, opt_itrs = 5, 20
        sched = lambda i: 0.5 / (1.0 + i)

        prj = bc.BetaBlackBoxProjector(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                                       model.beta_likelihood, model.log_likelihood,
                                       model.beta_gradient)
        alg = bc.BetaCoreset(jnp.asarray(X), prj, beta=beta0, learn_beta=True,
                             opt_itrs=opt_itrs, step_sched=sched, seed=1)
        for m in range(1, M + 1):
            alg.build(1, m)
        w_got, p_got, i_got, beta_got = alg.get()

        w_o, i_o, p_o, beta_o = ocs.incremental_build_learn_beta_deterministic(
            X, M, opt_itrs, sched, lambda w, p: samples,
            lambda pts, s, b: om.gauss_beta_likelihood(pts, s, b, Siginv),
            lambda pts, s, b: om.gauss_beta_gradient(pts, s, b, Siginv),
            beta0,
        )
        assert beta_got != pytest.approx(beta0), "beta never moved"
        assert beta_got == pytest.approx(beta_o, rel=1e-6)
        keep = w_o > 0
        np.testing.assert_array_equal(np.sort(i_got), np.sort(i_o[keep]))
        order_g, order_o = np.argsort(i_got), np.argsort(i_o[keep])
        np.testing.assert_allclose(w_got[order_g], w_o[keep][order_o], rtol=1e-6, atol=1e-9)

    def test_learn_beta_respects_cap(self, rng):
        """The joint (w, beta) refinement clamps beta to (floor, beta_cap]:
        the raw tangent residual has a degenerate minimum at beta -> inf
        (see coresets/incremental.py), so an uncapped Adam walk can leave
        the density-power range (0, 1]. Both the default cap and an explicit
        one must bound the learned beta."""
        X, samples, Siginv, logdetSig, model = _setup_gauss(rng)
        prj = bc.BetaBlackBoxProjector(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                                       model.beta_likelihood, model.log_likelihood,
                                       model.beta_gradient)
        for cap in (1.0, 0.45):
            alg = bc.BetaCoreset(jnp.asarray(X), prj, beta=0.4, learn_beta=True,
                                 opt_itrs=25, seed=2, beta_cap=cap,
                                 step_sched=lambda i: 5.0)  # huge steps force the clamp
            alg.build(3, 3)
            beta = float(np.ravel(alg.get()[3])[-1])
            assert 1e-3 <= beta <= cap + 1e-7

    def test_error_decreases_and_feeds_rollback(self, rng):
        """error() is a real tangent-space residual (deviation from the
        reference's hard-coded 0, PARITY.md): it must shrink as the build
        grows the coreset, and optimize()'s rollback guard must FIRE when a
        refinement pass degrades it (reference contract coreset.py:48-65)."""
        X, samples, _, _, model = _setup_gauss(rng, N=60)
        prj = bc.BlackBoxProjector(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                                   model.log_likelihood)
        alg = bc.SparseVICoreset(jnp.asarray(X), prj, opt_itrs=30, seed=3,
                                 step_sched=lambda i: 0.5 / (1.0 + i))
        e0 = alg.error()
        assert e0 > 0.0
        for m in range(1, 9):
            alg.build(1, m)
        e1 = alg.error()
        assert 0.0 < e1 < 0.8 * e0, (e0, e1)

        # a "refinement" that corrupts the weights must be rolled back
        good_state = alg.state
        builder = alg._builder

        class _Corrupting:
            def optimize(self, key, st, ctx=None):
                return st._replace(wts=st.wts * 100.0)

            def __getattr__(self, name):
                return getattr(builder, name)

        alg._builder = _Corrupting()
        alg.optimize()
        alg._builder = builder
        assert alg.reached_numeric_limit
        np.testing.assert_array_equal(np.asarray(alg.state.wts),
                                      np.asarray(good_state.wts))

        # and a genuine optimize() on the restored instance must be accepted
        alg.reached_numeric_limit = False
        alg.optimize()
        assert not alg.reached_numeric_limit

    def test_predrawn_fast_path_matches_per_step(self, rng):
        """The refinement loop's from_noise fast path (pre-drawn noise and
        subsample indices, pre-gathered + pre-concatenated rows,
        incremental.py::_optimize) claims BIT-IDENTICAL values to the
        per-step path — it replays nn_adam's exact key stream. Pin it:
        the same build with the from_noise attribute stripped must produce
        byte-equal selections and weights."""
        X, _, Siginv, logdetSig, model = _setup_gauss(rng, N=50, d=3)
        smp = gaussian_conjugate_sampler(jnp.zeros(3), jnp.eye(3),
                                         jnp.asarray(Siginv))
        slow = lambda key, n, w, pts, aux: smp(key, n, w, pts, aux)
        assert getattr(slow, "from_noise", None) is None

        def run(sampler):
            prj = bc.BetaBlackBoxProjector(sampler, 8, model.beta_likelihood,
                                           model.log_likelihood,
                                           model.beta_gradient)
            alg = bc.BetaCoreset(jnp.asarray(X), prj, beta=0.4, opt_itrs=12,
                                 n_subsample_opt=16, n_subsample_select=20,
                                 seed=11)
            alg.build(4, 4)
            return alg.get()

        w_f, p_f, i_f, _ = run(smp)
        w_s, p_s, i_s, _ = run(slow)
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_s))
        np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w_s))
        np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_s))

    def test_predrawn_fast_path_mixed_dtypes(self, rng):
        """f32 prior hyperparameters with f64 data promote the per-step
        posterior draw to f64; the pre-drawn path must draw through the SAME
        sampler.draw_noise. (Real bug: the fast path drew f32 noise via a
        cached theta_dtype attribute while the per-step path drew f64 —
        silently forked streams, max |dw| = 2.09 on this config.)"""
        X, _, Siginv, logdetSig, model = _setup_gauss(rng, N=50, d=3)
        smp = gaussian_conjugate_sampler(jnp.zeros(3, jnp.float32),
                                         jnp.eye(3, dtype=jnp.float32),
                                         jnp.asarray(Siginv, dtype=jnp.float32))
        slow = lambda key, n, w, pts, aux: smp(key, n, w, pts, aux)

        def run(sampler):
            prj = bc.BetaBlackBoxProjector(sampler, 8, model.beta_likelihood,
                                           model.log_likelihood,
                                           model.beta_gradient)
            alg = bc.BetaCoreset(jnp.asarray(X), prj, beta=0.4, opt_itrs=12,
                                 n_subsample_opt=16, n_subsample_select=20,
                                 seed=11)
            alg.build(4, 4)
            return alg.get()

        w_f, p_f, i_f, _ = run(smp)
        w_s, p_s, i_s, _ = run(slow)
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_s))
        np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w_s))

    def test_joint_projection_routing_guard(self, rng, monkeypatch):
        """Projecting [subsample; coreset buffer] as one block must not
        change fused-kernel ROUTING: when the joint row count crosses the
        threshold but the separate calls would stay below it, the build
        must fall back to separate projections (else corevecs silently move
        onto the f32 kernel and near-tie selections can flip)."""
        from betacores_tpu.ops import pallas_kernels
        from betacores_tpu.ops.projection import center, project_beta

        monkeypatch.setattr(pallas_kernels, "maybe_fused", lambda n: n >= 30)
        X, _, Siginv, logdetSig, model = _setup_gauss(rng, N=60, d=3)
        kernel_rows = []

        def fake_beta(pts, th, b):
            kernel_rows.append(pts.shape[0])
            return center(model.beta_likelihood(pts, th, b))

        fmodel = model._replace(fused_beta_projection=fake_beta)
        # the patch routes a 36-row block to the 'kernel' when called directly
        project_beta(fmodel, jnp.asarray(X[:36]), jnp.asarray(X[:8]), 0.4)
        assert kernel_rows == [36]
        kernel_rows.clear()

        from betacores_tpu.coresets import (IncrementalConfig, init_state,
                                            make_incremental_builder)

        smp = gaussian_conjugate_sampler(jnp.zeros(3), jnp.eye(3),
                                         jnp.asarray(Siginv))
        # n_opt=16 + M_buf=20 = 36 and n_sel=20 + 20 = 40 cross the patched
        # threshold jointly; separately every block stays below it
        cfg = IncrementalConfig(projection_dim=8, n_subsample_select=20,
                                n_subsample_opt=16, opt_itrs=6, i0=0.5,
                                use_beta=True)
        builder = make_incremental_builder(jnp.asarray(X), fmodel, smp, cfg)
        st = builder.build(jax.random.key(3),
                           init_state(20, 3, beta=0.4, dtype=jnp.float64), 3)
        assert int(st.m) >= 1
        assert kernel_rows == [], f"joint blocks reached the kernel: {kernel_rows}"

    def test_build_guard_and_reset(self, rng):
        X, samples, _, _, model = _setup_gauss(rng)
        prj = bc.BlackBoxProjector(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                                   model.log_likelihood)
        alg = bc.SparseVICoreset(jnp.asarray(X), prj, opt_itrs=5, seed=0)
        alg.build(2, 2)
        with pytest.raises(ValueError):
            alg.build(5, 3)  # itrs + size > sz
        with pytest.raises(ValueError):
            alg.build(1, 0)  # shrink
        alg.reset()
        assert alg.size() == 0

    def test_warm_start(self, rng):
        X, samples, _, _, model = _setup_gauss(rng)
        prj = bc.BlackBoxProjector(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                                   model.log_likelihood)
        w0 = np.ones(3)
        i0 = np.arange(3)
        alg = bc.SparseVICoreset(jnp.asarray(X), prj, opt_itrs=5, seed=0,
                                 wts=w0, idcs=i0, pts=X[:3])
        assert alg.size() == 3
        alg.build(2, 5)
        assert alg.size() <= 5


class TestBPSVIGolden:
    def test_matches_oracle(self, rng):
        X, samples, Siginv, logdetSig, model = _setup_gauss(rng, N=30, d=3, S=6)
        sz, opt_itrs = 5, 30
        sched = lambda i: 0.3 / (1.0 + i)

        prj = bc.BlackBoxProjector(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                                   model.log_likelihood, model.grad_z_log_likelihood)
        alg = bc.BatchPSVICoreset(jnp.asarray(X), prj, opt_itrs=opt_itrs,
                                  step_sched=lambda m: sched, seed=7)
        alg.build(1, sz)
        w_got, p_got, i_got = alg.get()

        # oracle driven with the same init indices
        init_idcs = np.asarray(alg.state.idcs)[:sz]
        w_o, p_o = ocs.bpsvi_build_deterministic(
            X, init_idcs, opt_itrs, sched, lambda w, p: samples,
            lambda pts, s: om.gauss_log_likelihood(pts, s, Siginv, logdetSig),
            lambda pts, s: om.gauss_grad_x_log_likelihood(pts, s, Siginv),
        )
        keep = w_o > 0
        np.testing.assert_allclose(w_got, w_o[keep], rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(p_got, p_o[keep], rtol=1e-6, atol=1e-8)

    def test_batch_builds_match_individual(self, rng):
        from betacores_tpu.coresets import BPSVIConfig, bpsvi_build_batch, make_bpsvi_builder

        X, samples, _, _, model = _setup_gauss(rng, N=30, d=3, S=6)
        cfg = BPSVIConfig(projection_dim=6, opt_itrs=10, i0=0.3)
        builder = make_bpsvi_builder(jnp.asarray(X), model,
                                     fixed_sampler(jnp.asarray(samples)), cfg)
        aux0 = jnp.zeros(3)
        key = jax.random.key(5)
        sizes = [2, 4]
        wts_b, pts_b, idcs_b = bpsvi_build_batch(builder, key, sizes, 4, aux0)
        # lane i must equal a standalone masked build with the same key
        keys = jax.random.split(key, len(sizes))
        for lane, sz in enumerate(sizes):
            mask = jnp.arange(4) < sz
            w1, p1, i1 = builder(keys[lane], 4, aux0, mask)
            np.testing.assert_allclose(wts_b[lane], w1, rtol=1e-12)
            np.testing.assert_allclose(pts_b[lane], p1, rtol=1e-12)


class TestEndToEndGaussian:
    """SURVEY section 7 minimum slice: contaminated synthetic Gaussian,
    conjugate posterior, closed-form reverse KL."""

    @pytest.fixture(autouse=True)
    def setup(self, rng):
        N, d = 400, 4
        self.d = d
        self.mu0 = np.zeros(d)
        self.Sig0inv = np.eye(d)
        self.Sig = 5.0 * np.eye(d)
        self.Siginv = np.linalg.inv(self.Sig)
        self.logdetSig = np.linalg.slogdet(self.Sig)[1]
        X = rng.multivariate_normal(np.zeros(d), self.Sig, N)
        out1 = rng.multivariate_normal(np.zeros(d) + 20.0, 0.5 * self.Sig, N // 50)
        self.X = np.vstack([X, out1])
        self.Xclean = X
        # true posterior of the CLEAN data
        self.mup, self.Sigp = om.gauss_weighted_post(
            self.mu0, self.Sig0inv, self.Siginv, X, np.ones(N)
        )
        self.model = gmod.bundle(jnp.asarray(self.Siginv), self.logdetSig)
        self.sampler = gaussian_conjugate_sampler(
            jnp.asarray(self.mu0), jnp.asarray(self.Sig0inv), jnp.asarray(self.Siginv)
        )

    def _rkl(self, w, p):
        """reverse KL(coreset posterior || full clean posterior)"""
        muw, Sigw = om.gauss_weighted_post(self.mu0, self.Sig0inv, self.Siginv,
                                           np.atleast_2d(p), np.atleast_1d(w))
        return om.gaussian_KL(muw, Sigw, self.mup, np.linalg.inv(self.Sigp))

    def test_hilbert_giga_reduces_kl(self):
        prj = bc.BlackBoxProjector(self.sampler, 100, self.model.log_likelihood)
        alg = bc.HilbertCoreset(jnp.asarray(self.Xclean), prj, seed=3)
        kl_prior = self._rkl(np.zeros(1), np.zeros((1, self.d)))
        alg.build(30, 30)
        w, p, i = alg.get()
        kl = self._rkl(w, p)
        assert kl < 0.1 * kl_prior, f"GIGA KL {kl} vs prior {kl_prior}"

    def test_sparsevi_reduces_kl(self):
        prj = bc.BlackBoxProjector(self.sampler, 50, self.model.log_likelihood)
        alg = bc.SparseVICoreset(jnp.asarray(self.Xclean), prj, opt_itrs=60, seed=4,
                                 step_sched=lambda i: 1.0 / (1.0 + i))
        kl_prior = self._rkl(np.zeros(1), np.zeros((1, self.d)))
        for m in range(1, 11):
            alg.build(1, m)
        w, p, i = alg.get()
        kl = self._rkl(w, p)
        assert kl < 0.2 * kl_prior, f"SparseVI KL {kl} vs prior {kl_prior}"

    def test_bcores_robust_to_outliers(self):
        """On contaminated data, the beta-coreset posterior should stay much
        closer to the clean posterior than a Hilbert coreset built on the
        contaminated set (the WSDM'21 robustness claim, reference fig. 1)."""
        Xc = jnp.asarray(self.X)
        bprj = bc.BetaBlackBoxProjector(self.sampler, 50, self.model.beta_likelihood,
                                        self.model.log_likelihood, self.model.beta_gradient)
        alg = bc.BetaCoreset(Xc, bprj, beta=0.3, learn_beta=False, opt_itrs=60,
                             seed=5, step_sched=lambda i: 1.0 / (1.0 + i))
        for m in range(1, 11):
            alg.build(1, m)
        w, p, i, beta = alg.get()
        kl_bcores = self._rkl(w, p)

        prj = bc.BlackBoxProjector(self.sampler, 50, self.model.log_likelihood)
        giga = bc.HilbertCoreset(Xc, prj, seed=6)
        giga.build(10, 10)
        wg, pg, ig = giga.get()
        kl_giga = self._rkl(wg, pg)
        assert kl_bcores < kl_giga, (kl_bcores, kl_giga)

    def test_uniform_sampling_coreset(self):
        alg = bc.UniformSamplingCoreset(jnp.asarray(self.Xclean), seed=8)
        for m in range(1, 21):
            alg.build(1, m)
        w, p, i = alg.get()
        assert w.sum() == pytest.approx(self.Xclean.shape[0])
        kl_prior = self._rkl(np.zeros(1), np.zeros((1, self.d)))
        assert self._rkl(w, p) < kl_prior


class TestPSVI:
    def test_incremental_pseudo_coreset(self, rng):
        from betacores_tpu.coresets import PseudoSparseVICoreset

        X, samples, Siginv, logdetSig, model = _setup_gauss(rng, N=50, d=3, S=8)
        prj = bc.BlackBoxProjector(fixed_sampler(jnp.asarray(samples)), samples.shape[0],
                                   model.log_likelihood, model.grad_z_log_likelihood)
        alg = PseudoSparseVICoreset(jnp.asarray(X), prj, opt_itrs=20, seed=0, max_size=16)
        alg.build(4, 4)
        w, p, i = alg.get()
        # growth must not be blocked: regression guard for an over-strict
        # take-new comparison that pinned m at 1. (Repeat argmax wins
        # legitimately no-op an iteration — reference semantics — so m can
        # be < itrs, but must exceed 1 on this well-separated problem.)
        assert 2 <= len(w) <= 4 and (w >= 0).all()
        assert len(set(np.asarray(i).tolist())) == len(w)
        # pseudo-points should have moved off their initializing data rows
        moved = np.linalg.norm(p - X[i], axis=1)
        assert (moved > 1e-8).any()


class TestBuildTrace:
    def test_trace_matches_one_shot_build(self, rng):
        X, samples, Siginv, logdetSig, model = _setup_gauss(rng, N=60, d=3, S=8)
        prj = bc.BlackBoxProjector(fixed_sampler(jnp.asarray(samples)),
                                   samples.shape[0], model.log_likelihood)
        a1 = bc.SparseVICoreset(jnp.asarray(X), prj, opt_itrs=10, seed=0, max_size=16)
        a2 = bc.SparseVICoreset(jnp.asarray(X), prj, opt_itrs=10, seed=0, max_size=16)
        trace = a1.build_trace(5)
        a2.build(5, 5)  # same KeySequence position: identical key stream
        w2, p2, i2 = a2.get()
        wl, pl, il, _ = trace[-1]
        np.testing.assert_allclose(wl, w2, rtol=1e-10)
        np.testing.assert_array_equal(il, i2)
        assert len(trace) == 5
        # per-iteration sizes are non-decreasing and <= m
        for m, (wm, pm, im, _) in enumerate(trace, start=1):
            assert 1 <= len(wm) <= m


class TestRefine:
    def test_quasi_newton_polish_tightens_kl(self, rng):
        """Post-build deterministic weight refinement (arXiv:2203.09675)
        should not hurt — and typically tightens — posterior KL at fixed
        support."""
        d, N = 4, 400
        Sig = 2.0 * np.eye(d)
        Siginv = jnp.asarray(np.linalg.inv(Sig))
        ld = float(np.linalg.slogdet(Sig)[1])
        X = jnp.asarray(rng.normal(size=(N, d)))
        model = gmod.bundle(Siginv, ld)
        sampler = gaussian_conjugate_sampler(jnp.zeros(d), jnp.eye(d), Siginv)
        prj = bc.BlackBoxProjector(sampler, 32, model.log_likelihood)
        alg = bc.SparseVICoreset(X, prj, opt_itrs=30, n_subsample_opt=128,
                                 seed=0, max_size=16)
        alg.build(8, 8)

        mu0, Sig0inv = np.zeros(d), np.eye(d)
        mup, Sigp = om.gauss_weighted_post(mu0, Sig0inv, np.asarray(Siginv),
                                           np.asarray(X), np.ones(N))

        def rkl(w, p):
            m, S = om.gauss_weighted_post(mu0, Sig0inv, np.asarray(Siginv),
                                          np.atleast_2d(p), np.atleast_1d(w))
            return om.gaussian_KL(m, S, mup, np.linalg.inv(Sigp))

        w0, p0, i0 = alg.get()
        kl_before = rkl(w0, p0)
        alg.refine(n_samples=512)
        w1, p1, i1 = alg.get()
        kl_after = rkl(w1, p1)
        np.testing.assert_array_equal(i0, i1)  # support unchanged
        assert (w1 >= 0).all()
        assert kl_after <= kl_before * 1.05, (kl_before, kl_after)


def test_uniform_sampling_keeps_warm_start(rng):
    """Constructor warm-start points must survive builds (reference
    sampling.py seeds its counts from them), including EXTERNAL points with
    sentinel indices (neural-linear driver pattern)."""
    X = jnp.asarray(rng.normal(size=(50, 3)))
    wpts = rng.normal(size=(4, 3)) + 10.0
    alg = bc.UniformSamplingCoreset(X, seed=0, wts=np.ones(4),
                                    idcs=10_000_000 + np.arange(4), pts=wpts)
    alg.build(5, 9)
    w, p, i = alg.get()
    assert alg.size() >= 5
    kept = set(np.asarray(i).tolist())
    assert {10_000_000 + k for k in range(4)} <= kept
    for k in range(4):
        row = p[np.asarray(i) == 10_000_000 + k][0]
        np.testing.assert_allclose(row, wpts[k], rtol=1e-6)


class TestSelectBeta:
    """External robust selection of beta (coresets/select_beta.py): the
    in-build tangent residual cannot identify the clean-posterior optimum
    (RESULTS.md learn_beta validation), so beta is chosen by trimmed
    held-out predictive log-likelihood over a build grid."""

    def test_trimmed_mean_drops_lower_tail_only(self):
        x = jnp.asarray([-100.0, -50.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
        # trim=0.2 drops exactly the two contaminated values
        got = float(bc.trimmed_mean(x, 0.2))
        assert got == pytest.approx(np.mean([1, 2, 3, 4, 5, 6, 7, 8.0]))
        # trim=0 is the plain mean; trim is clipped at 0.5
        assert float(bc.trimmed_mean(x, 0.0)) == pytest.approx(float(x.mean()))
        assert float(bc.trimmed_mean(x, 0.9)) == pytest.approx(
            float(jnp.sort(x)[5:].mean()))

    def test_select_beta_picks_trimmed_argmax(self):
        """With per-point scores whose plain mean and trimmed mean disagree,
        the selector must follow the TRIMMED mean (the contamination-robust
        criterion), and report one score per candidate."""
        betas = [0.1, 0.5, 0.9]
        # beta=0.1: great mean, poisoned tail after trimming is mediocre.
        # beta=0.5: best trimmed mean. beta=0.9: worst everywhere.
        per_beta = {
            0.1: np.array([10.0] * 2 + [0.0] * 8),   # mean 2.0, trim20 -> 1.25 avg of top8? no:
            0.5: np.array([-50.0] * 2 + [3.0] * 8),  # mean -9.7, trim20 -> 3.0
            0.9: np.array([-1.0] * 10),              # trim20 -> -1.0
        }
        built = []
        def build_fn(b):
            built.append(b)
            return np.full(3, b), np.zeros((3, 2))
        def score_fn(w, p):
            return per_beta[float(w[0])]
        best, scores = bc.select_beta(build_fn, betas, score_fn, trim=0.2)
        assert built == betas  # one build per candidate
        assert scores.shape == (3,)
        # trimmed means: 0.1 -> mean of sorted[2:] = (10+10+0*6)/8 = 2.5,
        # 0.5 -> 3.0, 0.9 -> -1.0  => argmax at beta=0.5
        assert best == 0.5
        assert scores[1] == pytest.approx(3.0)

    def test_select_beta_end_to_end_prefers_robust_beta(self, rng):
        """Contaminated gaussian: score each beta-coreset posterior by
        trimmed held-out predictive ll. Large beta (robust) must beat the
        near-KL limit beta -> 0, matching the reverse-KL ranking."""
        d, N, M = 2, 300, 12
        mu_true = np.zeros(d)
        Xc_clean = rng.normal(size=(N, d)) + mu_true
        X_out = rng.normal(size=(N // 10, d)) * 0.3 + 8.0   # shifted cluster
        X = np.concatenate([Xc_clean, X_out]).astype(np.float32)
        X_val = np.concatenate([rng.normal(size=(80, d)) + mu_true,
                                rng.normal(size=(20, d)) * 0.3 + 8.0]).astype(np.float32)
        Siginv = jnp.eye(d)
        mu0, Sig0inv = jnp.zeros(d), jnp.eye(d)
        model = gmod.bundle(Siginv, 0.0)
        sampler = gaussian_conjugate_sampler(mu0, Sig0inv, Siginv)
        prj = bc.BetaBlackBoxProjector(sampler, 64, model.beta_likelihood,
                                       model.log_likelihood, model.beta_gradient)

        def build_fn(b):
            alg = bc.BetaCoreset(jnp.asarray(X), prj, beta=b, learn_beta=False,
                                 opt_itrs=60, seed=3, max_size=M)
            alg.build(M, M)
            w, p = alg.get()[:2]
            return w, p

        def score_fn(w, p):
            post = gmod.weighted_post(mu0, Sig0inv, Siginv, jnp.asarray(p),
                                      jnp.asarray(w))
            # predictive ll per held-out point under N(mu_post, Sig + Sig_post)
            cov = jnp.linalg.inv(Siginv) + post.cov
            dx = jnp.asarray(X_val) - post.mu
            quad = jnp.einsum('nd,dk,nk->n', dx, jnp.linalg.inv(cov), dx)
            return -0.5 * (quad + jnp.linalg.slogdet(cov)[1]
                           + d * jnp.log(2 * jnp.pi))

        best, scores = bc.select_beta(build_fn, [0.01, 0.7], score_fn, trim=0.25)
        assert np.all(np.isfinite(scores))
        assert best == 0.7, scores


def test_lagged_refit_quality_and_determinism(rng):
    """IncrementalConfig.refit_every (lagged Newton-Laplace refits, beyond
    reference): deterministic under a fixed key, same selection count, and
    the tangent-space error matches the every-step build closely; samplers
    without a fit/from_fit split silently ignore the knob."""
    import jax

    from betacores_tpu.coresets import (IncrementalConfig, init_state,
                                        make_incremental_builder)
    from betacores_tpu.data import gen_synthetic_logreg
    from betacores_tpu.inference import logreg_laplace_sampler
    from betacores_tpu.models import logreg

    k0 = jax.random.key(0)
    _, _, Z = gen_synthetic_logreg(k0, 300, d=4, dtype=jnp.float32)
    model, smp = logreg.bundle(), logreg_laplace_sampler()
    st0 = init_state(12, Z.shape[1], beta=0.5, dtype=Z.dtype)
    res = {}
    for k in (1, 4):
        cfg = IncrementalConfig(projection_dim=16, n_subsample_select=60,
                                n_subsample_opt=40, opt_itrs=25, i0=1.0,
                                use_beta=True, refit_every=k)
        b = make_incremental_builder(Z, model, smp, cfg)
        st = b.build(jax.random.key(7), st0, 6)
        st_again = b.build(jax.random.key(7), st0, 6)
        np.testing.assert_array_equal(np.asarray(st.wts), np.asarray(st_again.wts))
        err = float(b.error(jax.random.key(3), st, None))
        res[k] = (int(st.m), err)
    assert res[4][0] == res[1][0]
    assert res[4][1] < 2.0 * res[1][1] + 1e-6, res
    # knob is inert for samplers without the fit split (fixed projector)
    from betacores_tpu.inference import fixed_sampler as fs
    samples = jnp.asarray(np.asarray(rng.normal(size=(16, 4))), dtype=Z.dtype)
    cfg = IncrementalConfig(projection_dim=16, n_subsample_select=60,
                            n_subsample_opt=40, opt_itrs=10, i0=1.0,
                            use_beta=True, refit_every=3)
    b = make_incremental_builder(Z, logreg.bundle(), fs(samples), cfg)
    st = b.build(jax.random.key(1), st0, 4)
    assert int(st.m) >= 1
    with pytest.raises(ValueError):
        IncrementalConfig(refit_every=0)


def test_build_trace_preserves_external_warm_points(rng):
    """Regression (round-3 review): warm-start slots with EXTERNAL sentinel
    indices (neural-linear pattern, 1e7+i) must report their stored
    coordinates in every build_trace snapshot — a clamp-gather would
    silently return data[N-1] for them."""
    from betacores_tpu.inference import gaussian_conjugate_sampler
    from betacores_tpu.models import gaussian as gmod

    d = 3
    X = jnp.asarray(rng.normal(size=(40, d)))
    Sig = np.eye(d)
    model = gmod.bundle(jnp.asarray(Sig), 0.0)
    smp = gaussian_conjugate_sampler(jnp.zeros(d), jnp.eye(d), jnp.asarray(Sig))
    prj = bc.BlackBoxProjector(smp, 8, model.log_likelihood, model=model)
    wpts = np.asarray(rng.normal(size=(3, d)) + 25.0)
    alg = bc.SparseVICoreset(X, prj, opt_itrs=5, seed=1, max_size=10,
                             n_subsample_select=20, n_subsample_opt=12,
                             wts=np.ones(3),
                             idcs=10_000_000 + np.arange(3), pts=wpts)
    trace = alg.build_trace(3)
    assert len(trace) == 3
    for w, p, i, _ in trace:
        for k in range(3):
            sel = np.asarray(i) == 10_000_000 + k
            if sel.any():
                np.testing.assert_allclose(p[sel][0], wpts[k], rtol=1e-6)
        # real selections still come from data
        real = (np.asarray(i) >= 0) & (np.asarray(i) < 40)
        for idx, row in zip(np.asarray(i)[real], p[real]):
            np.testing.assert_allclose(row, np.asarray(X)[int(idx)], rtol=1e-6)


def test_uniform_build_trace_includes_warm_prefix(rng):
    """Regression (round-3 review): UniformSamplingCoreset.build_trace must
    reproduce the build(1,m);get() loop INCLUDING the constructor warm
    prefix (count-1, external coordinates)."""
    X = jnp.asarray(rng.normal(size=(30, 3)))
    wpts = np.asarray(rng.normal(size=(2, 3)) + 9.0)
    mk = lambda: bc.UniformSamplingCoreset(
        X, seed=4, wts=np.ones(2), idcs=10_000_000 + np.arange(2), pts=wpts)
    a1, a2 = mk(), mk()
    trace = a1.build_trace(4)
    for m, (wt, pt, it) in enumerate(trace, start=1):
        a2.build(1, m + 2)
        w2, p2, i2 = a2.get()
        m1 = {int(i): float(w) for i, w in zip(it, wt)}
        m2 = {int(i): float(w) for i, w in zip(i2, w2)}
        assert m1 == pytest.approx(m2), (m, m1, m2)
        assert {10_000_000, 10_000_001} <= set(m1)
        for k in range(2):
            row = pt[np.asarray(it) == 10_000_000 + k][0]
            np.testing.assert_allclose(row, wpts[k], rtol=1e-6)


def test_refine_reuses_compiled_program(rng):
    """Regression (round-3 review): refine() must reuse one jitted program
    across calls — a fresh jax.jit wrapper per call recompiles every time
    (tens of seconds each through the TPU tunnel)."""
    from betacores_tpu.coresets import refine as refine_mod

    d = 3
    X = jnp.asarray(rng.normal(size=(40, d)))
    model = gmod.bundle(jnp.eye(d), 0.0)
    smp = gaussian_conjugate_sampler(jnp.zeros(d), jnp.eye(d), jnp.eye(d))
    from betacores_tpu.coresets import init_state
    st = init_state(8, d, dtype=jnp.float64)
    st = st._replace(wts=st.wts.at[:3].set(1.0),
                     idcs=st.idcs.at[:3].set(jnp.arange(3, dtype=jnp.int32)),
                     pts=st.pts.at[:3].set(X[:3]),
                     m=jnp.asarray(3, dtype=jnp.int32))
    refine_mod._cached_refine.cache_clear()
    st1 = refine_mod.refine_weights(jax.random.key(0), X, model, smp, st,
                                    n_samples=16, nnls_iters=30)
    st2 = refine_mod.refine_weights(jax.random.key(1), X, model, smp, st1,
                                    n_samples=16, nnls_iters=30)
    info = refine_mod._cached_refine.cache_info()
    assert info.misses == 1 and info.hits == 1, info
    assert np.isfinite(np.asarray(st2.wts)).all()


def test_uniform_draws_follow_jax_prng_discipline(rng):
    """VERDICT r2 weak #7: UniformSamplingCoreset draws now come from the
    explicit-JAX-PRNG stream (utils/prng discipline) — the pure
    counter-indexed draw functions replay the eager class's sequence
    bit-for-bit under jit (batched or one-at-a-time), and weighted draws
    are compacted to the positive support (u==0 structurally excluded)."""
    from betacores_tpu.coresets.api import (uniform_coreset_draws,
                                            weighted_coreset_draws)

    X = jnp.asarray(rng.normal(size=(50, 3)))
    a = bc.UniformSamplingCoreset(X, seed=7)
    eager = np.concatenate([a._draw_points(3), a._draw_points(2)])
    jfn = jax.jit(lambda k: uniform_coreset_draws(k, 5, X.shape[0]))
    np.testing.assert_array_equal(eager, np.asarray(jfn(a._draw_key)))

    u = np.ones(50)
    u[::2] = 0.0
    aw = bc.UniformSamplingCoreset(X, seed=9, data_weights=jnp.asarray(u))
    dw = aw._draw_points(64)
    assert set(int(i) for i in dw) <= set(np.flatnonzero(u).tolist())
    jw = jax.jit(lambda k, c: weighted_coreset_draws(k, 64, cdf=c))
    np.testing.assert_array_equal(
        dw, aw._u_pos[np.asarray(jw(aw._draw_key, aw._u_cdf_dev))])
    # reset() rewinds the draw counter: a reset instance replays the same
    # stream as a fresh one (round-3 advisor)
    a.reset()
    np.testing.assert_array_equal(eager, a._draw_points(5))


class TestDedupSelect:
    """dedup_select=True: already-selected indices are masked out of the
    candidate argmax and every select step installs the best remaining
    candidate — the opt-in fill-the-budget mode (default stays
    reference-parity with bcores.py:84's silent duplicate drop)."""

    def test_dedup_build_matches_oracle(self, rng):
        X, samples, Siginv, logdetSig, model = _setup_gauss(rng)
        beta = 0.4
        M, opt_itrs = 8, 25
        sched = lambda i: 0.5 / (1.0 + i)
        prj = bc.BetaBlackBoxProjector(fixed_sampler(jnp.asarray(samples)),
                                       samples.shape[0], model.beta_likelihood,
                                       model.log_likelihood, model.beta_gradient)
        alg = bc.BetaCoreset(jnp.asarray(X), prj, beta=beta, learn_beta=False,
                             opt_itrs=opt_itrs, step_sched=sched, seed=1,
                             dedup_select=True)
        for m in range(1, M + 1):
            alg.build(1, m)
        w_got, p_got, i_got = alg.get()[:3]
        # every step added: the full budget is filled with distinct indices
        assert len(i_got) == M == len(set(int(i) for i in i_got))

        lik = lambda pts, s: om.gauss_beta_likelihood(pts, s, beta, Siginv)
        w_o, i_o, p_o = ocs.incremental_build_deterministic(
            X, M, opt_itrs, sched, lambda w, p: samples, lik, dedup=True)
        assert len(i_o) == M
        keep = w_o > 0
        np.testing.assert_array_equal(np.sort(i_got), np.sort(i_o[keep]))
        order_g, order_o = np.argsort(i_got), np.argsort(i_o[keep])
        np.testing.assert_allclose(w_got[order_g], w_o[keep][order_o],
                                   rtol=1e-6, atol=1e-9)

    def test_dedup_fills_budget_under_subsampled_select(self, rng):
        """The round-4 headline bench delivered 94/100 points under parity
        semantics; with a tiny candidate pool duplicate argmaxes are near-
        certain, and dedup must still fill min(M, N) distinct slots."""
        X, samples, Siginv, logdetSig, model = _setup_gauss(rng, N=60)
        prj = bc.BetaBlackBoxProjector(fixed_sampler(jnp.asarray(samples)),
                                       samples.shape[0], model.beta_likelihood,
                                       model.log_likelihood, model.beta_gradient)
        # ratios chosen so every 30-row subsample (with replacement) contains
        # a fresh candidate with probability 1 - (19/60)^30 ~ 1 - 1e-15: the
        # fill guarantee is per-step-conditional on a fresh candidate being
        # visible, which the headline config (N=1M, n_sub=1000) satisfies
        # overwhelmingly; an adversarial N=12/n_sub=6 ratio can still skip
        M = 20
        alg = bc.BetaCoreset(jnp.asarray(X), prj, beta=0.4, opt_itrs=10,
                             n_subsample_select=30, seed=3, dedup_select=True)
        for m in range(1, M + 1):
            alg.build(1, m)
        # fill rate is measured on INSTALLED slots (state.m), not get():
        # get() additionally drops slots whose weight refined to zero
        m_got = int(alg.state.m)
        filled = np.asarray(alg.state.idcs)[:m_got]
        assert m_got == M == len(set(filled.tolist()))

    def test_dedup_never_exceeds_n_distinct(self, rng):
        """Budget larger than the dataset: dedup stops at N distinct points
        instead of erroring or re-adding."""
        X, samples, Siginv, logdetSig, model = _setup_gauss(rng, N=5)
        prj = bc.BlackBoxProjector(fixed_sampler(jnp.asarray(samples)),
                                   samples.shape[0], model.log_likelihood)
        alg = bc.SparseVICoreset(jnp.asarray(X), prj, opt_itrs=10, seed=0,
                                 dedup_select=True, max_size=16)
        for m in range(1, 9):
            alg.build(1, m)
        i_got = alg.get()[2]
        assert len(i_got) == 5 == len(set(int(i) for i in i_got))
