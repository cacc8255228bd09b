#!/usr/bin/env python3
"""Poisson-regression coreset experiment on count data.

The reference ships Poisson support only as a Stan program + datasets
(stan_code.py:22-42; synth_poiss / biketrips / airportdelays npz) with no
runnable driver. This driver completes the family: load a count dataset,
inject gross count corruption at rate ``--f-rate`` (the Poisson analogue of
the logreg label flips), build {BCORES, SVI, RAND, PRIOR} coresets with the
Fisher-scoring Laplace sampler, and evaluate each size's weighted posterior
by test-set predictive log-likelihood.

Usage: python3 examples/poisson_regression.py --alg BCORES --dataset biketrips
"""

import argparse
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import betacores_tpu as bc
from betacores_tpu.data import gen_synthetic_poisson
from betacores_tpu.data.loaders import load_npz, reference_dataset_path
from betacores_tpu.inference import poisson_laplace_sampler
from betacores_tpu.models import poisson

ALGS = ["BCORES", "SVI", "RAND", "PRIOR"]


def load_dataset(name: str, trial: int):
    path = reference_dataset_path(name)
    if path is not None:
        data = np.load(path, allow_pickle=True)
        X, y = np.asarray(data["X"], float), np.asarray(data["y"], float).reshape(-1)
        Xt, yt = np.asarray(data["Xt"], float), np.asarray(data["yt"], float).reshape(-1)
        # standardize features, append intercept (reference preproc pattern)
        mu, sd = X.mean(0), X.std(0) + 1e-8
        X, Xt = (X - mu) / sd, (Xt - mu) / sd
        X = np.c_[X, np.ones(len(X))]
        Xt = np.c_[Xt, np.ones(len(Xt))]
        return (a.astype(np.float32) for a in (X, y, Xt, yt))
    k1, k2 = jax.random.split(jax.random.key(trial + 3))
    X, y, _, _ = gen_synthetic_poisson(k1, N=2000, d=6)
    Xt, yt, _, _ = gen_synthetic_poisson(k2, N=400, d=6)
    return np.asarray(X), np.asarray(y), np.asarray(Xt), np.asarray(yt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alg", choices=ALGS, default="BCORES")
    ap.add_argument("--dataset", default="biketrips")
    ap.add_argument("--trial", type=int, default=1)
    ap.add_argument("--f-rate", type=float, default=0.1)
    ap.add_argument("--corrupt-shift", type=float, default=50.0)
    ap.add_argument("--M", type=int, default=50)
    ap.add_argument("--proj-dim", type=int, default=100)
    ap.add_argument("--opt-itrs", type=int, default=300)
    ap.add_argument("--n-subsample-opt", type=int, default=200)
    ap.add_argument("--n-subsample-select", type=int, default=500)
    ap.add_argument("--beta", type=float, default=0.3)
    ap.add_argument("--select-beta", action="store_true",
                    help="pick beta by the contamination-robust trimmed "
                         "held-out predictive criterion "
                         "(coresets/select_beta.py) over --beta-grid before "
                         "the reported build (BCORES only)")
    ap.add_argument("--beta-grid", default="0.01,0.05,0.1,0.2,0.3,0.5,0.7,1.0")
    ap.add_argument("--select-trim", type=float, default=0.2,
                    help="fraction of lowest held-out scores to drop; choose "
                         ">= the suspected contamination rate")
    ap.add_argument("--select-M", type=int, default=0,
                    help="coreset size for the selection builds (0 = --M)")
    ap.add_argument("--i0", type=float, default=1.0)
    ap.add_argument("--refit-every", type=int, default=1,
                    help="lagged Fisher-scoring refits in the Adam loop "
                         "(1 = every-step parity; see RESULTS.md)")
    ap.add_argument("--dedup-select", action="store_true",
                    help="mask already-selected indices out of the candidate "
                         "argmax so every selection adds a distinct point "
                         "(default: reference-parity duplicate drop, which "
                         "under-fills under subsampled select — RESULTS.md "
                         "'Dedup-masked select')")
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--eval", choices=["laplace", "hmc", "nuts"], default="laplace",
                    help="posterior for the predictive eval: Fisher-scoring "
                         "Laplace (fast) or multi-chain HMC on the weighted "
                         "Poisson posterior with R-hat/ESS checks (the "
                         "reference's Stan-program analog)")
    ap.add_argument("--mcmc-samples", type=int, default=1000)
    ap.add_argument("--mcmc-warmup", type=int, default=1000)
    ap.add_argument("--mcmc-chains", type=int, default=2)
    ap.add_argument("--results-dir", default="results")
    args = ap.parse_args()

    X, y, Xt, yt = load_dataset(args.dataset, args.trial)
    rng = np.random.default_rng(args.trial)
    n_bad = int(args.f_rate * len(y))
    bad = rng.choice(len(y), size=n_bad, replace=False)
    y = np.asarray(y, dtype=np.float32).copy()
    y[bad] += args.corrupt_shift  # gross count corruption
    Z = jnp.asarray(np.c_[X, y], dtype=jnp.float32)
    Zt = jnp.asarray(np.c_[Xt, yt], dtype=jnp.float32)
    d = X.shape[1]
    print(f"dataset {args.dataset}: N={len(y)} d={d}, corrupted {n_bad}")

    # Gaussian-approx mass term: count datasets run rates >> 10 where an
    # exact 0..max(y) grid would dominate the projection cost
    model = poisson.bundle(gaussian_mass=float(np.max(y)) > 30.0,
                           k_max=int(min(np.max(y) * 2 + 20, 128)))
    sampler = poisson_laplace_sampler()
    sched = lambda i: args.i0 / (1.0 + i)
    common = dict(opt_itrs=args.opt_itrs, n_subsample_opt=args.n_subsample_opt,
                  n_subsample_select=args.n_subsample_select, step_sched=sched,
                  seed=args.trial, max_size=args.M,
                  refit_every=args.refit_every, dedup_select=args.dedup_select)
    prj_b = bc.BetaBlackBoxProjector(sampler, args.proj_dim, theta_dim=d,
                                     model=model)
    prj = bc.BlackBoxProjector(sampler, args.proj_dim, theta_dim=d,
                               model=model)
    algs = {
        "BCORES": lambda: bc.BetaCoreset(Z, prj_b, beta=args.beta, learn_beta=False, **common),
        "SVI": lambda: bc.SparseVICoreset(Z, prj, **common),
        "RAND": lambda: bc.UniformSamplingCoreset(Z, seed=args.trial),
        "PRIOR": lambda: None,
    }

    select_record = None
    if args.select_beta:
        if args.alg != "BCORES":
            raise SystemExit("--select-beta only applies to BCORES")
        from betacores_tpu.coresets.select_beta import (driver_select_beta,
                                                        padded_scorer)

        # hold out a slice of the CORRUPTED training rows — the trimmed
        # criterion needs no clean/dirty labels; builds use the rest
        n_ho = min(2000, max(1, Z.shape[0] // 6))
        Zho, Zbuild = Z[-n_ho:], Z[: Z.shape[0] - n_ho]
        M_sel = args.select_M or args.M
        alg_sel = bc.BetaCoreset(Zbuild, prj_b, beta=args.beta,
                                 learn_beta=False, **common)
        k_score = jax.random.key(args.trial * 31 + 5)
        S_score = 256

        @jax.jit
        def _pred_ll(wm, pm, zho):
            # per-point held-out predictive log-lik under the coreset's
            # Fisher-scoring Laplace posterior (zho is a jit ARGUMENT)
            samples, _ = sampler(k_score, S_score, wm, pm,
                                 jnp.zeros(d, dtype=jnp.float32))
            ll = model.log_likelihood(zho, samples)
            return (jax.scipy.special.logsumexp(ll, axis=1)
                    - jnp.log(float(S_score)))

        score_fn = padded_scorer(args.M, d + 1,
                                 lambda wp, pp: _pred_ll(wp, pp, Zho))
        grid = [float(b) for b in args.beta_grid.split(",")]
        best_beta, select_record, _ = driver_select_beta(
            alg_sel, grid, score_fn, args.select_trim, M_sel)
        print("select-beta grid: " + "  ".join(
            f"{b:g}:{s:.4f}" for b, s in zip(grid, select_record["scores"])))
        print(f"selected beta = {best_beta:g} "
              f"[{select_record['select_time_s']:.1f}s for {len(grid)} builds]")
        args.beta = best_beta

    alg = algs[args.alg]()

    t0 = time.perf_counter()
    w = [np.zeros(1)]
    p = [np.zeros((1, d + 1), dtype=np.float32)]
    if args.alg == "PRIOR":
        for m in range(1, args.M + 1):
            w.append(np.zeros(1))
            p.append(np.zeros((1, d + 1), dtype=np.float32))
    elif args.alg == "RAND":
        # one host-RNG pass + one device gather (build_trace), not M
        # per-size round trips — each trip is one more chance for a
        # transient tunnel FailedPrecondition to kill the sweep
        for wm, pm, im in alg.build_trace(args.M):
            w.append(wm)
            p.append(pm)
    else:
        for wm, pm, im, bm in alg.build_trace(args.M):
            w.append(wm)
            p.append(pm)
    build_time = time.perf_counter() - t0
    print(f"build: {build_time:.1f}s")

    # evaluation: Laplace posterior of each size's weighted coreset ->
    # test predictive log-likelihood (static shapes: zero-weight padded)
    # always evaluate the final size; never skip it when eval_every does
    # not divide M (round-3 review; multiclass.py carried this fix already)
    eval_ms = sorted(set(range(0, args.M + 1, args.eval_every)) | {args.M})
    cap = max(len(np.atleast_1d(w[m])) for m in eval_ms)

    @jax.jit
    def eval_fn(key, wm, pm, zt):
        # zt is a jit ARGUMENT (CLAUDE.md: never close a jitted fn over a
        # dataset — round-3 review)
        samples, _ = sampler(key, 256, wm, pm, jnp.zeros(d, dtype=jnp.float32))
        return poisson.predictive_loglik(zt, samples)

    use_mcmc = args.eval in ("hmc", "nuts")  # args.eval itself stays intact:
    # downstream labels/pickles key on it (round-4 advisor finding)
    if use_mcmc:
        from betacores_tpu.inference import (HMCConfig, default_nuts_config,
                                             run_chains_weighted_poisson,
                                             run_with_escalation)
        from betacores_tpu.inference.nuts import make_weighted_nuts
        from betacores_tpu.models import poisson as _poisson_model

        # dynamic-trajectory NUTS (the reference's Stan sampler family;
        # inference/nuts.py) over the same weighted Poisson target — the
        # primary when --eval nuts, the escalation target when --eval hmc
        # fails its split-R-hat/ESS diagnostics (escalation.py)
        nuts_cfg = default_nuts_config(args.mcmc_samples, args.mcmc_warmup)
        run_poisson_nuts = make_weighted_nuts(_poisson_model.log_joint)
        if args.eval == "nuts":
            mcmc_cfg, run_eval_chains = nuts_cfg, run_poisson_nuts
        else:
            mcmc_cfg = HMCConfig(n_samples=args.mcmc_samples,
                                 n_warmup=args.mcmc_warmup, L_max=32)
            run_eval_chains = run_chains_weighted_poisson

    plls, diags, mcmc_times = {}, {}, {}
    for m in eval_ms:
        wm_c = np.atleast_1d(w[m]).astype(np.float32)
        pm_c = np.atleast_2d(p[m]).astype(np.float32)
        wm = jnp.asarray(np.pad(wm_c, (0, cap - len(wm_c))))
        pm = jnp.asarray(np.pad(pm_c, ((0, cap - len(wm_c)), (0, 0))))
        key_m = jax.random.key(args.trial * 100 + m)
        if use_mcmc:
            t1 = time.perf_counter()
            run = run_with_escalation(
                key_m, run_eval_chains, mcmc_cfg, run_poisson_nuts, nuts_cfg,
                pm, wm, jnp.zeros(d, dtype=jnp.float32), args.mcmc_chains,
                primary_name=args.eval)
            jax.block_until_ready(run.chains)
            mcmc_times[m] = time.perf_counter() - t1
            diags[m] = {k: np.asarray(v) for k, v in run.summary.items()}
            diags[m]["sampler_used"] = run.sampler_used
            diags[m]["escalated"] = run.escalated
            if "n_divergent" in run.stats:
                diags[m]["n_divergent"] = np.asarray(run.stats["n_divergent"])
            plls[m] = float(poisson.predictive_loglik(Zt, run.chains.reshape(-1, d)))
            flag = ("" if not run.escalated else
                    f"  ** {args.eval} failed ({run.failure_reason}); "
                    "recorded NUTS re-run")
            print(f"m={m:4d} pll={plls[m]:.4f} "
                  f"rhat={float(diags[m]['rhat'].max()):.3f} "
                  f"ess={float(diags[m]['ess'].min()):.0f} "
                  f"[{run.sampler_used}] ({mcmc_times[m]:.2f}s){flag}")
        else:
            plls[m] = float(eval_fn(key_m, wm, pm, Zt))
            print(f"m={m:4d} pll={plls[m]:.4f}")

    os.makedirs(args.results_dir, exist_ok=True)
    tag = f"{args.dataset}_{args.alg}_{args.trial}_{args.f_rate}_b{args.beta}"
    if args.dedup_select:
        tag += "_dedup"
    if args.eval != "laplace":
        # config-encoding filename: a NUTS-evaluated run must not overwrite
        # the HMC-evaluated one (observed in the round-5 on-chip session)
        tag += f"_{args.eval}"
    out = os.path.join(args.results_dir, f"results_poiss_{tag}.pk")
    with open(out, "wb") as fh:
        pickle.dump({"args": vars(args), "w": w, "p": p, "plls": plls,
                     "build_time_s": build_time, "mcmc_times": mcmc_times,
                     "mcmc_diagnostics": diags,
                     "select_beta": select_record}, fh)
    print(f"saved -> {out}")


if __name__ == "__main__":
    main()
