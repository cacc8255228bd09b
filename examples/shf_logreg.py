#!/usr/bin/env python3
"""Sparse Hamiltonian Flow vs HMC on Bayesian logistic regression.

Beyond-reference demo (arXiv:2203.05723): train a coreset-parameterized
normalizing flow against the full-data ELBO, then compare its i.i.d.
posterior samples against multi-chain HMC on the same data — predictive
accuracy, test log-likelihood, and amortized sampling cost. The flow's
selling points over MCMC: samples are i.i.d. (no autocorrelation, no
convergence checking), the density log q(theta) is tractable, and drawing
more samples is one cheap forward pass.

Usage: python3 examples/shf_logreg.py --N 20000 --train-steps 6000
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from betacores_tpu.data import gen_synthetic_logreg, perturb_logreg
from betacores_tpu.evaluation import compute_accuracy, predictive_loglik
from betacores_tpu.inference import (HMCConfig, SHFConfig, hmc,
                                     init_shf_params, make_shf_trainer,
                                     shf_sample, summarize_chains)
from betacores_tpu.models import logreg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=20000)
    ap.add_argument("--d", type=int, default=5)
    ap.add_argument("--trial", type=int, default=1)
    ap.add_argument("--f-rate", type=float, default=0.0,
                    help="corruption rate")
    ap.add_argument("--beta", type=float, default=None,
                    help="train against the robust beta-divergence objective "
                         "(beta_log_joint) instead of the standard ELBO — "
                         "use with --f-rate to see the flow resist "
                         "contamination")
    ap.add_argument("--M", type=int, default=30, help="flow coreset size")
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--leapfrog", type=int, default=8)
    ap.add_argument("--train-steps", type=int, default=6000)
    ap.add_argument("--chunk", type=int, default=2000,
                    help="train in chunks of this many steps (one compiled "
                         "program, re-invoked)")
    ap.add_argument("--n-samples", type=int, default=2000)
    args = ap.parse_args()

    k = jax.random.key(args.trial)
    k1, k2 = jax.random.split(k)
    X, Y, Z = gen_synthetic_logreg(k1, args.N, d=args.d)
    if args.f_rate > 0:
        X, Y, Z, _ = perturb_logreg(jax.random.fold_in(k, 5), X, Y, f_rate=args.f_rate)
    Xt, Yt, Zt = gen_synthetic_logreg(k2, 2000, d=args.d)
    print(f"N={args.N} d={args.d} f_rate={args.f_rate}")

    # --- flow: train + iid sample ---
    if args.beta is not None:
        from betacores_tpu.inference import beta_log_joint

        target = beta_log_joint(logreg.bundle(), args.beta)
        print(f"robust beta-divergence objective, beta={args.beta}")
    else:
        target = logreg.log_joint
    cfg = SHFConfig(n_blocks=args.blocks, n_leapfrog=args.leapfrog,
                    n_mc=8, n_batch=256, learning_rate=1e-2)
    params = init_shf_params(Z[: args.M],
                             args.d, args.N, cfg)
    train = make_shf_trainer(Z, target, cfg)
    t0 = time.perf_counter()
    n_chunks, rem = divmod(args.train_steps, args.chunk)
    for i in range(n_chunks):
        params, trace = train(jax.random.key(100 + i), params, args.chunk)
    if rem:
        params, trace = train(jax.random.key(100 + n_chunks), params, rem)
    jax.block_until_ready(params.w)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    th_f, _, logq = shf_sample(jax.random.key(7), params, target,
                               args.n_samples, cfg)
    th_f = jax.block_until_ready(th_f)
    t_flow_sample = time.perf_counter() - t0
    acc_f = float(compute_accuracy(Xt, Yt, th_f))
    pll_f = float(predictive_loglik(Zt, th_f))
    print(f"SHF : train {t_train:.1f}s ({args.train_steps} steps), "
          f"{args.n_samples} iid samples in {t_flow_sample:.2f}s; "
          f"acc={acc_f:.4f} pll={pll_f:.4f} "
          f"coreset nnz={int((np.asarray(params.w) > 0).sum())} "
          f"elbo_tail={float(np.asarray(trace)[-20:].mean()):.1f}")

    # --- HMC baseline on the full data (2 diagnosed chains; Z passed as a
    # jit argument — a closure would embed the dataset into the HLO) ---
    from betacores_tpu.inference import run_chains_weighted_logreg

    t0 = time.perf_counter()
    chains, stats = run_chains_weighted_logreg(
        jax.random.key(args.trial * 7), Z, jnp.ones(args.N),
        jnp.zeros(args.d), 2,
        HMCConfig(n_samples=args.n_samples // 2, n_warmup=1000, L_max=32))
    chains = jax.block_until_ready(chains)
    t_hmc = time.perf_counter() - t0
    th_h = chains.reshape(-1, args.d)
    summ = summarize_chains(chains)
    acc_h = float(compute_accuracy(Xt, Yt, th_h))
    pll_h = float(predictive_loglik(Zt, th_h))
    print(f"HMC : {th_h.shape[0]} samples in {t_hmc:.1f}s (warmup incl.); "
          f"acc={acc_h:.4f} pll={pll_h:.4f} "
          f"rhat={float(np.asarray(summ['rhat']).max()):.3f} "
          f"ess={float(np.asarray(summ['ess']).min()):.0f}")
    print(f"flow-vs-HMC posterior mean gap: "
          f"{float(jnp.linalg.norm(th_f.mean(0) - th_h.mean(0))):.4f}")


if __name__ == "__main__":
    main()
