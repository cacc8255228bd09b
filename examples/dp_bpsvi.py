#!/usr/bin/env python3
"""Differentially-private pseudo-coreset: privacy/utility tradeoff.

Driver surface for ``DiffPrivBatchPSVICoreset`` (the class the reference
exports at bayesiancoresets/coreset/__init__.py:6 but whose implementing
module was deleted from its tree — SURVEY.md section 0). Sweeps the Gaussian-
mechanism noise multiplier and reports, per privacy level, the RDP
(eps, delta)-bound of the released coreset and its reverse KL against the
exact (non-private) full-data conjugate posterior, next to the non-private
BPSVI build and the prior.

Usage: python3 examples/dp_bpsvi.py [--noise-grid 0.5,1,2,4] [--M 30] ...
"""

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trial", type=int, default=1)
    ap.add_argument("--N", type=int, default=5000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--M", type=int, default=30, help="pseudo-points")
    ap.add_argument("--proj-dim", type=int, default=100)
    ap.add_argument("--opt-itrs", type=int, default=300)
    ap.add_argument("--n-subsample-opt", type=int, default=500)
    ap.add_argument("--i0", type=float, default=1.0)
    ap.add_argument("--clip-norm", type=float, default=1.0)
    ap.add_argument("--delta", type=float, default=1e-5)
    ap.add_argument("--noise-grid", default="0.5,1.0,2.0,4.0")
    ap.add_argument("--sampling", choices=("poisson", "swr"), default="poisson",
                    help="poisson: subsampled-Gaussian RDP accounting "
                         "(amplification by subsampling); swr: round-3 "
                         "unamplified substitution accounting")
    ap.add_argument("--results-dir", default="results")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import betacores_tpu as bc
    from betacores_tpu.evaluation import reverse_forward_kl
    from betacores_tpu.inference import gaussian_conjugate_sampler
    from betacores_tpu.models import gaussian as gmod

    d, S = args.d, args.proj_dim
    rng = np.random.default_rng(args.trial)
    X = (rng.standard_normal((args.N, d)) + 1.0).astype(np.float32)

    Siginv, logdetSig = jnp.eye(d), 0.0
    mu0, Sig0inv = jnp.zeros(d), jnp.eye(d)
    model = gmod.bundle(Siginv, logdetSig)
    sampler = gaussian_conjugate_sampler(mu0, Sig0inv, Siginv)
    post_full = gmod.weighted_post(mu0, Sig0inv, Siginv, jnp.asarray(X),
                                   jnp.ones(args.N))

    def rkl_of(w, p):
        post = gmod.weighted_post(mu0, Sig0inv, Siginv,
                                  jnp.atleast_2d(jnp.asarray(np.asarray(p))),
                                  jnp.atleast_1d(jnp.asarray(np.asarray(w))))
        return float(reverse_forward_kl(post, post_full)[0])

    sched = lambda m: (lambda i: args.i0 / (1.0 + i))
    prj = bc.BlackBoxProjector(sampler, S, model=model)

    rows = []
    # non-private reference point (same BPSVI objective, no clip/noise)
    alg0 = bc.BatchPSVICoreset(jnp.asarray(X), prj, opt_itrs=args.opt_itrs,
                               n_subsample_opt=args.n_subsample_opt,
                               step_sched=sched, seed=args.trial,
                               max_size=args.M)
    t0 = time.perf_counter()
    alg0.build(1, args.M)
    w, p = alg0.get()[:2]
    rows.append({"eps": float("inf"), "noise": 0.0, "rkl": rkl_of(w, p),
                 "nnz": int((np.asarray(w) > 0).sum()),
                 "t_s": round(time.perf_counter() - t0, 2)})

    for nm in (float(s) for s in args.noise_grid.split(",")):
        alg = bc.DiffPrivBatchPSVICoreset(
            jnp.asarray(X), prj, opt_itrs=args.opt_itrs,
            n_subsample_opt=args.n_subsample_opt, step_sched=sched,
            clip_norm=args.clip_norm, noise_multiplier=nm,
            delta=args.delta, seed=args.trial, sampling=args.sampling)
        t0 = time.perf_counter()
        alg.build(1, args.M)
        w, p = alg.get()
        rows.append({"eps": round(alg.epsilon(), 3), "noise": nm,
                     "rkl": rkl_of(w, p), "nnz": int(len(w)),
                     "t_s": round(time.perf_counter() - t0, 2)})

    rkl_prior = float(reverse_forward_kl(
        gmod.GaussianPosterior(mu=mu0, prec_chol=jnp.eye(d)), post_full)[0])
    print(f"N={args.N} d={d} M={args.M} delta={args.delta} "
          f"(prior rKL={rkl_prior:.4g})")
    print(f"{'noise':>6} {'eps':>10} {'rKL':>12} {'nnz':>4} {'t[s]':>6}")
    for r in rows:
        print(f"{r['noise']:>6g} {r['eps']:>10g} {r['rkl']:>12.4g} "
              f"{r['nnz']:>4d} {r['t_s']:>6.1f}")
    os.makedirs(args.results_dir, exist_ok=True)
    out = os.path.join(
        args.results_dir,
        f"results_dpbpsvi_N{args.N}_M{args.M}_{args.sampling}_{args.trial}.pk")
    with open(out, "wb") as f:
        pickle.dump({"rows": rows, "rkl_prior": rkl_prior,
                     "config": vars(args)}, f)
    print(json.dumps({"rows": rows, "rkl_prior": rkl_prior}))


if __name__ == "__main__":
    main()
