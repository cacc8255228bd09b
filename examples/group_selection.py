#!/usr/bin/env python3
"""Group selection / data valuation: beta-Cores vs Distributional Shapley vs
random group selection.

Reproduces reference examples/zellner_logreg/group_selection.py: demographic
groups of a logreg dataset (loaded from the ``vq_groups_sensemake_*`` pickle
if present, else synthesized), group-level corruption proportional to a
demographic fraction, test-set rebalancing for a fair accuracy metric, then
group selection by (a) group-mode beta-Cores, (b) Monte-Carlo distributional
Shapley ranking, (c) random; every prefix of the selected group sequence is
scored by posterior predictive accuracy.

Usage: python3 examples/group_selection.py --alg BCORES --trial 0
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
from betacores_tpu.coresets import group_ids_from_groups
from betacores_tpu.data import gen_synthetic_logreg
from betacores_tpu.data.loaders import (groups_pickle_path, load_groups_pickle,
                                        load_npz, reference_dataset_path, std_cov)
from betacores_tpu.inference import logreg_laplace_sampler
from betacores_tpu.models import logreg
from betacores_tpu.ops.projection import Groups
from betacores_tpu.valuation import (logreg_laplace_value_fn, make_dshapley,
                                     make_tmc_shapley)

ALGS = ["BCORES", "DShapley", "TMC", "RAND"]


def rebalance_test(Xt, Yt, rnd):
    """Truncate the majority label for a balanced test set (reference
    group_selection.py:134-141)."""
    n_pos = (Yt == 1).sum()
    if 0.45 * len(Yt) <= n_pos <= 0.55 * len(Yt):
        return Xt, Yt
    maj = 1.0 if n_pos > len(Yt) - n_pos else -1.0
    keep_min = np.where(Yt == -maj)[0]
    n_keep = len(keep_min) + int(0.01 * len(keep_min) * rnd)
    keep_maj = np.where(Yt == maj)[0][:n_keep]
    idcs = np.concatenate([keep_maj, keep_min])
    return Xt[idcs], Yt[idcs]


def load_problem(dataset, trial, f_rate):
    path = reference_dataset_path(dataset)
    gpath = None if path is None else groups_pickle_path(dataset, dataset_path=path)
    if path is not None and gpath is not None:
        X, Y, Xt, Yt = load_npz(path)
        X, Y, Z, mean_, cov_ = std_cov(X, Y)
        groups, demos = load_groups_pickle(gpath)
        groups = [[k for k in g if k < Z.shape[0]] for g in groups]
    else:
        # synthetic fallback with demographic-like groups
        k = jax.random.key(trial + 11)
        k1, k2 = jax.random.split(k)
        # mean 0 keeps the synthetic classes balanced so the rebalancing
        # step doesn't truncate the test set
        X, Y, Z = (np.array(a) for a in gen_synthetic_logreg(k1, 3000, d=8, mean_val=0.0))
        Xt, Yt, _ = (np.array(a) for a in gen_synthetic_logreg(k2, 800, d=8, mean_val=0.0))
        rng = np.random.default_rng(trial)
        perm = rng.permutation(X.shape[0])
        sizes = rng.integers(50, 300, size=100)
        groups, i, acc = [], 0, []
        for s in sizes:
            if i + s > len(perm):
                break
            groups.append(perm[i : i + s].tolist())
            i += s
        demos = [(rng.uniform(), g) for g in groups]
        mean_ = cov_ = None
    # group-level corruption ~ demographic fraction (reference :129-131)
    rng = np.random.default_rng(trial)
    for g, dem in zip(groups, demos):
        frac = float(np.atleast_1d(np.asarray(dem, dtype=object)[0]).astype(float)[0]) if not isinstance(dem, tuple) else dem[0]
        o = int(len(g) * min(frac * f_rate * 3, 0.9))
        if o > 0:
            rows = rng.choice(g, size=o, replace=False)
            cols = rng.choice(X.shape[1], max(X.shape[1] // 2, 1), replace=False)
            for c in cols:
                X[rows, c] = rng.normal(0, 10, size=o)
            Y[rows] = -Y[rows]
    Z = Y[:, None] * X
    rnd = np.random.default_rng(42).uniform()
    Xt, Yt = rebalance_test(Xt, Yt, rnd)
    if mean_ is not None:
        Xt, Yt, _, _, _ = std_cov(Xt, Yt, mean_, cov_)
    return (Z.astype(np.float32), X.astype(np.float32), Y.astype(np.float32),
            Xt.astype(np.float32), Yt.astype(np.float32), groups)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alg", choices=ALGS, default="BCORES")
    ap.add_argument("--dataset", default="diabetes")
    ap.add_argument("--trial", type=int, default=0)
    ap.add_argument("--f-rate", type=float, default=0.1)
    ap.add_argument("--M", type=int, default=10, help="number of groups to select")
    ap.add_argument("--beta", type=float, default=0.2)
    ap.add_argument("--select-beta", action="store_true",
                    help="pick beta by the contamination-robust trimmed "
                         "held-out predictive criterion over GROUP-mode "
                         "builds (coresets/select_beta.py) before the "
                         "reported selection — the library's answer to "
                         "choosing beta where in-build learn_beta is "
                         "refused in group mode (BCORES only)")
    ap.add_argument("--beta-grid", default="0.01,0.05,0.1,0.2,0.3,0.5,0.7,1.0")
    ap.add_argument("--select-trim", type=float, default=0.25)
    ap.add_argument("--select-M", type=int, default=0,
                    help="groups per selection build (0 = --M)")
    ap.add_argument("--proj-dim", type=int, default=100)
    ap.add_argument("--opt-itrs", type=int, default=200)
    ap.add_argument("--n-subsample-opt", type=int, default=500)
    ap.add_argument("--refit-every", type=int, default=1,
                    help="lagged Laplace refits in the Adam loop (RESULTS.md)")
    ap.add_argument("--dedup-select", action="store_true",
                    help="group-mode dedup: mask already-selected groups out "
                         "of the candidate argmax and always install the "
                         "best remaining fitting group (default: reference "
                         "parity — a selected group winning is a skipped "
                         "iteration)")
    ap.add_argument("--shapley-T", type=int, default=50)
    ap.add_argument("--shapley-cap", type=int, default=50)
    ap.add_argument("--results-dir", default="results")
    args = ap.parse_args()

    Z, X, Y, Xt, Yt, groups = load_problem(args.dataset, args.trial, args.f_rate)
    G = len(groups)
    print(f"N={Z.shape[0]} d={Z.shape[1]} groups={G} test={len(Yt)}")
    Zj, Xtj, Ytj = jnp.asarray(Z), jnp.asarray(Xt), jnp.asarray(Yt)
    value_fn = logreg_laplace_value_fn(n_samples=256)
    value_args = (Zj, Xtj, Ytj)

    select_record = None
    if args.select_beta:
        if args.alg != "BCORES":
            raise SystemExit("--select-beta only applies to BCORES")
        from betacores_tpu.coresets.select_beta import (driver_select_beta,
                                                        padded_scorer)

        model_s = logreg.bundle()
        smp_s = logreg_laplace_sampler()
        prj_s = bc.BetaBlackBoxProjector(smp_s, args.proj_dim, model=model_s)
        # candidate builds run GROUP mode on the full corrupted data (the
        # group structure must stay intact); scored on a random row slice —
        # mostly unselected at M groups out of G — by trimmed per-point
        # predictive log-lik under the group-coreset Laplace posterior
        rng_sel = np.random.default_rng(args.trial * 7 + 1)
        ho = rng_sel.choice(Z.shape[0], max(1, Z.shape[0] // 6), replace=False)
        Zho = jnp.asarray(Z[ho])
        M_sel = args.select_M or args.M
        alg_sel = bc.BetaCoreset(Zj, prj_s, beta=args.beta, learn_beta=False,
                                 opt_itrs=args.opt_itrs,
                                 n_subsample_select=None,
                                 n_subsample_opt=args.n_subsample_opt,
                                 groups=groups, seed=args.trial,
                                 refit_every=args.refit_every,
                                 dedup_select=args.dedup_select)
        k_score = jax.random.key(args.trial * 31 + 5)
        S_score = 256
        d_feat = Z.shape[1]

        @jax.jit
        def _pred_ll(wm, pm, zho):
            samples, _ = smp_s(k_score, S_score, wm, pm,
                               jnp.zeros(d_feat, dtype=jnp.float32))
            ll = logreg.log_likelihood(zho, samples)
            return (jax.scipy.special.logsumexp(ll, axis=1)
                    - jnp.log(float(S_score)))

        # a group build appends whole groups: cap the padded scorer at the
        # largest possible selection (M_sel groups of the largest group)
        cap_rows = int(M_sel * max(len(g) for g in groups))
        score_fn = padded_scorer(cap_rows, d_feat,
                                 lambda wp, pp: _pred_ll(wp, pp, Zho))
        grid = [float(b) for b in args.beta_grid.split(",")]
        best_beta, select_record, _ = driver_select_beta(
            alg_sel, grid, score_fn, args.select_trim, M_sel)
        print("select-beta grid: " + "  ".join(
            f"{b:g}:{s:.4f}" for b, s in zip(grid, select_record["scores"])))
        print(f"selected beta = {best_beta:g} "
              f"[{select_record['select_time_s']:.1f}s for {len(grid)} "
              f"group-mode builds]")
        args.beta = best_beta

    t0 = time.perf_counter()
    if args.alg == "BCORES":
        model = logreg.bundle()
        prj = bc.BetaBlackBoxProjector(logreg_laplace_sampler(), args.proj_dim,
                                       model=model)
        alg = bc.BetaCoreset(Zj, prj, beta=args.beta, learn_beta=False,
                             opt_itrs=args.opt_itrs, n_subsample_select=None,
                             n_subsample_opt=args.n_subsample_opt,
                             groups=groups, seed=args.trial,
                             refit_every=args.refit_every,
                             dedup_select=args.dedup_select)
        # some iterations re-weight existing points instead of adding a
        # group, so iterate until M distinct groups are selected (cap 4M).
        # Chunked build_trace: M iterations per DEVICE call (the selection
        # order falls out of the recorded per-iteration selected masks)
        # instead of a host round trip per iteration.
        order = []
        prev = np.zeros(G, dtype=bool)
        for _ in range(4):
            _, sel = alg.build_trace(args.M, return_selected=True)
            for row in sel:
                new = np.where(row & ~prev)[0]
                order.extend(new.tolist())
                prev = row
            if len(order) >= args.M:
                break
        order = order[: args.M]
    elif args.alg == "DShapley":
        gp = Groups.from_lists(groups)
        gid = group_ids_from_groups(gp, Z.shape[0])
        dshap = make_dshapley(gid, gp, value_fn, value_args=value_args,
                              max_groups=min(20, G),
                              group_cap=args.shapley_cap)
        phis = np.asarray(dshap(jax.random.key(args.trial), args.shapley_T))
        order = np.argsort(phis)[::-1][: args.M].tolist()
    elif args.alg == "TMC":
        # truncated-MC Shapley baseline (reference tmcshapley.py as a
        # standalone script; here a driver alg sharing the same value_fn)
        gp = Groups.from_lists(groups)
        gid = group_ids_from_groups(gp, Z.shape[0])
        full_mask = (np.asarray(gid) < G).astype(np.float32)
        full_value = float(value_fn(jax.random.key(999),
                            jnp.asarray(full_mask), *value_args))
        print(f"full-data value (TMC truncation target): {full_value:.4f}")
        tmc = make_tmc_shapley(gid, gp, value_fn, value_args=value_args,
                               full_value=full_value,
                               group_cap=args.shapley_cap)
        phis = np.asarray(tmc(jax.random.key(args.trial), args.shapley_T))
        order = np.argsort(phis)[::-1][: args.M].tolist()
    else:
        order = np.random.default_rng(args.trial).permutation(G)[: args.M].tolist()
    select_time = time.perf_counter() - t0

    # evaluate every prefix of the selected group sequence (reference :228-266)
    accs = np.zeros(len(order) + 1)
    accs[0] = 0.5
    mask = np.zeros(Z.shape[0], dtype=bool)
    for j, g in enumerate(order, start=1):
        mask[groups[g]] = True
        accs[j] = float(value_fn(jax.random.key(1000 + j),
                                 jnp.asarray(mask, dtype=jnp.float32),
                                 *value_args))
        print(f"prefix {j} (group {g}, {mask.sum()} pts): acc={accs[j]:.4f}")

    os.makedirs(args.results_dir, exist_ok=True)
    tag = f"{args.dataset}_{args.alg}_{args.f_rate}_{args.trial}"
    with open(os.path.join(args.results_dir, f"group_results_{tag}.pk"), "wb") as fh:
        pickle.dump({"args": vars(args), "order": order, "accs": accs,
                     "select_time_s": select_time,
                     "select_beta": select_record}, fh)
    print(f"{args.alg}: selection {select_time:.1f}s, final acc {accs[-1]:.4f}")


if __name__ == "__main__":
    main()
