#!/usr/bin/env python3
"""Out-of-core streaming coreset build (merge-reduce) on contaminated
logistic regression — beyond the reference, which assumes the dataset sits
next to the build.

Generates N contaminated rows ON THE HOST in chunks (device only ever holds
one chunk + the leaf coresets), builds an m_leaf beta-coreset per chunk
through ONE compiled program, then summarizes the weighted leaf union with
a final m_final build. Reports wall-clock per phase and held-out predictive
quality of the streamed coreset vs a single-shot build on the same data
(when the data fits) and vs the prior.

Usage:
  python3 examples/streaming_build.py --N 4000000 --chunk-size 1000000
  python3 examples/streaming_build.py --N 200000 --chunk-size 50000 --compare-single-shot
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from betacores_tpu.coresets import (IncrementalConfig, init_state,
                                    make_incremental_builder,
                                    merge_reduce_build)
from betacores_tpu.data import gen_synthetic_logreg, perturb_logreg
from betacores_tpu.evaluation import compute_accuracy
from betacores_tpu.inference import logreg_laplace_sampler
from betacores_tpu.models import logreg


def host_chunks(key, N, d, chunk, f_rate):
    """Contaminated synthetic logreg, materialized chunk-by-chunk to HOST
    memory (the out-of-core pattern: the full dataset never exists on
    device — each generated chunk is pulled to host and its device buffer
    freed before the next)."""
    out = []
    n_done = 0
    i = 0
    while n_done < N:
        n_i = min(chunk, N - n_done)
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        X, y, Z = gen_synthetic_logreg(k1, n_i, d=d, dtype=jnp.float32)
        _, _, Z, _ = perturb_logreg(k2, X, y, f_rate=f_rate)
        out.append(np.asarray(Z))
        n_done += n_i
        i += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--chunk-size", type=int, default=50_000)
    ap.add_argument("--f-rate", type=float, default=0.1)
    ap.add_argument("--m-leaf", type=int, default=50)
    ap.add_argument("--m-final", type=int, default=100)
    ap.add_argument("--m-buf", type=int, default=64)
    ap.add_argument("--proj-dim", type=int, default=100)
    ap.add_argument("--opt-itrs", type=int, default=300)
    ap.add_argument("--beta", type=float, default=0.1)
    ap.add_argument("--parallel-leaves", action="store_true")
    ap.add_argument("--compare-single-shot", action="store_true")
    args = ap.parse_args()

    key = jax.random.key(0)
    t0 = time.perf_counter()
    chunks = host_chunks(jax.random.fold_in(key, 100), args.N, args.d,
                         args.chunk_size, args.f_rate)
    data_host = np.concatenate(chunks)
    # clean held-out test set
    kt1, _ = jax.random.split(jax.random.fold_in(key, 999))
    Xt, Yt, _ = gen_synthetic_logreg(kt1, 20_000, d=args.d, dtype=jnp.float32)
    print(f"host data: N={data_host.shape[0]} d={args.d} "
          f"({data_host.nbytes / 1e9:.2f} GB, {len(chunks)} chunks) "
          f"in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    model = logreg.bundle()
    sampler = logreg_laplace_sampler()
    leaf_cfg = IncrementalConfig(
        projection_dim=args.proj_dim,
        n_subsample_select=min(1000, args.chunk_size),
        n_subsample_opt=min(200, args.chunk_size),
        opt_itrs=args.opt_itrs, i0=1.0, use_beta=True)
    final_cfg = IncrementalConfig(
        projection_dim=args.proj_dim, n_subsample_select=None,
        n_subsample_opt=None, opt_itrs=max(args.opt_itrs, 500), i0=1.0,
        use_beta=True)
    st_leaf = init_state(args.m_buf, args.d, beta=args.beta, dtype=jnp.float32)

    t0 = time.perf_counter()
    st_f, leaf_pts, leaf_wts = merge_reduce_build(
        jax.random.fold_in(key, 1), data_host, model, sampler, leaf_cfg,
        final_cfg, args.chunk_size, args.m_leaf, args.m_final, st_leaf,
        parallel_leaves=args.parallel_leaves)
    jax.block_until_ready(st_f.wts)
    t_stream = time.perf_counter() - t0
    n_sel = int(st_f.m)
    print(f"merge-reduce: {len(chunks)} leaves x m={args.m_leaf} -> "
          f"final m={n_sel} in {t_stream:.2f}s "
          f"({'vmapped' if args.parallel_leaves else 'streamed'})",
          file=sys.stderr)

    def acc_of(wts, pts):
        lap = sampler(jax.random.key(2), args.proj_dim, jnp.asarray(wts),
                      jnp.asarray(pts), jnp.zeros(args.d))[0]
        return float(compute_accuracy(jnp.asarray(Xt), jnp.asarray(Yt), lap))

    mask = np.asarray(st_f.slot_mask)
    acc_stream = acc_of(np.asarray(st_f.wts)[mask], np.asarray(st_f.pts)[mask])
    acc_prior = acc_of(np.zeros(1), np.zeros((1, args.d)))
    line = (f"streamed coreset m={n_sel}: test acc {acc_stream:.4f} "
            f"(prior {acc_prior:.4f}) build {t_stream:.2f}s")

    if args.compare_single_shot:
        t0 = time.perf_counter()
        b = make_incremental_builder(jnp.asarray(data_host), model, sampler,
                                     leaf_cfg)
        st_s = b.build(jax.random.fold_in(key, 2),
                       init_state(args.m_buf * 2, args.d, beta=args.beta,
                                  dtype=jnp.float32), args.m_final)
        jax.block_until_ready(st_s.wts)
        t_single = time.perf_counter() - t0
        sm = np.asarray(st_s.slot_mask)
        acc_single = acc_of(np.asarray(st_s.wts)[sm], np.asarray(st_s.pts)[sm])
        line += (f"; single-shot m={int(st_s.m)} acc {acc_single:.4f} "
                 f"build {t_single:.2f}s")
    print(line)


if __name__ == "__main__":
    main()
