"""Headline benchmark (BASELINE.md target): build an M=100 beta-coreset over
N=1M contaminated logistic-regression points — reference hyperparameters
(S=100, 500 Adam iterations per selection, n_subsample_select=1000,
n_subsample_opt=200; reference zellner_logreg/main.py:115-127) — in under
10 s. The whole build (100 selections x 500 MC-gradient steps, each with a
fresh warm-started Newton-Laplace posterior re-fit, posterior sampling and
beta-projection) runs as ONE compiled XLA program.

Prints exactly one JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 10/seconds}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from betacores_tpu.coresets import IncrementalConfig, init_state, make_incremental_builder
    from betacores_tpu.data import gen_synthetic_logreg, perturb_logreg
    from betacores_tpu.inference import logreg_laplace_sampler
    from betacores_tpu.models import logreg

    N, d, M, S = 1_000_000, 10, 100, 100
    print(f"devices: {jax.devices()}", file=sys.stderr)

    k0, k1, k2 = jax.random.split(jax.random.key(0), 3)
    X, y, Z = gen_synthetic_logreg(k0, N, d=d, dtype=jnp.float32)
    X, y, Z, _ = perturb_logreg(k1, X, y, f_rate=0.1)
    Z = jax.block_until_ready(Z)

    cfg = IncrementalConfig(
        projection_dim=S,
        n_subsample_select=1000,
        n_subsample_opt=200,
        opt_itrs=500,
        i0=1.0,
        use_beta=True,
    )
    model = logreg.bundle()
    sampler = logreg_laplace_sampler()
    n_dev = jax.device_count()
    if n_dev > 1:
        # multi-chip: row-shard N over the mesh's data axis (the BASELINE
        # v5e-8 configuration); state replicated, distributed argmax.
        from betacores_tpu.parallel import (auto_mesh_shape, make_mesh,
                                            make_sharded_incremental_builder,
                                            shard_data)

        mesh = make_mesh(*auto_mesh_shape(n_dev))
        Zs, n_true = shard_data(Z, mesh)
        builder_fn = make_sharded_incremental_builder(Zs, n_true, model,
                                                      sampler, cfg, mesh)
        build = lambda key, st, itrs: builder_fn(key, st, itrs)
        print(f"sharded build over mesh {dict(mesh.shape)}", file=sys.stderr)
    else:
        builder = make_incremental_builder(Z, model, sampler, cfg)
        build = builder.build
    st0 = init_state(128, d, beta=0.1, dtype=jnp.float32)

    # compile (cached for subsequent runs)
    t0 = time.perf_counter()
    st = jax.block_until_ready(build(k2, st0, M))
    t_first = time.perf_counter() - t0

    # timed run (compile excluded)
    t0 = time.perf_counter()
    st = jax.block_until_ready(build(k2, st0, M))
    t_build = time.perf_counter() - t0

    n_sel = int(st.m)
    w = jnp.asarray(st.wts)
    print(
        f"first-call (incl compile): {t_first:.2f}s; build: {t_build:.3f}s; "
        f"selected {n_sel} points, sum(w)={float(w.sum()):.1f}",
        file=sys.stderr,
    )
    assert n_sel >= M // 2, f"degenerate build: only {n_sel} selections"

    print(json.dumps({
        "metric": "bcores_build_n1m_m100_logreg_seconds",
        "value": round(t_build, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / t_build, 3),
    }))


if __name__ == "__main__":
    main()
