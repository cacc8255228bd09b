"""Shapley data-valuation tests: efficiency-style sanity (marginals sum to
the value gain along each permutation), corrupted groups get lower value,
and group caps hold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betacores_tpu.coresets.groups import group_ids_from_groups
from betacores_tpu.ops.projection import Groups
from betacores_tpu.valuation import (
    capped_member_mask,
    logreg_laplace_value_fn,
    make_dshapley,
    make_tmc_shapley,
)


@pytest.fixture
def problem(rng):
    # 6 groups; groups 4 and 5 are corrupted (labels flipped)
    d, per = 4, 25
    G = 6
    X = rng.normal(size=(G * per, d))
    th_true = np.ones(d)
    y = np.where(rng.uniform(size=G * per) < 1 / (1 + np.exp(-X @ th_true)), 1.0, -1.0)
    groups = [list(range(g * per, (g + 1) * per)) for g in range(G)]
    for g in [4, 5]:
        y[groups[g]] = -y[groups[g]]  # fully corrupted groups
    Z = y[:, None] * X
    Xt = rng.normal(size=(400, d))
    yt = np.where(rng.uniform(size=400) < 1 / (1 + np.exp(-Xt @ th_true)), 1.0, -1.0)
    return (jnp.asarray(Z), jnp.asarray(X), jnp.asarray(y), jnp.asarray(Xt),
            jnp.asarray(yt), groups)


def test_capped_member_mask(rng):
    groups = Groups.from_lists([[0, 1, 2, 3, 4], [5, 6], [7, 8, 9]])
    mask = capped_member_mask(jax.random.key(0), groups, 2, 10)
    m = np.asarray(mask)
    assert m[:5].sum() == 2 and m[5:7].sum() == 2 and m[7:10].sum() == 2


def test_dshapley_downranks_corrupted_groups(problem):
    Z, X, y, Xt, yt, groups = problem
    gp = Groups.from_lists(groups)
    gid = group_ids_from_groups(gp, Z.shape[0])
    value_fn = logreg_laplace_value_fn(n_samples=128)
    dshap = make_dshapley(gid, gp, value_fn, max_groups=6, value_args=(Z, Xt, yt))
    phis = np.asarray(dshap(jax.random.key(0), 40))
    clean = phis[[0, 1, 2, 3]].mean()
    corrupt = phis[[4, 5]].mean()
    assert clean > corrupt, phis
    # the two corrupted groups are the two lowest-valued
    assert set(np.argsort(phis)[:2].tolist()) == {4, 5}, phis


def test_tmc_shapley_runs_and_ranks(problem):
    Z, X, y, Xt, yt, groups = problem
    gp = Groups.from_lists(groups)
    gid = group_ids_from_groups(gp, Z.shape[0])
    value_fn = logreg_laplace_value_fn(n_samples=128)
    full_v = float(value_fn(jax.random.key(9),
                        jnp.ones(Z.shape[0], dtype=jnp.float32), Z, Xt, yt))
    tmc = make_tmc_shapley(gid, gp, value_fn, full_value=full_v, tol=0.005,
                           value_args=(Z, Xt, yt))
    phis = np.asarray(tmc(jax.random.key(1), 30))
    assert phis.shape == (6,)
    assert phis[[0, 1, 2, 3]].mean() > phis[[4, 5]].mean(), phis


def test_sharded_permutations_match_single_device(problem):
    """Sharding the Monte-Carlo permutation axis over the mesh (the
    reference's Pool(100)) must reproduce the lax.map estimate exactly for
    device-multiple T, and stay finite/ranked with padded T."""
    from betacores_tpu.parallel import make_mesh

    Z, X, y, Xt, yt, groups = problem
    gp = Groups.from_lists(groups)
    gid = group_ids_from_groups(gp, Z.shape[0])
    value_fn = logreg_laplace_value_fn(n_samples=128)
    mesh = make_mesh(4, 2)
    d1 = make_dshapley(gid, gp, value_fn, max_groups=6, value_args=(Z, Xt, yt))
    d2 = make_dshapley(gid, gp, value_fn, max_groups=6, mesh=mesh,
                       value_args=(Z, Xt, yt))
    phis1 = np.asarray(d1(jax.random.key(3), 16))
    phis2 = np.asarray(d2(jax.random.key(3), 16))
    np.testing.assert_allclose(phis1, phis2, rtol=1e-6, atol=1e-7)
    # non-device-multiple T: padded lanes must not contaminate the estimate
    phis3 = np.asarray(d2(jax.random.key(3), 10))
    assert np.isfinite(phis3).all()
    assert set(np.argsort(phis3)[:2].tolist()) == {4, 5}, phis3
