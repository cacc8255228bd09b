"""Pallas TPU kernels — only where a hand-written kernel actually beats XLA.

Round-2 microbenchmark audit (RESULTS.md; forced-device-sync harness, v5e,
N=2^20 x S=100): XLA already fuses a plain matmul -> likelihood transform ->
centering projection into one HBM pass, so the hand-written logreg /
gaussian / poisson projection kernels measured 1.5-2.5x SLOWER than the XLA
composition and were retired (earlier records of large kernel speedups were
tunnel-measurement artifacts — see CLAUDE.md on microbenchmarking through
the axon tunnel). Two kernels genuinely pay and remain:

  * ``multiclass_projection_fused`` — the K-class softmax transform needs
    per-class logsumexp state that XLA materializes as (N, S, K) HBM
    intermediates; keeping it in VMEM measured 5.8 ms vs 60 ms XLA (10x).
  * ``logreg_adam_step_fused`` — the incremental build's Adam step is a
    LATENCY-bound chain of ~7 tiny dependent kernels; one launch for the
    whole step (gradient through projected-Adam update) cut the N=1M
    headline build 0.95 s -> 0.70 s end to end.

Both run in interpret mode off-TPU; the test battery checks agreement with
the XLA composition within float tolerance.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2PI = math.log(2.0 * math.pi)

# row-tile height; lane width handled by padding S to 128
_TN = 4096


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels (and their tests) run on the
    virtual CPU mesh."""
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _softplus(m):
    return jnp.maximum(m, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(m)))


def _center_cols(vals, s_true: int, s_pad: int):
    """Zero the padded columns and subtract the row mean over true columns."""
    if s_pad != s_true:
        col = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
        vals = jnp.where(col < s_true, vals, 0.0)
    mean = jnp.sum(vals, axis=1, keepdims=True) / s_true
    return vals - mean


def _logreg_vals(m, beta_ref, use_beta: bool):
    """(Beta-)log-likelihood transform on the margin block m = -(z . th) —
    the ONE implementation shared by the projection and grad-step kernels
    (models/logreg.py log_likelihood/beta_likelihood, positive convention)."""
    if not use_beta:
        return -_softplus(m)
    beta = beta_ref[0]
    sp, sn = _softplus(m), _softplus(-m)
    return ((beta + 1.0) / beta * jnp.exp(-beta * sp)
            - jnp.exp(-(beta + 1.0) * sp)
            - jnp.exp(-(beta + 1.0) * sn))


def _pad_rows(x, tn):
    pad = (-x.shape[0]) % tn
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), dtype=x.dtype)])
    return x, pad


def _pad_cols(x, m):
    pad = (-x.shape[1]) % m
    if pad:
        x = jnp.concatenate([x, jnp.zeros((x.shape[0], pad), dtype=x.dtype)], axis=1)
    return x


# Adam constants of the fused step kernel — MUST match utils/opt.py::nn_adam
# defaults (the fused branch of coresets/incremental.py replays nn_adam's
# exact update; the equivalence tests below pin the two implementations)
ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


def _logreg_adam_step_kernel(sc_ref, sclr_ref, xin_ref, z_ref, mu_ref,
                             linv_ref, w_ref, m1_ref, m2_ref,
                             w_out, m1_out, m2_out, *, use_beta: bool,
                             d_feat: int, n_sub_pad: int, s_true: int):
    """One ENTIRE Adam refinement step of the incremental builder
    (coresets/incremental.py fused branch) in a single kernel: posterior
    samples from pre-drawn noise, the joint [subsample; coreset]
    (beta-)projection, centering, the residual, the weight gradient, AND the
    projected-Adam update — the per-step XLA composition is ~7 dependent
    tiny kernels and the build hot loop is latency-bound (RESULTS.md
    roofline section), so collapsing the chain to one launch is wall-clock
    off every one of the M x opt_itrs steps. Only the Newton-Laplace refit
    (cholesky + solves) stays on XLA.

    Layout contract (wrapper below): rows are packed [x | valid-mask] with
    the subsample block padded to ``n_sub_pad`` rows and the coreset buffer
    padded to a 128-multiple; z is padded to s_pad rows of zeros (extra
    sample columns are masked out of the centering and the sums); w/m1/m2
    are (1, M_pad) rows. sc = [beta, sum_scaling]; sclr = per-step
    [lr, 1-b1^t, 1-b2^t] (bias corrections precomputed OUTSIDE the scan,
    bit-identical to nn_adam's) — both SMEM.
    """
    s_pad = z_ref.shape[0]
    th = jnp.dot(z_ref[:], linv_ref[:],
                 preferred_element_type=jnp.float32) + mu_ref[:]   # (s_pad, d)
    x = xin_ref[:, :d_feat]
    msk = xin_ref[:, d_feat:d_feat + 1]                            # (R, 1)
    m = -jax.lax.dot_general(x, th, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # (R, s_pad)
    vals = _logreg_vals(m, sc_ref, use_beta)
    # center over the TRUE sample columns, zero the padded ones entirely
    # (unlike _center_cols, the padded columns must not carry -mean into the
    # residual/grad sums below), then apply the row validity mask
    col = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    valid = col < s_true
    vals = jnp.where(valid, vals, 0.0)
    mean = jnp.sum(vals, axis=1, keepdims=True) / s_true
    vals = jnp.where(valid, vals - mean, 0.0) * msk
    sub, core = vals[:n_sub_pad], vals[n_sub_pad:]                 # (., s_pad)
    tsum = jnp.sum(sub, axis=0, keepdims=True)                     # (1, s_pad)
    w = w_ref[:]
    wcore = jnp.dot(w, core, preferred_element_type=jnp.float32)
    resid = sc_ref[1] * tsum - wcore                               # (1, s_pad)
    g = -jax.lax.dot_general(resid, core, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) / s_true
    # projected Adam (utils/opt.py::nn_adam semantics, all coords >= 0).
    # Gradient entries at masked/padded slots are exactly 0 (their core rows
    # are zeroed), so those weights and moments stay 0 forever.
    m1 = ADAM_B1 * m1_ref[:] + (1.0 - ADAM_B1) * g
    m2 = ADAM_B2 * m2_ref[:] + (1.0 - ADAM_B2) * g * g
    m1hat = m1 / sclr_ref[1]
    m2hat = m2 / sclr_ref[2]
    w_new = jnp.maximum(w - sclr_ref[0] * m1hat / (ADAM_EPS + jnp.sqrt(m2hat)), 0.0)
    w_out[:] = w_new.astype(w_out.dtype)
    m1_out[:] = m1.astype(m1_out.dtype)
    m2_out[:] = m2.astype(m2_out.dtype)


@functools.partial(jax.jit, static_argnames=("use_beta", "s_true"))
def logreg_adam_step_fused(xin: jnp.ndarray, z: jnp.ndarray, mu: jnp.ndarray,
                           linv: jnp.ndarray, w_row: jnp.ndarray,
                           m1_row: jnp.ndarray, m2_row: jnp.ndarray,
                           sc: jnp.ndarray, sclr: jnp.ndarray, s_true: int,
                           use_beta: bool = False):
    """(w', m1', m2') of one projected-Adam refinement step in ONE launch.

    ALL operands arrive pre-padded (the caller pads once OUTSIDE its scan —
    per-step pad kernels would give back the latency this kernel removes):
    xin (n_sub_pad + M_pad, d+1) rows [x | mask]; z (s_pad, d) pre-drawn
    noise (zero rows beyond s_true); mu (1, d) and linv (d, d) = L^-1 from
    the current Laplace fit (theta = mu + z @ L^-1, the exact
    sample_laplace_from_noise transform); w/m1/m2 (1, M_pad) Adam state;
    sc = [beta, sum_scaling]; sclr = [lr, 1-b1^t, 1-b2^t] per step."""
    d_feat = xin.shape[1] - 1
    M_pad = w_row.shape[1]
    n_sub_pad = xin.shape[0] - M_pad
    shp = jax.ShapeDtypeStruct((1, M_pad), w_row.dtype)
    out = pl.pallas_call(
        functools.partial(_logreg_adam_step_kernel, use_beta=use_beta,
                          d_feat=d_feat, n_sub_pad=n_sub_pad, s_true=s_true),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[shp, shp, shp],
        interpret=_interpret(),
    )(sc, sclr, xin, z, mu, linv, w_row, m1_row, m2_row)
    return out


def _logreg_shard_partials_kernel(sc_ref, xin_ref, z_ref, mu_ref, linv_ref,
                                  w_ref, colsum_out, core_out, corerow_out,
                                  wcore_out, *, use_beta: bool, d_feat: int,
                                  n_sub_pad: int, s_true: int):
    """Shard-local half of one sharded Adam refinement step
    (parallel/sharded.py fused branch): posterior samples from this device's
    pre-drawn noise COLUMN BLOCK, the joint [local subsample; coreset]
    (beta-)projection, and every LOCAL reduction the distributed gradient
    needs — in one launch. The step's only cross-device work (a
    psum('data') of the column sums and one psum('samp') of the packed
    row-reductions) stays outside; everything between the two collectives
    is an O(M) XLA epilogue.

    Centering note: unlike the single-chip step kernel this one does NOT
    center — the row mean is over the FULL sample axis, which is sharded
    here. The gradient is computed from UNCENTERED projections via the
    identity (coreset gradient, centering constants cancel):

        g_m = -(<U_m, r_unc>_S - mu_m * sum_s r_unc[s]) / S,
        r_unc = scaling * sum_n U_n - w . U_core,   mu_m = (1/S) sum_s U_m[s]

    which equals the centered gradient EXACTLY in real arithmetic (the
    sub-row centering shifts r by a constant c that multiplies centered
    core rows summing to zero; the core-row centering is the mu_m term).
    Float op order differs from the centered path — the equivalence tests
    compare within tolerance, like the single-chip fused kernel.

    Outputs: colsum (1, s_pad) sum of subsample rows (feeds the data-axis
    psum), core (M_pad, s_pad) uncentered coreset block, corerow (1, M_pad)
    per-core-row sums over the local true columns (feeds mu_m), and
    wcore (1, s_pad) = w . core (the residual's coreset term)."""
    th = jnp.dot(z_ref[:], linv_ref[:],
                 preferred_element_type=jnp.float32) + mu_ref[:]   # (s_pad, d)
    x = xin_ref[:, :d_feat]
    msk = xin_ref[:, d_feat:d_feat + 1]                            # (R, 1)
    m = -jax.lax.dot_general(x, th, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # (R, s_pad)
    vals = _logreg_vals(m, sc_ref, use_beta)
    col = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    vals = jnp.where(col < s_true, vals, 0.0) * msk                # no centering
    sub, core = vals[:n_sub_pad], vals[n_sub_pad:]
    colsum_out[:] = jnp.sum(sub, axis=0, keepdims=True).astype(colsum_out.dtype)
    core_out[:] = core.astype(core_out.dtype)
    corerow_out[:] = jnp.sum(core, axis=1)[None, :].astype(corerow_out.dtype)
    wcore_out[:] = jnp.dot(w_ref[:], core,
                           preferred_element_type=jnp.float32).astype(wcore_out.dtype)


@functools.partial(jax.jit, static_argnames=("use_beta", "s_true"))
def logreg_shard_step_partials(xin: jnp.ndarray, z: jnp.ndarray,
                               mu: jnp.ndarray, linv: jnp.ndarray,
                               w_row: jnp.ndarray, sc: jnp.ndarray,
                               s_true: int, use_beta: bool = False):
    """(colsum, core, corerow, wcore) of one sharded refinement step's
    shard-local work in ONE launch (see kernel docstring). Operands arrive
    pre-padded like ``logreg_adam_step_fused``: xin (n_sub_pad + M_pad, d+1)
    rows [x | mask]; z (s_loc_pad, d_theta) = this device's pre-drawn noise
    column block (zero rows beyond s_true = S_loc); mu (1, d), linv (d, d);
    w_row (1, M_pad); sc = [beta]."""
    d_feat = xin.shape[1] - 1
    M_pad = w_row.shape[1]
    n_sub_pad = xin.shape[0] - M_pad
    s_pad = z.shape[0]
    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_logreg_shard_partials_kernel, use_beta=use_beta,
                          d_feat=d_feat, n_sub_pad=n_sub_pad, s_true=s_true),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((1, s_pad), f32),
                   jax.ShapeDtypeStruct((M_pad, s_pad), f32),
                   jax.ShapeDtypeStruct((1, M_pad), f32),
                   jax.ShapeDtypeStruct((1, s_pad), f32)],
        interpret=_interpret(),
    )(sc, xin, z, mu, linv, w_row)
    return out


# minimum rows for the fused path to beat plain XLA (below this, dispatch
# overhead dominates and the XLA fusion is fine)
FUSED_MIN_ROWS = 8192


def maybe_fused(n_rows: int) -> bool:
    return n_rows >= FUSED_MIN_ROWS


def _multiclass_kernel(beta_ref, x_ref, y_ref, tht_ref, out_ref, *,
                       use_beta: bool, n_classes: int, s_true: int, s_pad: int):
    """Softmax-family projection: one (TN, d) @ (d, K*S) MXU matmul, then
    per-class logsumexp / density-power transform entirely in VMEM — the
    XLA composition materializes (N, S, K) log-prob intermediates in HBM
    (measured 63 ms vs the ~5 ms HBM floor at N=2^20, S=100, K=5)."""
    logits = jnp.dot(x_ref[:], tht_ref[:], preferred_element_type=jnp.float32)
    mk = [logits[:, k * s_pad:(k + 1) * s_pad] for k in range(n_classes)]
    mx = mk[0]
    for k in range(1, n_classes):
        mx = jnp.maximum(mx, mk[k])
    se = jnp.zeros_like(mx)
    for k in range(n_classes):
        se = se + jnp.exp(mk[k] - mx)
    lse = mx + jnp.log(se)
    y = y_ref[:]  # (TN, 1) float class index, broadcasts over S
    lp_y = jnp.zeros_like(mx)
    for k in range(n_classes):
        lp_y = lp_y + jnp.where(y == float(k), mk[k], 0.0)
    lp_y = lp_y - lse
    if not use_beta:
        vals = lp_y
    else:
        beta = beta_ref[0]
        mass = jnp.zeros_like(mx)
        for k in range(n_classes):
            mass = mass + jnp.exp((1.0 + beta) * (mk[k] - lse))
        vals = (beta + 1.0) / beta * jnp.exp(beta * lp_y) - mass
    out_ref[:] = _center_cols(vals, s_true, s_pad).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_classes", "use_beta"))
def multiclass_projection_fused(z: jnp.ndarray, thetas: jnp.ndarray,
                                n_classes: int, beta=1.0,
                                use_beta: bool = False) -> jnp.ndarray:
    """Centered (N, S) K-class softmax (beta-)log-likelihood projection in
    one HBM pass. ``z`` rows are [x, y] (models/multiclass.py convention);
    ``thetas`` (S, K*d) packed row-major (K, d)."""
    N, D = z.shape
    d = D - 1
    S = thetas.shape[0]
    s_pad = _round_up(S, 128)
    K = n_classes
    # (d, K*s_pad) with k-major column blocks: column k*s_pad + s = theta[s, k]
    T = thetas.reshape(S, K, d).transpose(2, 1, 0).astype(jnp.float32)  # (d, K, S)
    if s_pad != S:
        T = jnp.concatenate(
            [T, jnp.zeros((d, K, s_pad - S), dtype=T.dtype)], axis=2)
    T = T.reshape(d, K * s_pad)
    x = z[:, :-1].astype(jnp.float32)
    y = z[:, -1:].astype(jnp.float32)
    # smaller row tile than the binary kernel: the logits block is K x wider
    tn = max(256, _TN // _round_up(K, 4))
    xp, pad = _pad_rows(x, tn)
    yp, _ = _pad_rows(y, tn)
    grid = (xp.shape[0] // tn,)
    beta_arr = jnp.asarray(beta, dtype=jnp.float32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_multiclass_kernel, use_beta=use_beta, n_classes=K,
                          s_true=S, s_pad=s_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, K * s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], s_pad), z.dtype),
        interpret=_interpret(),
    )(beta_arr, xp, yp, T)
    return out[:N, :S]


# ---------------------------------------------------------------------------
# Fused-step input packing (shared by coresets/incremental.py and
# parallel/sharded.py — round-3 review: the two ~70-line assemblies had
# drifted into near-copies; the kernel-facing layout lives HERE, next to the
# kernels that consume it)
# ---------------------------------------------------------------------------

def pack_fused_step_rows(rows_all, core_pts, slot_mask, n_sub: int,
                         sub_mask, dtype=None):
    """Assemble the (T, R, D+1) xin tensor the fused step kernels consume:
    [subsample rows; zero pad to 8; coreset buffer broadcast; zero pad to
    128] with the mask as a last column — [sub_mask]*n_sub for data rows
    (a traced scalar on sharded paths: 0 when the shard has no valid rows),
    slot_mask for buffer rows, 0 for padding. All padding happens here,
    OUTSIDE the Adam scan: per-step pad/concat kernels would give back the
    launch latency the fused kernel removes.

    Returns (xin_all, M_pad, R)."""
    f32 = jnp.float32 if dtype is None else dtype
    T = rows_all.shape[0]
    D = rows_all.shape[2]
    M_buf = core_pts.shape[0]
    n_sub_pad = _round_up(n_sub, 8)
    M_pad = _round_up(M_buf, 128)
    pad_sub = n_sub_pad - n_sub
    core = core_pts.astype(f32)
    if M_pad > M_buf:
        core = jnp.concatenate([core, jnp.zeros((M_pad - M_buf, D), f32)])
    blocks = [rows_all.astype(f32)]
    if pad_sub:
        blocks.append(jnp.zeros((T, pad_sub, D), f32))
    blocks.append(jnp.broadcast_to(core, (T, M_pad, D)))
    rows_blk = jnp.concatenate(blocks, axis=1)
    mask_col = jnp.concatenate([
        jnp.full((n_sub,), sub_mask, f32),
        jnp.zeros((pad_sub,), f32),
        slot_mask.astype(f32),
        jnp.zeros((M_pad - M_buf,), f32)])
    R = rows_blk.shape[1]
    xin_all = jnp.concatenate(
        [rows_blk, jnp.broadcast_to(mask_col[None, :, None], (T, R, 1))],
        axis=2)
    return xin_all, M_pad, R


def pad_fused_step_noise(z_all, s_active: int, dtype=None):
    """Pad the (T, S, d_th) pre-drawn noise block's sample axis to the
    kernel's 128 multiple."""
    f32 = jnp.float32 if dtype is None else dtype
    s_pad = _round_up(s_active, 128)
    z = z_all.astype(f32)
    if s_pad > s_active:
        T, _, d_th = z.shape
        z = jnp.concatenate([z, jnp.zeros((T, s_pad - s_active, d_th), f32)],
                            axis=1)
    return z


def adam_sclr_stack(step_sizes, dtype=None):
    """Per-step [lr, 1-b1^t, 1-b2^t] — the kernels replay nn_adam's exact
    projected-Adam update (its default b1/b2/eps, asserted against ADAM_*
    in this module) with the bias corrections precomputed in one batched
    pass, bit-identical elementwise."""
    f32 = jnp.float32 if dtype is None else dtype
    T = step_sizes.shape[0]
    steps_f = jnp.arange(T, dtype=f32) + 1.0
    return jnp.stack([step_sizes.astype(f32),
                      1.0 - ADAM_B1 ** steps_f,
                      1.0 - ADAM_B2 ** steps_f], axis=1)        # (T, 3)


def make_refit_state(smp, pts, eye_d, dtype=None):
    """refit_state(w, lap_aux) -> (lap, L^-1) for the fused step kernels:
    prefers the sampler's fit_inv (the refit computes L^-1 as part of its
    own Newton direction — no separate inversion), else fits and inverts
    the d x d Cholesky factor."""
    f32 = jnp.float32 if dtype is None else dtype
    fit = getattr(smp, "fit", None)
    fit_inv = getattr(smp, "fit_inv", None)

    def refit_state(w, lap_aux):
        if fit_inv is not None:
            lap = fit_inv(w, pts, lap_aux)
            return lap, lap.prec_chol_inv.astype(f32)
        lap = fit(w, pts, lap_aux)
        linv = jax.scipy.linalg.solve_triangular(
            lap.prec_chol.astype(f32), eye_d, lower=True)
        return lap, linv

    return refit_state


def make_step_refit(refit_state, lagged: bool, k_refit: int, fit_aux,
                    M_buf: int, w_dtype):
    """Per-step (lap, L^-1) resolver: lagged refits run the Newton chain
    only every k-th step inside lax.cond (same schedule as the XLA lagged
    paths); otherwise every step refits."""
    def step_refit(w, i, lap_c):
        if lagged:
            return jax.lax.cond(
                jnp.logical_and(i % k_refit == 0, i > 0),
                lambda: refit_state(w[0, :M_buf].astype(w_dtype),
                                    fit_aux(lap_c[0])),
                lambda: lap_c)
        return refit_state(w[0, :M_buf].astype(w_dtype), lap_c)

    return step_refit
