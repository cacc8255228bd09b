"""Diagnostic-gated sampler escalation for the driver evaluation loops.

The reference's evaluator IS adaptive NUTS (examples/common/mcmc.py:21-59:
PyStan with adapt_delta=0.9, max_treedepth=15) — a user of the reference
never has to know a flag to get a sampler that adapts until it mixes. Our
default evaluation sampler is fixed-budget HMC (cheaper: static trajectory,
one small compiled program), which measurably fails to mix on hard
posteriors (RESULTS.md: multiclass HMC at split-R-hat 1.22 while NUTS
mixed). This module restores the reference's property: run the primary
sampler, check split-R-hat / min-ESS / divergences, and if the diagnostics
fail re-run that evaluation with dynamic-trajectory NUTS, recording which
sampler produced the reported numbers.

All drivers with an MCMC evaluation loop route through
:func:`run_with_escalation` so the policy (thresholds, what "failed" means,
what gets recorded) lives in exactly one place.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .diagnostics import summarize_chains

# Stan's long-standing practical thresholds: R-hat above 1.05 means the
# chains disagree about the posterior; bulk ESS under ~100 (tail quantiles
# unstable) means the draws are too autocorrelated to trust. Divergences
# at all mean the integrator stepped off the energy surface.
DEFAULT_RHAT_MAX = 1.05
DEFAULT_ESS_MIN = 100.0


class EvalRun(NamedTuple):
    """One evaluated coreset size's MCMC output + provenance."""

    chains: jnp.ndarray          # (C, n, d) draws from the RECORDED sampler
    stats: dict                  # per-chain sampler stats (accept_stat, ...)
    summary: dict                # summarize_chains() of the recorded draws
    sampler_used: str            # "hmc" | "nuts" — what produced `chains`
    escalated: bool              # True when NUTS re-ran a failed primary
    failure_reason: str          # why the primary failed ("" if it passed)


def diagnostics_failed(
    summary: dict,
    stats: Optional[dict] = None,
    *,
    rhat_max: float = DEFAULT_RHAT_MAX,
    ess_min: float = DEFAULT_ESS_MIN,
) -> str:
    """Return a human-readable failure reason, or "" when the run is clean.

    Checks, in order of diagnostic severity: divergences (if the sampler
    reports them — NUTS does, fixed-budget HMC does not), split-R-hat,
    min ESS.
    """
    if stats is not None and "n_divergent" in stats:
        n_div = int(np.asarray(stats["n_divergent"]).sum())
        if n_div > 0:
            return f"{n_div} divergent transitions"
    rhat = float(np.asarray(summary["rhat"]).max())
    if not rhat < rhat_max:  # catches NaN too
        return f"split-R-hat {rhat:.3f} > {rhat_max}"
    ess = float(np.asarray(summary["ess"]).min())
    if not ess >= ess_min:
        return f"min ESS {ess:.0f} < {ess_min:.0f}"
    return ""


def run_with_escalation(
    key,
    run_primary: Callable,
    primary_cfg,
    run_nuts: Optional[Callable],
    nuts_cfg,
    *runner_args,
    primary_name: str = "hmc",
    rhat_max: float = DEFAULT_RHAT_MAX,
    ess_min: float = DEFAULT_ESS_MIN,
) -> EvalRun:
    """Run ``run_primary(key, *runner_args, cfg)``; on failed diagnostics
    re-run with ``run_nuts`` (same key — the escalation is a sampler change,
    not a reseed) and record the NUTS numbers.

    Both runners share the weighted-chains signature
    ``runner(key, Z, w, theta0, n_chains, cfg) -> (chains, stats)`` (any
    ``runner_args`` are passed through, with the config appended last).
    When the primary IS NUTS (``run_nuts is None`` or ``primary_name ==
    'nuts'``) there is nothing to escalate to: diagnostics are still
    checked and recorded, but the primary's draws are returned either way.
    """
    chains, stats = run_primary(key, *runner_args, primary_cfg)
    summary = summarize_chains(chains)
    reason = diagnostics_failed(summary, stats, rhat_max=rhat_max,
                                ess_min=ess_min)
    if not reason or run_nuts is None or primary_name == "nuts":
        return EvalRun(chains, stats, summary, primary_name, False, reason)
    chains, stats = run_nuts(key, *runner_args, nuts_cfg)
    summary = summarize_chains(chains)
    return EvalRun(chains, stats, summary, "nuts", True, reason)


def default_nuts_config(mcmc_samples: int, mcmc_warmup: int):
    """The escalation target's configuration, matched to the reference's
    PyStan call (mcmc.py:56: adapt_delta=0.9 -> target_accept=0.9;
    max_treedepth capped at 10 — Stan's own default — rather than the
    reference's 15, which on these logconcave-ish posteriors is never
    reached and only inflates the static while_loop bound under jit)."""
    from .nuts import NUTSConfig

    return NUTSConfig(n_samples=mcmc_samples, n_warmup=mcmc_warmup,
                      max_treedepth=10, target_accept=0.9)
