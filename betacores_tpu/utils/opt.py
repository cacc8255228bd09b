"""Projected Adam optimizers, jit-compiled.

Reimplements the reference's weight-refinement optimizers (reference:
bayesiancoresets/util/opt.py:36-77 ``nn_opt`` / ``partial_nn_opt``) as a
single ``lax.scan`` with identical update semantics:

    m1 <- b1*m1 + (1-b1)*g
    m2 <- b2*m2 + (1-b2)*g^2
    x  <- x - lr_i * m1hat / (eps + sqrt(m2hat))        (bias-corrected)
    x  <- max(x, 0) on the non-negatively-constrained coordinates

Differences from the reference, by design:
  * the gradient callback is pure and receives an explicit PRNG key (the
    reference's callbacks draw fresh Monte-Carlo posterior samples from the
    global numpy stream every step — reference coreset/bcores.py:142-146);
  * an auxiliary carry threads warm-start state (e.g. the Laplace mode)
    across steps so samplers don't restart from scratch;
  * the whole optimization is one compiled scan: no Python-loop overhead.
"""

from __future__ import annotations

from typing import Callable, Tuple, TypeVar

import jax
import jax.numpy as jnp

Aux = TypeVar("Aux")

GradFn = Callable[[jnp.ndarray, Aux, jax.Array], Tuple[jnp.ndarray, Aux]]


def step_schedule(i0: float, n_steps: int, dtype=jnp.float32) -> jnp.ndarray:
    """The reference's default learning-rate schedule lr_i = i0 / (1 + i)
    (reference: examples/zellner_gaussian/main.py:29-31)."""
    return (i0 / (1.0 + jnp.arange(n_steps, dtype=dtype))).astype(dtype)


def nn_adam(
    x0: jnp.ndarray,
    grad_fn: GradFn,
    aux0: Aux,
    key: jax.Array,
    step_sizes: jnp.ndarray,
    nn_mask: jnp.ndarray | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    xs=None,
) -> Tuple[jnp.ndarray, Aux]:
    """Projected Adam. ``nn_mask`` selects coordinates clipped to >= 0
    (None = all coordinates, matching ``nn_opt``; a boolean mask gives
    ``partial_nn_opt`` used by BPSVI to keep weights non-negative while
    point locations stay free).

    ``xs`` (optional) is a pytree of per-step inputs with leading dimension
    ``n_steps``; when given, ``grad_fn`` is called as
    ``grad_fn(x, aux, k, xs_i)`` with step i's slice. Builders use this to
    feed pre-drawn posterior noise / pre-gathered data subsamples into the
    loop (one batched kernel outside instead of one per step — the builds
    are latency-bound). The per-step keys are unchanged, so a callback that
    ignores ``xs_i`` sees the exact previous behavior."""
    n_steps = step_sizes.shape[0]
    mask = jnp.ones_like(x0, dtype=bool) if nn_mask is None else nn_mask

    def body(carry, inp):
        x, m1, m2, aux = carry
        lr, k, i, xsl = inp
        g, aux = grad_fn(x, aux, k) if xs is None else grad_fn(x, aux, k, xsl)
        g = g.astype(x.dtype)  # keep the scan carry dtype stable under mixed-precision callbacks
        m1 = b1 * m1 + (1.0 - b1) * g
        m2 = b2 * m2 + (1.0 - b2) * g * g
        t = i + 1.0
        m1hat = m1 / (1.0 - b1**t)
        m2hat = m2 / (1.0 - b2**t)
        x = x - lr * m1hat / (eps + jnp.sqrt(m2hat))
        x = jnp.where(mask, jnp.maximum(x, 0.0), x)
        return (x, m1, m2, aux), None

    keys = jax.random.split(key, n_steps)
    steps = jnp.arange(n_steps, dtype=x0.dtype)
    init = (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), aux0)
    zeros = jnp.zeros((n_steps,), dtype=x0.dtype)  # placeholder when xs is None
    (x, _, _, aux), _ = jax.lax.scan(
        body, init, (step_sizes, keys, steps, xs if xs is not None else zeros))
    return x, aux
