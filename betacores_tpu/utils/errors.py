"""Numerical-robustness machinery.

The reference library's signature failure-detection contract (reference:
bayesiancoresets/util/errors.py:1-2, snnls/snnls.py:40-78) is a
``NumericalPrecisionError`` raised on non-monotone error decrease or
degenerate geometry, caught by build loops which revert state, stabilize,
retry once, then latch ``reached_numeric_limit``.

Under ``jax.jit`` exceptions cannot cross traced code, so the jitted core
uses integer *status codes* threaded through the solver state; the eager
object wrappers translate a latched status back into the exception type for
API parity.
"""

from __future__ import annotations

# Global numeric tolerance, mirrors reference bayesiancoresets/util/__init__.py:4-7.
TOL = 1e-12


def set_tolerance(tol: float) -> None:
    global TOL
    TOL = tol


def get_tolerance() -> float:
    return TOL


class NumericalPrecisionError(Exception):
    """Raised (eager paths only) when a numeric-precision limit is reached."""


# Status codes carried through jitted solver state.
STATUS_OK = 0
# One step failed; the solver stabilized and will retry (transient).
STATUS_RETRYING = 1
# Two consecutive failures: numeric limit latched; no more growth.
STATUS_NUMERIC_LIMIT = 2

STATUS_NAMES = {
    STATUS_OK: "ok",
    STATUS_RETRYING: "retrying",
    STATUS_NUMERIC_LIMIT: "numeric_limit",
}
