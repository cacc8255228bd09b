"""NumPy float64 oracle.

A clean-room, eager reimplementation of the framework's math used as golden
ground truth in tests (the reference repo itself cannot be imported — see
SURVEY.md section 0). Everything here is deterministic given its inputs:
randomness (subsampling, posterior draws) is injected by the caller, so the
oracle and the jitted JAX implementations can be driven down identical
trajectories and compared to tight tolerances.
"""

from . import models, opt, snnls, coresets  # noqa: F401
