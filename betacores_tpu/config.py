"""Experiment configuration and sweep grids.

Replaces the reference's positional sys.argv CLIs + bash cartesian sweeps +
``linearize()`` index maps (reference zellner_logreg/main.py:15-21,
zellner_neural_linear/main.py:11-26, run.sh files) with dataclass configs
and a grid enumerator for cluster array jobs.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Dict, List, Sequence, Tuple


def linearize(grid: Dict[str, Sequence[Any]]) -> List[Dict[str, Any]]:
    """Enumerate a {name: values} grid into an index -> config-dict list
    (the reference's ``linearize``, zellner_neural_linear/main.py:11-26)."""
    keys = list(grid)
    return [dict(zip(keys, vals)) for vals in itertools.product(*(grid[k] for k in keys))]


@dataclasses.dataclass
class BuildConfig:
    """Shared coreset-build knobs (reference zellner_logreg/main.py:113-127)."""

    M: int = 100                     # max coreset size
    projection_dim: int = 100        # S
    opt_itrs: int = 500
    n_subsample_select: int = 1000
    n_subsample_opt: int = 200
    i0: float = 1.0                  # lr schedule i0/(1+i)
    beta: float = 0.1
    learn_beta: bool = False
    f_rate: float = 0.1              # corruption rate
    trial: int = 1                   # seed

    def step_sched(self):
        return lambda i: self.i0 / (1.0 + i)
