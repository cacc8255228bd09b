"""Coreset-state checkpoint / resume.

The reference has no coreset checkpointing; its resumability comes from
``build(itrs, sz)`` growing existing state plus results pickles whose
filenames encode the config (SURVEY.md section 5). Here coreset state —
including the PRNG position and the sampler warm-start — serializes with
orbax, so a build can be stopped and resumed bit-exactly, and the
config-encoding filename pattern is kept as a helper.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np

from ..coresets.state import CoresetState


def config_tag(cfg: Dict[str, Any]) -> str:
    """Reference-style config-encoding filename fragment
    (zellner_neural_linear/main.py:212: results_<d>_<alg>_frate_<f>_...)."""
    return "_".join(f"{k}_{v}" for k, v in sorted(cfg.items()))


def save_state(path: str, state: CoresetState, key: jax.Array | None = None,
               extra: Dict[str, Any] | None = None) -> None:
    """Serialize a CoresetState (+ optional PRNG key / metadata) with orbax."""
    import orbax.checkpoint as ocp

    payload = {"state": state._asdict()}
    if key is not None:
        payload["key"] = jax.random.key_data(key)
    if extra:
        payload["extra"] = extra
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)


def load_state(path: str):
    """Returns (CoresetState, key-or-None, extra dict)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    st = CoresetState(**payload["state"])
    key = None
    if "key" in payload and payload["key"] is not None:
        key = jax.random.wrap_key_data(np.asarray(payload["key"]))
    return st, key, payload.get("extra", {})


def save_params(path: str, params, extra: Dict[str, Any] | None = None) -> None:
    """Serialize any NamedTuple parameter bundle (e.g. an SHFParams flow)
    with orbax; restore with ``load_params(path, type(params))``."""
    import orbax.checkpoint as ocp

    payload = {"params": dict(params._asdict())}
    if extra:
        payload["extra"] = extra
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), payload, force=True)


def load_params(path: str, cls):
    """Returns (cls(**fields), extra dict)."""
    import orbax.checkpoint as ocp

    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    return cls(**payload["params"]), payload.get("extra", {})
