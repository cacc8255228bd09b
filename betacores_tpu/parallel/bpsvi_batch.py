"""Mesh-sharded batch of BPSVI builds.

The reference builds the BPSVI coreset for every size m=1..M in a
100-process ``multiprocessing.Pool`` (zellner_logreg/main.py:177-179).
Single-device, this framework replaces the pool with one vmapped
optimization over sizes (``coresets.bpsvi.bpsvi_build_batch``). Across a
mesh, those lanes are embarrassingly parallel — exactly the pool's
parallelism axis — so here the lane axis is sharded over ALL mesh devices
(data and samp axes combined) and GSPMD splits the vmapped program with no
collectives at all: each device runs its lanes' full (w, pts) joint Adam
locally against a replicated dataset.

Per-lane math is identical to the single-device batch (sharding a batch
axis never changes values), verified by the exact-equality test.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..coresets.bpsvi import BPSVIConfig, make_bpsvi_builder
from .mesh import DATA_AXIS, SAMP_AXIS, require_axes


def make_sharded_bpsvi_batch(data: jnp.ndarray, model, sampler: Callable,
                             config: BPSVIConfig, mesh) -> Callable:
    """Returns ``batch(key, sizes, max_size, aux0) -> (wts, pts, idcs)`` with
    the lane (size) axis sharded over every device of ``mesh`` and the
    dataset replicated. Lane counts are padded up to a device multiple with
    dummy size-1 lanes, dropped before returning."""
    n_data, n_samp = require_axes(mesh)
    n_dev = n_data * n_samp
    data = jax.device_put(jnp.asarray(data), NamedSharding(mesh, P(None, None)))
    builder = make_bpsvi_builder(data, model, sampler, config)
    lane_sharding = NamedSharding(mesh, P((DATA_AXIS, SAMP_AXIS)))

    def batch(key: jax.Array, sizes, max_size: int, aux0) -> Tuple:
        sizes = np.asarray(sizes, dtype=np.int32)
        L = sizes.shape[0]
        pad = (-L) % n_dev
        sizes_p = np.concatenate([sizes, np.ones(pad, dtype=np.int32)])
        # true lanes get the same split keys as the single-device
        # bpsvi_build_batch, so lane i matches it exactly; dummy padding
        # lanes get independent fold_in keys (their output is dropped)
        keys = jax.random.split(key, L)
        if pad:
            keys = jnp.concatenate(
                [keys, jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(pad))])
        masks = jnp.arange(max_size)[None, :] < jnp.asarray(sizes_p)[:, None]
        keys = jax.device_put(keys, lane_sharding)
        masks = jax.device_put(masks, lane_sharding)
        wts, pts, idcs = jax.vmap(lambda k, m: builder(k, max_size, aux0, m))(keys, masks)
        return wts[:L], pts[:L], idcs[:L]

    return batch
