"""Device-mesh helpers.

The framework's parallel axes (SURVEY.md sections 2.5/5):
  * ``data`` — shards the dataset dimension N (the scalable axis): local
    candidate scoring + distributed greedy argmax, psum for Sigma-over-N
    residual terms. The coreset-library analogue of DP.
  * ``samp`` — shards the posterior-sample dimension S of the projection
    matrices: inner products over S become psum('samp'). The analogue of
    TP/SP for this workload (the hidden axis of every matmul).
TP/PP/EP in the NN-training sense have no counterpart here: there is no
layer stack or expert routing; the model state (d-dim posterior) is tiny
and replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SAMP_AXIS = "samp"


def require_axes(mesh: Mesh) -> Tuple[int, int]:
    """Validate the framework's mesh contract and return
    (data-axis size, samp-axis size) with a descriptive error (a bare
    KeyError from mesh.shape would not say how to build a valid mesh)."""
    if DATA_AXIS not in mesh.shape or SAMP_AXIS not in mesh.shape:
        raise ValueError(
            f"mesh must have axes ('{DATA_AXIS}', '{SAMP_AXIS}') — use "
            f"parallel.make_mesh(n_data, n_samp) (n_samp=1 is fine); got {dict(mesh.shape)}")
    return mesh.shape[DATA_AXIS], mesh.shape[SAMP_AXIS]


def make_mesh(n_data: int, n_samp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())[: n_data * n_samp]
    if len(devices) != n_data * n_samp:
        raise ValueError(f"need {n_data * n_samp} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(n_data, n_samp)
    return Mesh(arr, (DATA_AXIS, SAMP_AXIS))


def auto_mesh_shape(n_devices: int) -> Tuple[int, int]:
    """Favor the data axis; give the sample axis a factor of 2 when even."""
    if n_devices % 2 == 0 and n_devices > 2:
        return n_devices // 2, 2
    return n_devices, 1


def shard_data(data, mesh: Mesh):
    """Place an (N, D) array row-sharded over the data axis, replicated over
    samp. Pads N up to a multiple of the data-axis size with zero rows
    (zero-weight rows are inert in every reduction)."""
    import jax.numpy as jnp

    n_data = mesh.shape[DATA_AXIS]
    N = data.shape[0]
    pad = (-N) % n_data
    if pad:
        data = jnp.concatenate([data, jnp.zeros((pad, data.shape[1]), dtype=data.dtype)])
    return jax.device_put(data, NamedSharding(mesh, P(DATA_AXIS, None))), N


def shard_weights(u, mesh: Mesh):
    """Place an (N,) base-data weight vector row-sharded over the data axis,
    replicated over samp, padded with ZEROS to the same length ``shard_data``
    pads the rows to — zero-weight rows are masked out of both the target sum
    and the candidate argmax by the weighted builders."""
    import jax.numpy as jnp

    n_data = mesh.shape[DATA_AXIS]
    N = u.shape[0]
    pad = (-N) % n_data
    if pad:
        u = jnp.concatenate([u, jnp.zeros((pad,), dtype=u.dtype)])
    return jax.device_put(u, NamedSharding(mesh, P(DATA_AXIS)))
