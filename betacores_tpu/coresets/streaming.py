"""Streaming coreset construction by merge-reduce (beyond reference).

The reference (and our headline path) assumes the dataset fits next to the
build on one device. For datasets beyond HBM — or data arriving in chunks —
the classical merge-reduce composition applies: build an m_leaf-point
coreset of every chunk, then summarize the UNION OF WEIGHTED LEAF POINTS
with one final m_final-point build. The final build's residual target
``sum_j u_j v_j`` (u_j = leaf weights) is an unbiased sparse surrogate of
the full-data tangent vector ``sum_n v_n``, because each leaf build made
``sum_i w_i v_i ~= sum_{n in chunk} v_n`` in the same tangent space — so
the composition inherits the per-level approximation guarantees (merge &
reduce in the coreset literature; Feldman et al.).

TPU mapping:
  * every chunk is padded to one static shape, so ALL leaf builds share ONE
    compiled XLA program (the builder takes data + base-weights as jit
    arguments — incremental.py::_bind);
  * ``parallel_leaves=True`` vmaps the leaf builds into a single batched
    device program (chunks must then fit on-device together; right when
    you're sharding work, not memory);
  * ``parallel_leaves=False`` (default) streams chunks host->device one at
    a time: peak device memory is ONE chunk + the leaf coresets —
    the out-of-core path;
  * padding rows carry base weight 0: they contribute nothing to the
    residual target and are masked out of selection
    (incremental.py::_select), so padding is exact, not approximate.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .incremental import IncrementalConfig, make_incremental_builder
from .state import CoresetState, init_state


def merge_reduce_build(
    key: jax.Array,
    data,
    model,
    sampler: Callable,
    leaf_config: IncrementalConfig,
    final_config: IncrementalConfig,
    chunk_size: int,
    m_leaf: int,
    m_final: int,
    st_leaf: CoresetState,
    st_final: Optional[CoresetState] = None,
    parallel_leaves: bool = False,
    mesh=None,
) -> Tuple[CoresetState, jnp.ndarray, jnp.ndarray]:
    """Merge-reduce build: K = ceil(N / chunk_size) leaf builds of m_leaf
    points each, then one final weighted build of m_final points over the
    K x M_buf_leaf leaf slots.

    ``data`` may be a host (numpy) array — with ``parallel_leaves=False``
    chunks are transferred one at a time. ``st_leaf`` is the leaf state
    template (init_state(M_buf, d, ...)); ``st_final`` defaults to a fresh
    state with the same buffer size sized for m_final. Returns
    ``(final_state, leaf_pts, leaf_wts)`` where leaf_pts/leaf_wts are the
    (K * M_buf_leaf, ...) union fed to the final build (zero weight in
    unused slots).

    ``mesh`` (implies ``parallel_leaves``) shards the LEAF axis over the
    mesh's data axis: leaf builds are independent, so the vmapped program
    partitions with ZERO collectives — the natural multi-chip shape for
    streaming summarization (each chip builds its chunks' coresets; only
    the tiny (K*M_buf, D) leaf union is gathered for the final build). K is
    padded up to a multiple of the data-axis size with all-zero-weight
    chunks, whose leaf weights provably come out zero (zero target, zero
    gradient); the pad lanes are sliced off before the final build, so the
    returned union shape and the final coreset are mesh-shape independent."""
    N, D = data.shape
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    K = math.ceil(N / chunk_size)
    dtype = st_leaf.wts.dtype

    # host-side template: the builder only reads shape/dtype from it (leaves
    # run through build_with_data), so never park a chunk-sized dummy in HBM
    builder = make_incremental_builder(
        np.zeros((chunk_size, D), dtype=dtype), model, sampler, leaf_config)

    if mesh is not None:
        parallel_leaves = True
        from ..parallel.mesh import DATA_AXIS
        n_lanes = mesh.shape[DATA_AXIS]
        K_pad = math.ceil(K / n_lanes) * n_lanes
    else:
        K_pad = K

    all_keys = jax.random.split(key, K + 1)
    final_key = all_keys[K]
    # pad chunks (mesh lane rounding) are all-zero-weight: their build
    # result is inert whatever key they get, so reuse key 0 — the real-leaf
    # key stream (and thus the result) is independent of the lane count
    leaf_keys = all_keys[np.concatenate(
        [np.arange(K), np.zeros(K_pad - K, dtype=np.int64)])]
    if parallel_leaves:
        # assemble the padded chunk tensor ON HOST: device_put from a numpy
        # array lands each shard directly on its lane — materializing the
        # padded dataset on the default device first would cap N at one
        # chip's HBM, defeating the mesh scale-out
        pad = K_pad * chunk_size - N
        dh = np.asarray(data, dtype=dtype)
        chunks = np.concatenate(
            [dh, np.broadcast_to(dh[:1], (pad, D))]).reshape(K_pad, chunk_size, D)
        uc = np.concatenate(
            [np.ones(N, dtype=dtype),
             np.zeros(pad, dtype=dtype)]).reshape(K_pad, chunk_size)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            chunks = jax.device_put(chunks, NamedSharding(mesh, P(DATA_AXIS, None, None)))
            uc = jax.device_put(uc, NamedSharding(mesh, P(DATA_AXIS, None)))
            kv = jax.device_put(leaf_keys[:K_pad], NamedSharding(mesh, P(DATA_AXIS)))
        else:
            chunks, uc = jnp.asarray(chunks), jnp.asarray(uc)
            kv = leaf_keys[:K_pad]
        sts = jax.vmap(
            lambda d, u, k: builder.build_with_data(d, u, k, st_leaf, m_leaf)
        )(chunks, uc, kv)
        # pad lanes (K..K_pad) are provably all-zero-weight; slice them off
        # so the returned union honors the (K * M_buf_leaf, ...) contract
        # regardless of mesh shape, and every path feeds the final build the
        # same-shaped problem
        leaf_wts = jnp.reshape(sts.wts, (-1,))[: K * sts.wts.shape[1]]
        leaf_pts = jnp.reshape(sts.pts, (-1, D))[: K * sts.wts.shape[1]]
        if mesh is not None:
            # gather the tiny leaf union off the lanes: the final build is a
            # single replicated program, not a lane-partitioned one
            from jax.sharding import NamedSharding, PartitionSpec as P
            leaf_wts = jax.device_put(leaf_wts, NamedSharding(mesh, P()))
            leaf_pts = jax.device_put(leaf_pts, NamedSharding(mesh, P()))
    else:
        wts_list, pts_list = [], []
        data = np.asarray(data)
        for i in range(K):
            chunk = data[i * chunk_size:(i + 1) * chunk_size]
            n_i = chunk.shape[0]
            u_i = np.ones(chunk_size)
            if n_i < chunk_size:  # tail chunk: pad rows carry zero weight
                u_i[n_i:] = 0.0
                chunk = np.concatenate(
                    [chunk, np.broadcast_to(chunk[:1], (chunk_size - n_i, D))])
            st_i = builder.build_with_data(
                jnp.asarray(chunk, dtype=dtype), jnp.asarray(u_i, dtype=dtype),
                leaf_keys[i], st_leaf, m_leaf)
            wts_list.append(st_i.wts)
            pts_list.append(st_i.pts)
        leaf_wts = jnp.concatenate(wts_list)
        leaf_pts = jnp.concatenate(pts_list)

    if st_final is None:
        st_final = init_state(m_final, D, beta=float(st_leaf.beta), dtype=dtype)
        st_final = st_final._replace(sampler_aux=st_leaf.sampler_aux)

    final_builder = make_incremental_builder(
        leaf_pts, model, sampler, final_config, data_weights=leaf_wts)
    final_state = final_builder.build(final_key, st_final, m_final)
    return final_state, leaf_pts, leaf_wts
