"""Sharded k-means: Lloyd's over a data-parallel mesh.

SURVEY §2's TPU-native replacement table: per-device partial (centroid-sum,
count) statistics + ``psum`` over the data axis; centroids stay replicated.
Implemented with ``jax.shard_map`` so the collective placement is explicit
(one psum pair per iteration — bytes ∝ k·dim, independent of data size).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from colbert_tpu.ops import kmeans as kmeans_ops
from colbert_tpu.ops.kmeans import KMeansResult

__all__ = ["kmeans_sharded", "lloyd_step_sharded", "assign_clusters_sharded"]


@functools.lru_cache(maxsize=32)
def _sharded_step_fn(mesh: Mesh, k: int, bsize: int):
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data"), P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(data_local, centroids, weights_local):
        sums, counts = kmeans_ops.lloyd_stats(
            data_local, centroids, k=k, bsize=bsize, weights=weights_local
        )
        sums = jax.lax.psum(sums, "data")
        counts = jax.lax.psum(counts, "data")
        new = kmeans_ops.centroids_from_stats(sums, counts, centroids)
        shift = jnp.max(jnp.abs(new - centroids.astype(jnp.float32)))
        return new, shift

    return jax.jit(step)


def lloyd_step_sharded(
    data: jax.Array, centroids: jax.Array, weights: jax.Array, mesh: Mesh,
    *, k: int, bsize: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """One sharded Lloyd iteration. ``data``/``weights`` rows must divide the
    data-axis size (pad + zero-weight the tail)."""
    return _sharded_step_fn(mesh, k, bsize)(data, centroids, weights)


@functools.lru_cache(maxsize=32)
def _sharded_assign_fn(mesh: Mesh, bsize: int):
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P("data"), P()), out_specs=P("data"), check_vma=False
    )
    def assign(data_local, cents):
        return kmeans_ops.assign_clusters(data_local, cents, bsize=bsize)

    return jax.jit(assign)


def assign_clusters_sharded(
    data: jax.Array, centroids: jax.Array, mesh: Mesh, *, bsize: int = 1024
) -> jax.Array:
    """Sharded cluster assignment (jit + shard_map cached per mesh/bsize —
    repeat calls reuse one compiled program, no per-call retrace)."""
    return _sharded_assign_fn(mesh, bsize)(data, centroids)


def kmeans_sharded(
    data: np.ndarray,
    k: int,
    mesh: Mesh,
    *,
    niters: int = 20,
    tol: float = 1e-4,
    seed: int = 0,
    bsize: int = 1024,
) -> KMeansResult:
    """Full sharded k-means fit over ``mesh``'s data axis.

    Matches :func:`colbert_tpu.ops.kmeans.kmeans` semantics (same init, same
    convergence rule); the data is padded to the data-axis size with
    zero-weight rows and placed sharded on device once.
    """
    from colbert_tpu.parallel import launch

    n, dim = data.shape
    ndev = mesh.shape["data"]
    if k > n:
        raise ValueError(f"k={k} > number of points n={n}")
    padded = -(-n // ndev) * ndev
    weights_np = np.zeros((padded,), np.float32)
    weights_np[:n] = 1.0
    data_np = np.zeros((padded, dim), np.float32)
    data_np[:n] = data

    # multi-controller safe placement (launch helpers fall back to plain
    # device_put in single-process runs)
    data_sh = launch.put_data_sharded(data_np, mesh)
    weights_sh = launch.put_data_sharded(weights_np, mesh)

    key = jax.random.PRNGKey(seed)
    idx = np.asarray(jax.random.permutation(key, n)[:k])
    centroids = launch.put_replicated(
        np.asarray(data[idx], np.float32), mesh
    )

    step = _sharded_step_fn(mesh, k, bsize)
    shift = float("inf")
    it = 0
    for it in range(1, niters + 1):
        centroids, shift_arr = step(data_sh, centroids, weights_sh)
        shift = float(shift_arr)
        if shift < tol:
            break
    assignments = assign_clusters_sharded(data_sh, centroids, mesh, bsize=bsize)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        assignments_np = multihost_utils.process_allgather(
            assignments, tiled=True
        )
    else:
        assignments_np = np.asarray(assignments)
    return KMeansResult(centroids, assignments_np[:n], it, shift)
