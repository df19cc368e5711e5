"""Codec training: k-means centroids + residual bucket statistics.

Reference: collection_indexer.jl:219-237 ``train`` and :177-195
``_compute_avg_residuals!``. One device round: k-means over the sample, code
the heldout split, quantile cutoffs/weights from the heldout residuals.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from colbert_tpu.ops import codec as codec_ops
from colbert_tpu.ops import kmeans as kmeans_ops

__all__ = ["train_codec", "sample_bucket_step"]


def sample_bucket_step(n: int) -> int:
    """Row-count bucket granularity for codec-training samples: next
    multiple of ~n/16 (min 4096). THE single source of truth — the encoder
    preallocates its device buffer at this granularity so ``_bucket_rows``
    never needs a second full-sample pad copy (HBM-fatal at 1M-passage
    sample sizes)."""
    return max(4096, 1 << max(0, (n - 1).bit_length() - 4))


def train_codec(
    sample,
    heldout,
    *,
    num_partitions: int,
    nbits: int,
    kmeans_niters: int = 20,
    seed: int = 0,
    sample_weights=None,
    init_idx=None,
    mesh=None,
    tol: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, float]:
    """-> (centroids (k, dim), bucket_cutoffs, bucket_weights, avg_residual).

    Inputs may be host or device arrays; everything runs on device and the
    returned arrays stay there (only ``avg_residual`` is a host float) — the
    builder ships them straight into the fused encode+compress chunk loop.
    ``sample_weights``/``init_idx`` support padded device-resident samples
    (invalid rows weighted 0; init rows chosen from the valid subset).

    With ``mesh``, Lloyd statistics are psum'd over the data axis
    (:mod:`colbert_tpu.parallel.kmeans_dist`) and the bucket quantiles use
    the distributed histogram quantile (:mod:`colbert_tpu.ops.quantile`) —
    no single device ever holds the full sample.
    """
    if mesh is not None:
        return _train_codec_sharded(
            sample, heldout, mesh, num_partitions=num_partitions, nbits=nbits,
            kmeans_niters=kmeans_niters, seed=seed,
            sample_weights=sample_weights, init_idx=init_idx, tol=tol,
        )
    # bucket the sample row count so the Lloyd/quantile program shapes recur
    # across corpora (every distinct sample size is otherwise a fresh XLA
    # compile — measured ~60s at 7M rows); padding rows carry zero weight
    sample, sample_weights = _bucket_rows(sample, sample_weights)
    result = kmeans_ops.kmeans(
        jnp.asarray(sample),
        num_partitions,
        niters=kmeans_niters,
        seed=seed,
        compute_assignments=False,
        weights=None if sample_weights is None else jnp.asarray(sample_weights),
        init_idx=init_idx,
    )
    centroids = result.centroids
    heldout = jnp.asarray(heldout)
    codes = codec_ops.compress_into_codes(heldout, centroids)
    residuals = heldout - centroids[codes.astype(jnp.int32)]
    cutoffs, weights, avg = codec_ops.bucket_cutoffs_and_weights(nbits, residuals)
    return centroids, cutoffs, weights, float(avg)


def _bucket_rows(sample, weights, *, bucket_frac: float = 1 / 16):
    """Pad rows to a coarse geometric bucket (next multiple of n/16, min 4096)
    so jitted-program shapes recur; padding rows get zero weight. The input
    dtype is preserved (the builder ships bf16 samples to halve HBM)."""
    sample = jnp.asarray(sample)
    n = sample.shape[0]
    step = sample_bucket_step(n)
    padded = -(-n // step) * step
    if padded == n and weights is not None:
        return sample, jnp.asarray(weights)
    w = (
        jnp.ones((n,), jnp.float32) if weights is None
        else jnp.asarray(weights, jnp.float32)
    )
    if padded != n:
        sample = jnp.pad(sample, ((0, padded - n), (0, 0)))
        w = jnp.pad(w, (0, padded - n))
    return sample, w


def _train_codec_sharded(
    sample, heldout, mesh, *, num_partitions, nbits, kmeans_niters, seed,
    sample_weights, init_idx, tol,
):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from colbert_tpu.ops.quantile import sharded_quantiles
    from colbert_tpu.parallel.kmeans_dist import _sharded_step_fn

    ndev = mesh.shape["data"]
    data = jnp.asarray(sample)  # dtype preserved (bf16 samples halve HBM)
    n, dim = data.shape
    weights = (
        jnp.ones((n,), jnp.float32) if sample_weights is None
        else jnp.asarray(sample_weights, jnp.float32)
    )
    padded = -(-n // ndev) * ndev
    if padded != n:
        data = jnp.pad(data, ((0, padded - n), (0, 0)))
        weights = jnp.pad(weights, (0, padded - n))
    dsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    data = jax.device_put(data, dsh)
    weights = jax.device_put(weights, dsh)

    if init_idx is None:
        key = jax.random.PRNGKey(seed)
        init_idx = jax.random.permutation(key, n)[:num_partitions]
    centroids = jax.device_put(data[jnp.asarray(init_idx)], repl)

    step = _sharded_step_fn(mesh, num_partitions, 1024)
    # convergence is checked only every few iterations: each host read of the
    # shift scalar is a device round-trip (~25-50ms on the tunneled chip, ×20
    # iters it dominates the fit — see ops/kmeans._kmeans_fused), and the
    # un-read steps pipeline asynchronously. Early exit lands within
    # (sync_every - 1) extra iterations of the reference's per-iter check.
    sync_every = 5
    for it in range(1, kmeans_niters + 1):
        centroids, shift = step(data, centroids, weights)
        if (it % sync_every == 0 or it == kmeans_niters) and float(shift) < tol:
            break

    heldout = jax.device_put(jnp.asarray(heldout, jnp.float32), repl)
    codes = codec_ops.compress_into_codes(heldout, centroids)
    residuals = heldout - centroids[codes.astype(jnp.int32)]

    # distributed quantiles over the (row-sharded) heldout residuals —
    # cutoffs and weights come from ONE histogram pass (qs are arbitrary)
    num_options = 1 << nbits
    base = np.arange(num_options, dtype=np.float64) / num_options
    m = residuals.shape[0]
    m_pad = -(-m // ndev) * ndev
    w_h = jnp.pad(jnp.ones((m,), jnp.float32), (0, m_pad - m))
    res_pad = jnp.pad(residuals, ((0, m_pad - m), (0, 0)))
    qs = np.concatenate([base[1:], base + 0.5 / num_options]).astype(np.float32)
    values, avg = sharded_quantiles(res_pad, qs, mesh, weights=w_h)
    cutoffs = values[: num_options - 1]
    bweights = values[num_options - 1:]
    return (
        centroids,
        cutoffs.astype(jnp.float32),
        bweights.astype(jnp.float32),
        float(avg),
    )
