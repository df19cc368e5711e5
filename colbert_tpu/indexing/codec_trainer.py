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

__all__ = ["train_codec"]


def train_codec(
    sample: np.ndarray,
    heldout: np.ndarray,
    *,
    num_partitions: int,
    nbits: int,
    kmeans_niters: int = 20,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """-> (centroids (k, dim), bucket_cutoffs, bucket_weights, avg_residual)."""
    result = kmeans_ops.kmeans(
        jnp.asarray(sample), num_partitions, niters=kmeans_niters, seed=seed
    )
    centroids = result.centroids
    codes = codec_ops.compress_into_codes(jnp.asarray(heldout), centroids)
    residuals = jnp.asarray(heldout) - centroids[np.asarray(codes).astype(np.int64)]
    cutoffs, weights, avg = codec_ops.bucket_cutoffs_and_weights(nbits, residuals)
    return (
        np.asarray(centroids),
        np.asarray(cutoffs),
        np.asarray(weights),
        float(avg),
    )
