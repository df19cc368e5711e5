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
    sample,
    heldout,
    *,
    num_partitions: int,
    nbits: int,
    kmeans_niters: int = 20,
    seed: int = 0,
    sample_weights=None,
    init_idx=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, float]:
    """-> (centroids (k, dim), bucket_cutoffs, bucket_weights, avg_residual).

    Inputs may be host or device arrays; everything runs on device and the
    returned arrays stay there (only ``avg_residual`` is a host float) — the
    builder ships them straight into the fused encode+compress chunk loop.
    ``sample_weights``/``init_idx`` support padded device-resident samples
    (invalid rows weighted 0; init rows chosen from the valid subset).
    """
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
