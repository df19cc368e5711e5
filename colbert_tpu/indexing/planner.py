"""Index planning: sampling sizes, partition counts, chunk layout.

Reference formulas reproduced exactly (they define index geometry parity):
  - ``_sample_pids``: ``min(1 + floor(16·sqrt(120·N)), N)`` sampled pids
    (collection_indexer.jl:17-24),
  - heldout split: ``min(50k, 5%)`` of the sampled embeddings
    (collection_indexer.jl:81-91),
  - ``setup``: ``num_partitions = min(num_sample_embs,
    2^floor(log2(16·sqrt(num_embeddings_est))))``,
    ``num_chunks = ceil(N / chunksize)``, default ``chunksize =
    min(25000, 1 + N ÷ nranks)`` (collection_indexer.jl:115-139).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

__all__ = ["sample_pids", "heldout_split", "heldout_split_indices", "setup_plan"]


def sample_pids(num_documents: int, rng: np.random.Generator) -> np.ndarray:
    """Sampled passage ids (0-based, sorted, unique)."""
    typical_doclen = 120
    num_sampled = 16 * math.sqrt(typical_doclen * num_documents)
    num_sampled = int(min(1 + math.floor(num_sampled), num_documents))
    pids = rng.choice(num_documents, size=num_sampled, replace=False)
    return np.sort(pids)


def heldout_split_indices(
    n: int, rng: np.random.Generator, *, heldout_fraction: float = 0.05
) -> Tuple[np.ndarray, np.ndarray]:
    """Shuffled (train_idx, heldout_idx) positions with min(50k, fraction)
    held out (reference: collection_indexer.jl:81-91). Index-only variant so
    the builder can split a device-resident sample without gathering rows."""
    perm = rng.permutation(n)
    num_heldout = int(min(50_000, max(1, round(heldout_fraction * n))))
    return perm[num_heldout:], perm[:num_heldout]


def heldout_split(
    sample: np.ndarray, rng: np.random.Generator, *, heldout_fraction: float = 0.05
) -> Tuple[np.ndarray, np.ndarray]:
    """Shuffle embeddings rows and split off min(50k, fraction) as heldout."""
    train_idx, heldout_idx = heldout_split_indices(
        sample.shape[0], rng, heldout_fraction=heldout_fraction
    )
    return sample[train_idx], sample[heldout_idx]


def setup_plan(
    num_documents: int,
    avg_doclen_est: float,
    num_clustering_embs: int,
    chunksize: int | None,
    nranks: int,
) -> dict:
    """The indexing plan dict (persisted as plan.json)."""
    if chunksize is None:
        chunksize = min(25_000, 1 + num_documents // max(1, nranks))
    num_chunks = -(-num_documents // chunksize)
    num_embeddings_est = num_documents * avg_doclen_est
    num_partitions = int(
        min(
            num_clustering_embs,
            2 ** math.floor(math.log2(16 * math.sqrt(max(1.0, num_embeddings_est)))),
        )
    )
    return {
        "chunksize": int(chunksize),
        "num_chunks": int(num_chunks),
        "num_partitions": num_partitions,
        "num_documents": int(num_documents),
        "num_embeddings_est": float(num_embeddings_est),
        "avg_doclen_est": float(avg_doclen_est),
    }
