"""Exact-codec oracle: decompress+MaxSim EVERY passage (no funnel).

This scores exactly what the reference scores when its probes surface
everything (reference: src/search/ranking.jl:23-87 — every candidate is
fully decompressed and MaxSim-scored, no pruning stage), and is the
yardstick the TPU funnel's recall is measured against (bench_quality.py,
bench_scale.py) and the ground truth :mod:`.autotune` sweeps knobs over.

Streams one contiguous pid block's rows at a time from the chunk mmaps
(:func:`colbert_tpu.storage.format.read_embedding_rows`) — host RSS stays
at one block, not the whole packed index (the pre-round-4 double-load
owned the 19 GB RSS peak of the 1M oracle run).
"""

from __future__ import annotations

import numpy as np

__all__ = ["exhaustive_scores", "oracle_topk"]


def exhaustive_scores(searcher, Q, *, block: int = 1024) -> np.ndarray:
    """Score every passage against every query -> (B, P) float32.

    ``searcher`` is a :class:`colbert_tpu.retrieval.searcher.Searcher`
    (any single-process backend — reads go through the index chunk mmaps,
    not the serving arrays); ``Q`` is (B, Lq, dim) query embeddings.
    """
    import jax.numpy as jnp

    from colbert_tpu.retrieval import ranking
    from colbert_tpu.storage import format as fmt

    doclens = np.asarray(searcher.doclens, np.int64)
    offsets = np.concatenate([[0], np.cumsum(doclens)]).astype(np.int64)
    P = len(doclens)
    scores = np.full((Q.shape[0], P), -np.inf, np.float32)
    for lo in range(0, P, block):
        hi = min(P, lo + block)
        r0, r1 = int(offsets[lo]), int(offsets[hi])
        codes_blk, res_blk = fmt.read_embedding_rows(searcher.index_path, r0, r1)
        idx, mask = ranking.gather_padded(
            np.arange(hi - lo), doclens[lo:hi], offsets[lo:hi] - r0
        )
        sc = ranking.score_full(
            Q, jnp.asarray(codes_blk[idx]), jnp.asarray(res_blk[idx]),
            jnp.asarray(mask), searcher.centroids, searcher.bucket_weights,
            nbits=searcher.config.nbits,
        )
        scores[:, lo:hi] = np.asarray(sc)[:, :hi - lo]
    return scores


def oracle_topk(scores: np.ndarray, k: int) -> np.ndarray:
    """Top-k pids per query from an (B, P) oracle score matrix."""
    return np.argsort(-scores, axis=1)[:, :k]
