"""Serving layer: cross-request batching + a minimal HTTP front.

No reference equivalent (serving infrastructure is on the reference's
roadmap, README.md:179-190). On a TPU the per-dispatch latency floor
(~50-60ms through a tunneled link) makes batched execution the serving
model: the :class:`~colbert_tpu.serving.batcher.BatchingSearcher` coalesces
concurrent requests into one bucketed ``search_batch`` call.
"""

from colbert_tpu.serving.batcher import BatchingSearcher

__all__ = ["BatchingSearcher"]
