"""colbert_tpu — a TPU-native late-interaction (ColBERTv2-style) retrieval engine.

From-scratch JAX/XLA/Pallas implementation with the capability contract of the
reference ColBERT.jl (see SURVEY.md): offline indexing (BERT+linear encoder,
k-means centroids, nbits-quantized residuals over an IVF) and query-time
MaxSim retrieval — redesigned TPU-first (static shapes, fused jitted kernels,
mesh-sharded build and search).

Public API mirrors the reference's six exports (reference: src/ColBERT.jl:21-40):
``ColBERTConfig``, ``Indexer``, ``index``, ``Searcher``, ``search`` — plus
``IndexUpdater`` (incremental add/remove; on the reference's roadmap,
README.md:179-190, but unimplemented there).
"""

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.utils.jax_cache import enable_persistent_cache as _enable_cache

_enable_cache()

__version__ = "0.1.0"

__all__ = [
    "ColBERTConfig",
    "Indexer",
    "index",
    "Searcher",
    "search",
    "IndexUpdater",
    "__version__",
]


def __getattr__(name):  # lazy: keep `import colbert_tpu` light for ops-only use
    if name in ("Indexer", "index"):
        from colbert_tpu.indexing.builder import Indexer, index

        return {"Indexer": Indexer, "index": index}[name]
    if name == "IndexUpdater":
        from colbert_tpu.indexing.updater import IndexUpdater

        return IndexUpdater
    if name in ("Searcher", "search"):
        from colbert_tpu.retrieval.searcher import Searcher, search

        return {"Searcher": Searcher, "search": search}[name]
    raise AttributeError(f"module 'colbert_tpu' has no attribute {name!r}")
