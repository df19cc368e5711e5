"""Index builder: the full offline indexing pipeline.

Reference: src/indexing.jl:24-147 (``Indexer`` facade + ``index``) and
src/indexing/collection_indexer.jl (sampling, setup, train, chunked build,
IVF). Same phases, same persisted artifact set (see
:mod:`colbert_tpu.storage.format`), with TPU-first changes:

  - encode/compress run as jitted device programs via
    :class:`colbert_tpu.models.encoder.ColBERTEncoder` (length-bucketed
    batches, no per-batch host cat),
  - chunk builds are *resumable*: a chunk whose four artifacts exist is
    skipped (the reference only skips whole existing indexes,
    indexing.jl:64-67),
  - the IVF is built from in-memory codes without re-reading chunks when the
    build just wrote them.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.indexing.codec_trainer import train_codec
from colbert_tpu.indexing.planner import (
    heldout_split_indices,
    sample_pids,
    setup_plan,
)
from colbert_tpu.models.encoder import ColBERTEncoder
from colbert_tpu.storage import format as fmt
from colbert_tpu.storage.collection import Collection
from colbert_tpu.utils.tracing import Tracer

logger = logging.getLogger(__name__)

__all__ = ["Indexer", "index", "load_collection", "build_ivf"]


def load_collection(path_or_list):
    """Collection input: list of passages, or a file path.

    ``.tsv`` files use the LoTTe/MS MARCO convention ``pid\\ttext[\\t...]``
    (reference example: examples/indexing.jl reads sample_collection.tsv);
    other files are one passage per line (reference: indexing.jl:28-29).
    File inputs return a byte-backed :class:`Collection` (mmap + vectorized
    offset scan; no per-passage Python strings until asked) that quacks like
    ``list[str]`` and feeds the native tokenizer zero-decode.
    """
    if isinstance(path_or_list, (list, tuple)):
        return list(path_or_list)
    if isinstance(path_or_list, Collection):
        return path_or_list
    return Collection.from_file(str(path_or_list))


def build_ivf(codes: np.ndarray, num_partitions: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverted file: embedding ids grouped by centroid code.

    Reference: collection_indexer.jl:349-353 ``_build_ivf`` —
    ``ivf = sortperm(codes)``, ``ivf_lengths = counts per centroid``.
    Runs through the native C++ counting sort (O(N); native/ivf.cpp) with a
    bit-identical numpy argsort fallback.
    """
    from colbert_tpu.indexing.native_ivf import build_ivf_native

    native = build_ivf_native(codes, num_partitions)
    if native is not None:
        return native
    ivf = np.argsort(codes, kind="stable").astype(np.int64)
    ivf_lengths = np.bincount(codes.astype(np.int64), minlength=num_partitions).astype(
        np.int32
    )
    return ivf, ivf_lengths


@dataclass
class Indexer:
    """Loads the model + collection, then ``indexer.index(path)`` builds.

    Construct either from ``config.checkpoint`` (a HF ColBERT checkpoint
    dir) or by injecting a ready :class:`ColBERTEncoder` (tests/benchmarks
    use deterministic random-weight encoders; no checkpoints ship with this
    environment).
    """

    config: ColBERTConfig
    encoder: ColBERTEncoder | None = None
    collection: Sequence[str] | str | None = None

    def __post_init__(self) -> None:
        if self.encoder is None:
            from colbert_tpu.models.hf_loader import load_checkpoint

            bert_cfg, params, tokenizer = load_checkpoint(self.config.checkpoint)
            self.encoder = ColBERTEncoder(params, bert_cfg, tokenizer, self.config)
        self.passages = load_collection(
            self.collection if self.collection is not None else self.config.collection
        )
        # multi-chip: when >1 device is visible (and the config doesn't pin
        # the mesh to 1), the build runs data-parallel — DP-sharded encode +
        # psum'd k-means + distributed quantiles — through this same facade
        # (SURVEY §2 parallelism replacements, reachable from the public API).
        import jax

        n_data = self.config.mesh_data_axis
        if n_data == -1:
            n_data = jax.device_count() // max(1, self.config.mesh_model_axis)
        if n_data > 1:
            from colbert_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(n_data, self.config.mesh_model_axis)
            if self.encoder.mesh is None:
                self.encoder.attach_mesh(self.mesh)
        else:
            self.mesh = None

    def index(self, index_path: str | None = None, *, overwrite: bool = False) -> str:
        index_path = index_path or self.config.index_path
        if not index_path:
            raise ValueError("no index_path given (argument or config.index_path)")
        if os.path.exists(os.path.join(index_path, "plan.json")) and not overwrite:
            if not fmt.check_all_files_saved(index_path):
                logger.info("index at %s already complete; skipping", index_path)
                return index_path
        if overwrite:
            # rank-0-only: a non-zero rank clearing the shared dir mid-build
            # would delete rank 0's freshly written plan/codec, stranding
            # every waiting rank
            if max(1, self.config.nranks) > 1 and self.config.rank != 0:
                raise ValueError(
                    "overwrite=True is only valid on rank 0 in a multi-rank "
                    "build (it clears the shared index dir)"
                )
            _clear_index_dir(index_path)
        os.makedirs(index_path, exist_ok=True)
        _build(self.config, self.encoder, self.passages, index_path)
        return index_path


def index(indexer: Indexer, index_path: str | None = None, **kw) -> str:
    """Functional alias mirroring the reference's ``index(indexer)`` export."""
    return indexer.index(index_path, **kw)


def _clear_index_dir(index_path: str) -> None:
    """Remove known index artifacts so ``overwrite=True`` starts clean
    (stale chunks/codec from a previous build must never mix with new ones)."""
    if not os.path.isdir(index_path):
        return
    for name in os.listdir(index_path):
        if name.endswith((".npy", ".json")):
            os.remove(os.path.join(index_path, name))


def _resumable_codec(index_path: str, n_passages: int, *, nranks: int = 1,
                     rank: int = 0, wait_timeout_s: float = 3600.0):
    """If a previous (or concurrent multi-rank) build left a codec, reuse
    the *saved* codec instead of retraining — retraining would overwrite the
    centroids/cutoffs that already-written chunks were compressed against
    (any nondeterminism then silently corrupts the index). Completion is
    gated on ALL FOUR codec files (save order makes avg_residual.json the
    marker), so a torn mid-save codec falls back to retraining rather than
    crashing. In a multi-rank build only rank 0 may train: other ranks WAIT
    for rank 0's codec instead of racing it. The saved plan must match the
    current collection; a mismatch is a hard error (pass ``overwrite=True``
    to rebuild).
    """
    def complete() -> bool:
        return (
            os.path.exists(os.path.join(index_path, "plan.json"))
            and fmt.codec_is_complete(index_path)
        )

    if not complete():
        if nranks > 1 and rank != 0:
            logger.info("rank %d waiting for rank 0's codec", rank)
            deadline = time.time() + wait_timeout_s
            while not complete():
                if time.time() > deadline:
                    raise TimeoutError(
                        f"rank {rank}: no codec at {index_path} after "
                        f"{wait_timeout_s:.0f}s — is rank 0 running?"
                    )
                time.sleep(2.0)
        else:
            return None
    plan = fmt.load_plan(index_path)
    if int(plan.get("num_documents", -1)) != n_passages:
        raise RuntimeError(
            f"partial index at {index_path} was built from a different "
            f"collection ({plan.get('num_documents')} vs {n_passages} "
            "passages); pass overwrite=True to rebuild"
        )
    codec = fmt.load_codec(index_path)
    return plan, codec


def _build(
    config: ColBERTConfig,
    encoder: ColBERTEncoder,
    passages: list[str],
    index_path: str,
) -> None:
    t0 = time.time()
    n = len(passages)
    if n == 0:
        raise ValueError("empty collection")
    rng = np.random.default_rng(0)
    tracer = Tracer()

    resumed = _resumable_codec(
        index_path, n, nranks=max(1, config.nranks), rank=config.rank
    )
    if resumed is not None:
        plan, codec = resumed
        centroids_dev = jnp.asarray(codec["centroids"])
        cutoffs_dev = jnp.asarray(codec["bucket_cutoffs"])
        weights_dev = jnp.asarray(codec["bucket_weights"])
        logger.info(
            "resuming build at %s: reusing saved codec (%d partitions)",
            index_path, plan["num_partitions"],
        )
        _build_chunks(
            config, encoder, passages, index_path, plan, tracer,
            centroids_dev, cutoffs_dev, t0,
        )
        return

    # --- phase 1: sample + encode (collection_indexer.jl:56-91) ---
    # TPU-native: sample embeddings stay device-resident (padded + validity
    # weights) through codec training; nothing fp32-sized crosses the (slow)
    # device<->host link.
    pids = sample_pids(n, rng)
    logger.info("sampling %d/%d passages for clustering", len(pids), n)
    sampled = (
        passages.take(pids) if isinstance(passages, Collection)
        else [passages[p] for p in pids]
    )
    with tracer.phase("sample_encode"):
        sample_embs, sample_valid, sample_doclens, sample_layout = (
            encoder.encode_passages_to_device(sampled, return_layout=True)
        )
    avg_doclen_est = float(sample_doclens.mean()) if len(sample_doclens) else 0.0

    # heldout split over *valid* rows (collection_indexer.jl:81-91 semantics;
    # index-only split — the padded sample stays device-resident)
    valid_idx = np.nonzero(sample_valid)[0]
    train_pos, heldout_pos = heldout_split_indices(len(valid_idx), rng)
    heldout_idx = valid_idx[heldout_pos]
    train_idx = valid_idx[train_pos]
    heldout = sample_embs[jnp.asarray(heldout_idx)]
    train_weights = np.zeros(len(sample_valid), np.float32)
    train_weights[train_idx] = 1.0
    n_train = len(train_idx)

    # --- phase 2: plan (collection_indexer.jl:115-139) ---
    plan = setup_plan(n, avg_doclen_est, n_train, config.chunksize, config.nranks)
    if config.num_partitions:
        plan["num_partitions"] = int(config.num_partitions)
    if plan["num_partitions"] > n_train:
        plan["num_partitions"] = n_train
    fmt.save_plan(index_path, plan)
    config.save(os.path.join(index_path, "config.json"))
    logger.info(
        "plan: %d chunks x %d, %d partitions, est %.0f embeddings",
        plan["num_chunks"], plan["chunksize"], plan["num_partitions"],
        plan["num_embeddings_est"],
    )

    # --- phase 3: codec training (collection_indexer.jl:219-237) ---
    t = time.time()
    init_idx = rng.choice(train_idx, size=plan["num_partitions"], replace=False)
    with tracer.phase("codec_train"):
        centroids_dev, cutoffs_dev, weights_dev, avg_residual = train_codec(
            sample_embs,
            heldout,
            num_partitions=plan["num_partitions"],
            nbits=config.nbits,
            kmeans_niters=config.kmeans_niters,
            sample_weights=train_weights,
            init_idx=jnp.asarray(init_idx),
            mesh=encoder.mesh,
        )
    fmt.save_codec(
        index_path,
        np.asarray(centroids_dev),
        np.asarray(cutoffs_dev),
        np.asarray(weights_dev),
        avg_residual,
    )
    logger.info("codec trained in %.1fs (avg_residual=%.4f)", time.time() - t, avg_residual)

    # small-corpus fast path: sample_pids takes the WHOLE collection whenever
    # 16·√(120·N) ≥ N (every N ≤ 30720), so the device-resident sample
    # already holds the corpus embeddings — compress them directly instead of
    # re-encoding every chunk (the reference runs the full BERT sweep twice:
    # collection_indexer.jl:56-79 then :271-297). One fused compress + one
    # D2H replaces the whole per-chunk encode pipeline. The row cap keeps the
    # bf16 sample (+ its packed artifacts) comfortably inside HBM.
    # Gated on nranks == 1: with striding ranks, rank 0 would compress +
    # transfer the whole corpus while writing only 1/nranks of the chunks,
    # and the other ranks never reach this branch (they resume via the saved
    # codec) — the per-chunk path wastes nothing there.
    precomputed = None
    if config.nranks == 1 and len(pids) == n and sample_embs.shape[0] <= 8_000_000:
        with tracer.phase("chunk_encode_compress"):
            flat_codes, flat_res = encoder.compress_sample_to_host(
                sample_embs, sample_layout, sample_doclens,
                centroids_dev, cutoffs_dev, nbits=config.nbits,
            )
        precomputed = (flat_codes, flat_res, sample_doclens)

    _build_chunks(
        config, encoder, passages, index_path, plan, tracer,
        centroids_dev, cutoffs_dev, t0, precomputed=precomputed,
    )


def _build_chunks(
    config: ColBERTConfig,
    encoder: ColBERTEncoder,
    passages: list[str],
    index_path: str,
    plan: dict,
    tracer: Tracer,
    centroids_dev: jnp.ndarray,
    cutoffs_dev: jnp.ndarray,
    t0: float,
    precomputed: tuple | None = None,
) -> None:
    # --- phase 4: fused encode+compress chunks (collection_indexer.jl:271-297) ---
    # Multi-host: with nranks > 1 each rank builds only its stride of chunks
    # (chunk_idx % nranks == rank) against the shared index dir — the
    # reference's rank/nranks are placeholders ("only supports one GPU",
    # config.jl:13-14); here they shard the build. The last rank to finish
    # (all chunks present) also builds the IVF; earlier finishers return a
    # partial index that any later run (any rank) completes via chunk resume.
    n = len(passages)
    chunksize = plan["chunksize"]
    nranks = max(1, config.nranks)
    if precomputed is not None:  # see _build's small-corpus fast path
        pre_codes, pre_res, pre_doclens = precomputed
        pre_offsets = np.concatenate([[0], np.cumsum(pre_doclens)]).astype(np.int64)
    all_codes: list[np.ndarray | None] = []
    for chunk_idx in range(plan["num_chunks"]):
        lo = chunk_idx * chunksize
        hi = min(n, lo + chunksize)
        if fmt.chunk_is_complete(index_path, chunk_idx):
            all_codes.append(fmt.load_chunk(index_path, chunk_idx)["codes"])
            logger.info("chunk %d already complete; resumed", chunk_idx)
            continue
        if nranks > 1 and chunk_idx % nranks != config.rank:
            all_codes.append(None)  # another rank's chunk, not built yet
            continue
        t = time.time()
        if precomputed is not None:
            codes = pre_codes[pre_offsets[lo]:pre_offsets[hi]]
            residuals = pre_res[pre_offsets[lo]:pre_offsets[hi]]
            doclens = pre_doclens[lo:hi]
        else:
            with tracer.phase("chunk_encode_compress"):
                codes, residuals, doclens = encoder.encode_passages_compressed(
                    passages[lo:hi], centroids_dev, cutoffs_dev, nbits=config.nbits
                )
        fmt.save_chunk(
            index_path,
            chunk_idx,
            codes=codes,
            residuals=residuals,
            doclens=doclens,
            passage_offset=lo,
        )
        all_codes.append(codes)
        logger.info(
            "chunk %d/%d: %d passages, %d embeddings in %.1fs",
            chunk_idx + 1, plan["num_chunks"], hi - lo, codes.shape[0],
            time.time() - t,
        )

    if any(c is None for c in all_codes):
        # re-scan foreign chunks: under genuinely concurrent ranks they were
        # checked early in the loop and may have landed since — without this,
        # EVERY rank could see some foreign chunk as missing and no rank
        # would ever build the IVF
        for chunk_idx, c in enumerate(all_codes):
            if c is None and fmt.chunk_is_complete(index_path, chunk_idx):
                all_codes[chunk_idx] = fmt.load_chunk(index_path, chunk_idx)["codes"]
    if any(c is None for c in all_codes):
        done = sum(c is not None for c in all_codes)
        logger.info(
            "rank %d/%d finished its chunks (%d/%d complete overall); the "
            "final rank to complete builds the IVF",
            config.rank, nranks, done, plan["num_chunks"],
        )
        return

    # --- phase 5: offsets + IVF (indexing.jl:119-143) ---
    counts = [int(c.shape[0]) for c in all_codes]
    plan["num_embeddings"] = int(sum(counts))
    plan["embedding_offsets"] = np.cumsum([0] + counts[:-1]).tolist()
    with tracer.phase("build_ivf"):
        ivf, ivf_lengths = build_ivf(np.concatenate(all_codes), plan["num_partitions"])
        fmt.save_ivf(index_path, ivf, ivf_lengths)
    plan["timings"] = tracer.as_dict()
    plan["total_build_seconds"] = round(time.time() - t0, 3)
    fmt.save_plan(index_path, plan)

    missing = fmt.check_all_files_saved(index_path)
    if missing:
        raise RuntimeError(f"index build incomplete; missing {missing}")
    logger.info("index built at %s in %.1fs", index_path, time.time() - t0)
