"""On-disk index format: chunked artifacts + JSON metadata.

Same *logical* artifact set as the reference's JLD2 savers/loaders
(reference: src/savers.jl:16-138, src/loaders.jl:10-140 and the
completeness list at collection_indexer.jl:310-329):

    config.json, plan.json,
    centroids, bucket_cutoffs, bucket_weights, avg_residual,
    per-chunk: {i}.codes, {i}.residuals, doclens.{i}, {i}.metadata.json,
    ivf, ivf_lengths

but stored as raw ``.npy`` arrays (mmap-able, zero-copy load into device
transfer buffers) instead of JLD2. Chunk ids are 0-based (Julia's are
1-based). Per-chunk artifacts are self-contained, so builds can resume at
chunk granularity (the reference format supports this but never exploits it
— SURVEY §5).

On TensorStore (the north-star sharded format, BASELINE.md): the
capability it names — sharded storage with per-shard row-range streaming,
where a multi-host pod never pages in another host's shard — is delivered
here by the chunked ``.npy``+JSON layout via :func:`read_embedding_rows`
(each host mmaps only the chunks covering its own row range;
``parallel/launch.py`` builds on it). ``tensorstore`` itself is not
installable in this environment; if it becomes available, it can slot in
underneath this module's save/load functions without touching any caller
(the format API is the boundary — everything above reads logical arrays).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Tuple

import numpy as np

__all__ = [
    "save_codec",
    "load_codec",
    "save_chunk",
    "load_chunk",
    "chunk_is_complete",
    "save_plan",
    "load_plan",
    "save_ivf",
    "load_ivf",
    "load_all_doclens",
    "load_all_codes",
    "load_all_residuals",
    "save_deleted",
    "load_deleted",
    "num_chunks",
    "read_embedding_rows",
    "check_all_files_saved",
    "chunk_file_names",
]


def save_codec(
    index_path: str,
    centroids: np.ndarray,
    bucket_cutoffs: np.ndarray,
    bucket_weights: np.ndarray,
    avg_residual: float,
) -> None:
    """Reference: src/savers.jl:16-29 ``save_codec`` (4 artifacts)."""
    os.makedirs(index_path, exist_ok=True)
    np.save(os.path.join(index_path, "centroids.npy"), np.asarray(centroids, np.float32))
    np.save(os.path.join(index_path, "bucket_cutoffs.npy"), np.asarray(bucket_cutoffs, np.float32))
    np.save(os.path.join(index_path, "bucket_weights.npy"), np.asarray(bucket_weights, np.float32))
    with open(os.path.join(index_path, "avg_residual.json"), "w") as f:
        json.dump({"avg_residual": float(avg_residual)}, f)


CODEC_FILES = (
    "centroids.npy", "bucket_cutoffs.npy", "bucket_weights.npy",
    "avg_residual.json",
)


def codec_is_complete(index_path: str) -> bool:
    """All four codec artifacts present (``save_codec`` writes
    ``avg_residual.json`` last, so this doubles as a completion marker
    against torn mid-save reads)."""
    return all(
        os.path.exists(os.path.join(index_path, n)) for n in CODEC_FILES
    )


def load_codec(index_path: str) -> dict:
    """Reference: src/loaders.jl:10-41 ``load_codec``."""
    with open(os.path.join(index_path, "avg_residual.json")) as f:
        avg = json.load(f)["avg_residual"]
    return {
        "centroids": np.load(os.path.join(index_path, "centroids.npy")),
        "bucket_cutoffs": np.load(os.path.join(index_path, "bucket_cutoffs.npy")),
        "bucket_weights": np.load(os.path.join(index_path, "bucket_weights.npy")),
        "avg_residual": avg,
    }


def chunk_file_names(chunk_idx: int) -> list[str]:
    return [
        f"{chunk_idx}.codes.npy",
        f"{chunk_idx}.residuals.npy",
        f"doclens.{chunk_idx}.npy",
        f"{chunk_idx}.metadata.json",
    ]


def save_chunk(
    index_path: str,
    chunk_idx: int,
    *,
    codes: np.ndarray,
    residuals: np.ndarray,
    doclens: np.ndarray,
    passage_offset: int,
) -> None:
    """Reference: src/savers.jl:52-84 ``save_chunk``."""
    np.save(os.path.join(index_path, f"{chunk_idx}.codes.npy"), np.asarray(codes, np.uint32))
    np.save(os.path.join(index_path, f"{chunk_idx}.residuals.npy"), np.asarray(residuals, np.uint8))
    np.save(os.path.join(index_path, f"doclens.{chunk_idx}.npy"), np.asarray(doclens, np.int32))
    meta = {
        "passage_offset": int(passage_offset),
        "num_passages": int(len(doclens)),
        "num_embeddings": int(codes.shape[0]),
    }
    with open(os.path.join(index_path, f"{chunk_idx}.metadata.json"), "w") as f:
        json.dump(meta, f)


def chunk_is_complete(index_path: str, chunk_idx: int) -> bool:
    return all(
        os.path.exists(os.path.join(index_path, n)) for n in chunk_file_names(chunk_idx)
    )


def load_chunk(index_path: str, chunk_idx: int, *, mmap: bool = False) -> dict:
    mode = "r" if mmap else None
    with open(os.path.join(index_path, f"{chunk_idx}.metadata.json")) as f:
        meta = json.load(f)
    return {
        "codes": np.load(os.path.join(index_path, f"{chunk_idx}.codes.npy"), mmap_mode=mode),
        "residuals": np.load(os.path.join(index_path, f"{chunk_idx}.residuals.npy"), mmap_mode=mode),
        "doclens": np.load(os.path.join(index_path, f"doclens.{chunk_idx}.npy")),
        "metadata": meta,
    }


def save_plan(index_path: str, plan: dict) -> None:
    with open(os.path.join(index_path, "plan.json"), "w") as f:
        json.dump(plan, f, indent=2, sort_keys=True)


def load_plan(index_path: str) -> dict:
    with open(os.path.join(index_path, "plan.json")) as f:
        return json.load(f)


def save_ivf(index_path: str, ivf: np.ndarray, ivf_lengths: np.ndarray) -> None:
    # int32 eids when they fit (corpora < 2^31 embeddings — MS MARCO is
    # ~600M): halves the on-disk IVF and the loader's host copy
    ivf = np.asarray(ivf)
    dtype = np.int32 if (len(ivf) == 0 or int(ivf.max()) < 2**31) else np.int64
    np.save(os.path.join(index_path, "ivf.npy"), ivf.astype(dtype, copy=False))
    np.save(os.path.join(index_path, "ivf_lengths.npy"), np.asarray(ivf_lengths, np.int32))


def load_ivf(index_path: str) -> Tuple[np.ndarray, np.ndarray]:
    return (
        np.load(os.path.join(index_path, "ivf.npy")),
        np.load(os.path.join(index_path, "ivf_lengths.npy")),
    )


def _num_chunks(index_path: str) -> int:
    return int(load_plan(index_path)["num_chunks"])


def load_all_doclens(index_path: str) -> np.ndarray:
    """Concatenated doclens over chunks (reference: loaders.jl:76-89)."""
    parts = [
        np.load(os.path.join(index_path, f"doclens.{i}.npy"))
        for i in range(_num_chunks(index_path))
    ]
    return np.concatenate(parts) if parts else np.zeros((0,), np.int32)


def _load_all_chunked(
    index_path: str, name_fmt: str, dtype, *, mmap: bool, extra_rows: int
) -> np.ndarray | None:
    """Assemble all chunks of one artifact into ONE preallocated buffer.

    ``np.concatenate`` over chunk arrays would materialize a second full
    copy when a consumer then appends sentinel rows (host RSS ~2x the index
    at MS MARCO scale); instead the per-chunk mmaps are copied straight into
    a single (N + extra_rows) buffer whose tail rows are zeroed — consumers
    that need sentinel rows pass ``extra_rows`` and get them for free.
    Returns None when there are no chunks.
    """
    mode = "r" if mmap else None
    parts = [
        np.load(os.path.join(index_path, name_fmt.format(i)), mmap_mode=mode)
        for i in range(_num_chunks(index_path))
    ]
    if not parts:
        return None
    n = sum(p.shape[0] for p in parts)
    out = np.zeros((n + extra_rows,) + parts[0].shape[1:], dtype)
    off = 0
    for p in parts:
        out[off : off + p.shape[0]] = p
        off += p.shape[0]
    return out


def load_all_codes(
    index_path: str, *, mmap: bool = False, extra_rows: int = 0
) -> np.ndarray:
    """All codes in one array. ``mmap=True`` reads chunks through the page
    cache; ``extra_rows`` appends that many zeroed sentinel rows so
    device-index builders never re-concatenate (single host copy total)."""
    out = _load_all_chunked(
        index_path, "{}.codes.npy", np.uint32, mmap=mmap, extra_rows=extra_rows
    )
    return out if out is not None else np.zeros((extra_rows,), np.uint32)


def load_all_residuals(
    index_path: str, *, mmap: bool = False, extra_rows: int = 0
) -> np.ndarray:
    """All packed residuals in one matrix (reference: loaders.jl:91-113);
    see :func:`load_all_codes` for ``mmap``/``extra_rows``."""
    out = _load_all_chunked(
        index_path, "{}.residuals.npy", np.uint8, mmap=mmap, extra_rows=extra_rows
    )
    if out is None:
        raise FileNotFoundError(f"no residual chunks in {index_path}")
    return out


def num_chunks(index_path: str) -> int:
    """Chunk count from plan.json (public accessor for streaming loaders)."""
    return _num_chunks(index_path)


def read_embedding_rows(index_path: str, lo: int, hi: int) -> tuple[np.ndarray, np.ndarray]:
    """Rows [lo, hi) of the global (codes, residuals) arrays, assembled from
    the covering chunk mmaps only — a multi-host loader primitive: each pod
    host reads JUST its shard's rows (pages) instead of the whole index.
    Uses plan.json's ``embedding_offsets`` (written by every builder); for
    older plans without it, reconstructs the offsets from the chunk mmap
    headers (shape-only reads, no data paged in)."""
    plan = load_plan(index_path)
    starts = plan.get("embedding_offsets")
    if not starts:
        starts, acc = [], 0
        for ci in range(int(plan["num_chunks"])):
            starts.append(acc)
            acc += np.load(
                os.path.join(index_path, f"{ci}.codes.npy"), mmap_mode="r"
            ).shape[0]
    offsets = list(starts) + [int(plan["num_embeddings"])]
    if not (0 <= lo <= hi <= offsets[-1]):
        raise ValueError(f"rows [{lo}, {hi}) outside [0, {offsets[-1]})")
    codes_parts, res_parts = [], []
    for ci in range(int(plan["num_chunks"])):
        c0, c1 = offsets[ci], offsets[ci + 1]
        if c1 <= lo or c0 >= hi:
            continue
        s, e = max(lo, c0) - c0, min(hi, c1) - c0
        codes_parts.append(np.load(
            os.path.join(index_path, f"{ci}.codes.npy"), mmap_mode="r")[s:e])
        res_parts.append(np.load(
            os.path.join(index_path, f"{ci}.residuals.npy"), mmap_mode="r")[s:e])
    if not codes_parts:
        nbytes_probe = np.load(
            os.path.join(index_path, "0.residuals.npy"), mmap_mode="r"
        ).shape[1] if int(plan["num_chunks"]) else 0
        return (np.zeros((0,), np.uint32), np.zeros((0, nbytes_probe), np.uint8))
    codes = np.concatenate([np.asarray(p, np.uint32) for p in codes_parts])
    residuals = np.concatenate([np.asarray(p, np.uint8) for p in res_parts])
    return codes, residuals


def save_deleted(index_path: str, pids: np.ndarray) -> None:
    """Persist the tombstoned-pid overlay (sorted unique int64). An
    incremental-update artifact with no reference equivalent (the reference
    lists index updates as future work, README.md:179-190)."""
    np.save(
        os.path.join(index_path, "deleted.npy"),
        np.unique(np.asarray(pids, np.int64)),
    )


def load_deleted(index_path: str) -> np.ndarray:
    """Tombstoned pids; empty when the overlay doesn't exist."""
    p = os.path.join(index_path, "deleted.npy")
    return np.load(p) if os.path.exists(p) else np.zeros((0,), np.int64)


def check_all_files_saved(index_path: str) -> list[str]:
    """Post-build integrity scan -> list of missing files (empty == OK).

    Reference: collection_indexer.jl:299-340 ``_check_all_files_are_saved``.
    """
    required = [
        "config.json",
        "plan.json",
        "centroids.npy",
        "bucket_cutoffs.npy",
        "bucket_weights.npy",
        "avg_residual.json",
        "ivf.npy",
        "ivf_lengths.npy",
    ]
    try:
        n = _num_chunks(index_path)
    except FileNotFoundError:
        return ["plan.json"]
    for i in range(n):
        required.extend(chunk_file_names(i))
    return [f for f in required if not os.path.exists(os.path.join(index_path, f))]
