"""Incremental index updates: add / remove passages without a rebuild.

The reference has no index-update support — its README roadmap lists
"index updation" as future work (reference: README.md:179-190 "Stay Tuned");
the Python ColBERT's ``IndexUpdater`` is the de-facto contract this module
reproduces, TPU-style:

  - :meth:`IndexUpdater.add` encodes + compresses new passages against the
    EXISTING codec (centroids/cutoffs frozen, exactly like the Python
    updater — retraining the codec would invalidate every stored residual),
    appends them as a new self-contained chunk, and rebuilds the IVF. New
    passages get pids following the current collection; existing pids and
    their compressed embeddings are untouched.
  - :meth:`IndexUpdater.remove` tombstones pids in ``deleted.npy`` and
    rebuilds the IVF *excluding* their embeddings, so no backend ever
    surfaces them as candidates. Their rows stay on disk (O(changed-cells)
    metadata work, no chunk rewrites) until a full rebuild compacts them.

The IVF rebuild is one ``argsort`` over all codes — seconds even at
MS MARCO scale — and is the only global artifact that changes. Open
searchers keep serving their loaded snapshot; construct a new
:class:`~colbert_tpu.retrieval.searcher.Searcher` to see updates.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.models.encoder import ColBERTEncoder
from colbert_tpu.storage import format as fmt

logger = logging.getLogger(__name__)

__all__ = ["IndexUpdater"]


def build_ivf_excluding(
    codes: np.ndarray, num_partitions: int, deleted_eids: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray]:
    """IVF over ``codes`` with ``deleted_eids`` rows excluded from every
    cell. Masked rows are assigned a virtual overflow cell past the last
    partition: they sort to the tail of the eid array and the per-cell
    lengths never count them, so no probe can reach them. Native C++
    counting sort with a bit-identical numpy fallback."""
    from colbert_tpu.indexing.native_ivf import build_ivf_native

    codes_u = np.ascontiguousarray(codes, np.uint32)
    if deleted_eids is not None and len(deleted_eids):
        codes_u = codes_u.copy()
        codes_u[deleted_eids] = num_partitions
    native = build_ivf_native(codes_u, num_partitions)
    if native is not None:
        return native
    codes64 = codes_u.astype(np.int64)
    ivf = np.argsort(codes64, kind="stable").astype(np.int32)
    lengths = np.bincount(codes64, minlength=num_partitions + 1)[:num_partitions]
    return ivf, lengths.astype(np.int32)


def deleted_eids_from_pids(
    deleted_pids: np.ndarray, doclens: np.ndarray
) -> np.ndarray:
    """Tombstoned pids -> their embedding row ids (contiguous per pid)."""
    doclens = np.asarray(doclens, np.int64)
    offsets = np.concatenate([[0], np.cumsum(doclens)])
    return np.concatenate(
        [np.arange(offsets[p], offsets[p + 1]) for p in np.asarray(deleted_pids)]
        or [np.zeros(0, np.int64)]
    ).astype(np.int64)


@dataclass
class IndexUpdater:
    """Add/remove passages on an existing on-disk index."""

    index_path: str
    encoder: ColBERTEncoder

    def __post_init__(self) -> None:
        missing = fmt.check_all_files_saved(self.index_path)
        if missing:
            raise FileNotFoundError(
                f"incomplete index at {self.index_path}: {missing}"
            )
        self.config = ColBERTConfig.load(
            os.path.join(self.index_path, "config.json")
        )

    # ------------------------------------------------------------------

    def add(self, passages: Sequence[str]) -> np.ndarray:
        """Append ``passages`` as a new chunk -> their assigned pids.

        Compression uses the index's saved codec; the IVF is rebuilt over
        all (non-deleted) embeddings so the new passages are immediately
        probeable by a fresh Searcher.
        """
        if not len(passages):
            return np.zeros((0,), np.int64)
        passages = list(passages)
        plan = fmt.load_plan(self.index_path)
        codec = fmt.load_codec(self.index_path)
        centroids = jnp.asarray(codec["centroids"])
        cutoffs = jnp.asarray(codec["bucket_cutoffs"])

        passage_offset = int(plan["num_documents"])
        chunksize = int(plan.get("chunksize") or len(passages))
        offsets = list(plan.get("embedding_offsets") or [])
        n_embs = int(plan.get("num_embeddings", 0))
        n_new_embs = 0
        first_chunk = int(plan["num_chunks"])
        # large additions split at the plan's chunksize, like the builder —
        # chunks stay uniformly sized for streaming loads and resume logic
        for lo in range(0, len(passages), chunksize):
            batch = passages[lo : lo + chunksize]
            codes, residuals, doclens = self.encoder.encode_passages_compressed(
                batch, centroids, cutoffs, nbits=self.config.nbits
            )
            fmt.save_chunk(
                self.index_path, int(plan["num_chunks"]),
                codes=codes, residuals=residuals, doclens=doclens,
                passage_offset=passage_offset + lo,
            )
            plan["num_chunks"] = int(plan["num_chunks"]) + 1
            offsets.append(n_embs + n_new_embs)
            n_new_embs += int(codes.shape[0])
        plan["num_documents"] = passage_offset + len(passages)
        plan["embedding_offsets"] = offsets
        plan["num_embeddings"] = n_embs + n_new_embs
        fmt.save_plan(self.index_path, plan)
        self._rebuild_ivf(plan)
        new_pids = np.arange(
            passage_offset, passage_offset + len(passages), dtype=np.int64
        )
        logger.info(
            "added %d passages (%d embeddings) as chunks %d..%d; pids %d..%d",
            len(passages), n_new_embs, first_chunk,
            int(plan["num_chunks"]) - 1, new_pids[0], new_pids[-1],
        )
        return new_pids

    def remove(self, pids: Sequence[int]) -> None:
        """Tombstone ``pids`` and rebuild the IVF without their embeddings.

        Idempotent; unknown pids raise. Rows stay on disk until a full
        rebuild compacts them (searchers simply never surface the pids).
        """
        pids = np.unique(np.asarray(list(pids), np.int64))
        if not len(pids):
            return
        plan = fmt.load_plan(self.index_path)
        n_docs = int(plan["num_documents"])
        if pids.min() < 0 or pids.max() >= n_docs:
            raise ValueError(
                f"pids out of range [0, {n_docs}): {pids[(pids < 0) | (pids >= n_docs)]}"
            )
        merged = np.union1d(fmt.load_deleted(self.index_path), pids)
        fmt.save_deleted(self.index_path, merged)
        self._rebuild_ivf(plan)
        logger.info("removed %d pids (%d tombstoned total)", len(pids), len(merged))

    def compact(self) -> np.ndarray:
        """Physically drop tombstoned rows -> old->new pid map (int64, -1
        for removed pids).

        ``remove`` is O(metadata) and keeps rows on disk; compaction
        rewrites every chunk without the deleted passages, renumbers pids
        densely (chunk order preserved), clears the tombstone overlay, and
        rebuilds the IVF. Run it when tombstones accumulate; searchers
        opened afterwards see the smaller index.
        """
        self.finish_pending_compact()
        plan = fmt.load_plan(self.index_path)
        deleted = fmt.load_deleted(self.index_path)
        n_docs = int(plan["num_documents"])
        pid_map = np.full(n_docs, -1, np.int64)
        keep_mask = np.ones(n_docs, bool)
        keep_mask[deleted] = False
        pid_map[keep_mask] = np.arange(int(keep_mask.sum()))
        if not len(deleted):
            return pid_map

        # Rewrite chunk-by-chunk into a staging dir (mmap'd source, only the
        # surviving rows materialize -> peak RSS is one chunk, not the index),
        # then publish with renames only after the FULL pass succeeds. A crash
        # before the commit journal leaves the live index untouched
        # (tombstones intact, state fully repairable by re-running compact);
        # a crash anywhere AFTER the journal — mid-rename, before the plan
        # write, before the IVF rebuild — is repaired by replaying the
        # journal (finish_pending_compact), because the renumbered chunks
        # on disk are only consistent with the NEW plan + empty tombstones,
        # never with the old overlay.
        n_chunks = int(plan["num_chunks"])
        tmp_dir = os.path.join(self.index_path, "compact_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        passage_offset = 0
        total_embs = 0
        offsets = []
        pid = 0
        for ci in range(n_chunks):
            chunk = fmt.load_chunk(self.index_path, ci, mmap=True)
            dl = chunk["doclens"].astype(np.int64)
            n = len(dl)
            keep = keep_mask[pid : pid + n]
            row_keep = np.repeat(keep, dl)
            fmt.save_chunk(
                tmp_dir, ci,
                codes=chunk["codes"][row_keep],
                residuals=chunk["residuals"][row_keep],
                doclens=dl[keep], passage_offset=passage_offset,
            )
            offsets.append(total_embs)
            passage_offset += int(keep.sum())
            total_embs += int(row_keep.sum())
            pid += n
        self._write_compact_journal(
            num_chunks=n_chunks,
            plan_updates={
                "num_documents": passage_offset,
                "num_embeddings": total_embs,
                "embedding_offsets": offsets,
            },
        )
        self._replay_compact_journal()
        logger.info(
            "compacted: %d pids removed, %d remain (%d embeddings)",
            len(deleted), passage_offset, total_embs,
        )
        return pid_map

    COMPACT_JOURNAL = "compact_commit.json"

    def finish_pending_compact(self) -> bool:
        """Complete a :meth:`compact` publish interrupted by a crash
        -> True if there was one.

        ``compact()`` journals its commit (the staged chunk count + the new
        plan fields) durably BEFORE the first destructive rename. The
        publish replay is idempotent — renames that already happened find
        no staging file and are skipped — so rerunning it repairs a crash
        at any point: remaining chunks are renamed, the plan and tombstone
        overlay rewritten, the IVF rebuilt, and the journal removed. Called
        automatically at the start of every ``compact()``; callers that
        crashed mid-compact can also invoke it directly (the interrupted
        call's pid map is lost — recompute it from the pre-compact
        tombstone list if needed).
        """
        if not os.path.exists(os.path.join(self.index_path, self.COMPACT_JOURNAL)):
            return False
        logger.warning(
            "found an interrupted compact() publish — completing it"
        )
        self._replay_compact_journal()
        return True

    def _write_compact_journal(self, **journal) -> None:
        import json

        path = os.path.join(self.index_path, self.COMPACT_JOURNAL)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(journal, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _replay_compact_journal(self) -> None:
        import json

        journal_path = os.path.join(self.index_path, self.COMPACT_JOURNAL)
        with open(journal_path) as f:
            journal = json.load(f)
        tmp_dir = os.path.join(self.index_path, "compact_tmp")
        for ci in range(int(journal["num_chunks"])):
            for name in fmt.chunk_file_names(ci):
                src = os.path.join(tmp_dir, name)
                if os.path.exists(src):  # skip = rename already happened
                    os.replace(src, os.path.join(self.index_path, name))
        if os.path.isdir(tmp_dir):
            os.rmdir(tmp_dir)
        plan = fmt.load_plan(self.index_path)
        plan.update(journal["plan_updates"])
        fmt.save_plan(self.index_path, plan)
        fmt.save_deleted(self.index_path, np.zeros((0,), np.int64))
        self._rebuild_ivf(plan)
        os.remove(journal_path)

    # ------------------------------------------------------------------

    def _rebuild_ivf(self, plan: dict) -> None:
        codes = fmt.load_all_codes(self.index_path, mmap=True)
        doclens = fmt.load_all_doclens(self.index_path)
        deleted = fmt.load_deleted(self.index_path)
        eids = deleted_eids_from_pids(deleted, doclens) if len(deleted) else None
        ivf, lengths = build_ivf_excluding(
            codes, int(plan["num_partitions"]), eids
        )
        fmt.save_ivf(self.index_path, ivf, lengths)
