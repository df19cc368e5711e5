"""Searcher: load an index, answer queries.

Reference: src/searching.jl:18-128 (``Searcher`` + ``search``). The device
backend streams codes/residual chunks mmap -> HBM (host RAM never holds the
packed index; the reference loads everything into host RAM,
loaders.jl:91-113); the host backend keeps the reference-shaped staged
pipeline for debugging/parity; the sharded backend partitions over a mesh
(see :mod:`colbert_tpu.parallel`). Queries run batched end-to-end:

    encode -> probe centroids (device top-k) -> IVF gather (host CSR)
    -> [optional PLAID centroid-only pruning] -> fused decompress+MaxSim
    -> top-k

The reference scores one query at a time and decompresses on CPU;
``search_batch`` here is the first-class entry point.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.models.encoder import ColBERTEncoder
from colbert_tpu.retrieval import ranking
from colbert_tpu.storage import format as fmt

__all__ = ["Searcher", "search"]


@dataclass
class Searcher:
    index_path: str
    encoder: ColBERTEncoder | None = None
    config: ColBERTConfig = None  # loaded from the index unless given
    # "device": whole index HBM-resident, one jitted program per query
    # (TPU-native default). "sharded": index partitioned over the device
    # mesh's data axis, per-shard search + exact cross-shard top-k merge
    # (pod serving). "host": staged pipeline with host-side IVF gather per
    # query (reference-shaped; useful for debugging/parity).
    backend: str = "device"

    def __post_init__(self) -> None:
        if self.config is None:
            self.config = ColBERTConfig.load(os.path.join(self.index_path, "config.json"))
        missing = fmt.check_all_files_saved(self.index_path)
        if missing:
            raise FileNotFoundError(f"incomplete index at {self.index_path}: {missing}")
        if self.encoder is None:
            from colbert_tpu.models.hf_loader import load_checkpoint

            bert_cfg, params, tokenizer = load_checkpoint(self.config.checkpoint)
            self.encoder = ColBERTEncoder(params, bert_cfg, tokenizer, self.config)

        codec = fmt.load_codec(self.index_path)
        self.centroids = jnp.asarray(codec["centroids"])
        self.bucket_weights = jnp.asarray(codec["bucket_weights"])
        self.avg_residual = codec["avg_residual"]
        self.plan = fmt.load_plan(self.index_path)
        self.ivf, self.ivf_lengths = fmt.load_ivf(self.index_path)
        self.doclens = fmt.load_all_doclens(self.index_path)
        # IndexUpdater tombstones: the on-disk IVF already excludes them
        # (updater._rebuild_ivf), which covers the device and host backends;
        # the sharded backend builds per-shard IVFs itself and gets the list
        self.deleted_pids = fmt.load_deleted(self.index_path)
        # crash-consistency check: a process dying between an updater's plan
        # write and its IVF rebuild leaves a stale IVF — embeddings exist on
        # disk that no probe can reach. Detect and warn (rerun any
        # IndexUpdater op, or rebuild, to repair).
        import os as _os

        if _os.path.exists(_os.path.join(self.index_path, "compact_commit.json")):
            # unlike a torn add/remove (stale IVF -> recall loss, warned
            # below), an interrupted compact publish leaves renumbered
            # chunks next to the OLD plan/tombstones — pids are wrong and
            # loads can crash, so fail fast instead of serving corruption
            raise RuntimeError(
                "a compact() publish was interrupted mid-commit: run "
                "IndexUpdater(index_path, encoder).finish_pending_compact() "
                "to complete it before opening a Searcher"
            )
        dl64 = np.asarray(self.doclens, np.int64)
        expected_entries = int(dl64.sum())
        if len(self.deleted_pids):
            expected_entries -= int(dl64[self.deleted_pids].sum())
        ivf_entries = int(np.asarray(self.ivf_lengths, np.int64).sum())
        if ivf_entries != expected_entries:
            import logging

            logging.getLogger(__name__).warning(
                "IVF covers %d embeddings but chunks hold %d (minus "
                "tombstones): the index looks torn mid-update — rerun an "
                "IndexUpdater operation (or rebuild) to restore full recall",
                ivf_entries, expected_entries,
            )

        if self.backend == "device":
            from colbert_tpu.retrieval.device_index import DeviceIndex

            # memory hygiene: codes/residual chunks stream mmap -> HBM via
            # donated in-place buffer writes — host RSS never materializes
            # the packed index at all, only one chunk's pages at a time
            # (the reference keeps the whole index in host RAM,
            # loaders.jl:91-113).
            bal = self.config.ivf_balance_cap
            balance_cap = 1024 if bal is None else (bal if bal > 0 else None)
            self.device_index = DeviceIndex.build(
                centroids=np.asarray(self.centroids),
                stream_from=self.index_path,
                ivf=self.ivf,
                ivf_lengths=self.ivf_lengths,
                doclens=np.asarray(self.doclens, np.int64),
                bucket_weights=np.asarray(self.bucket_weights),
                nbits=self.config.nbits,
                balance_cap=balance_cap,
            )
            self.codes = self.residuals = None  # HBM-resident only
            self.emb2pid = self.emb_offsets = None
            self._init_capacities()
        elif self.backend == "sharded":
            from colbert_tpu.parallel.mesh import make_mesh
            from colbert_tpu.parallel.sharded_index import ShardedDeviceIndex

            self.mesh = make_mesh(
                self.config.mesh_data_axis, self.config.mesh_model_axis
            )
            bal = self.config.ivf_balance_cap
            balance_cap = 1024 if bal is None else (bal if bal > 0 else None)
            # stream_from: each shard's rows are read straight from the
            # covering chunk mmaps — on a multi-host pod every process
            # loads ONLY its own shards (parallel.launch)
            self.sharded_index = ShardedDeviceIndex.build(
                self.mesh,
                centroids=np.asarray(self.centroids),
                stream_from=self.index_path,
                doclens=np.asarray(self.doclens, np.int64),
                bucket_weights=np.asarray(self.bucket_weights),
                nbits=self.config.nbits,
                balance_cap=balance_cap,
                deleted_pids=self.deleted_pids,
            )
            self.codes = self.residuals = None
            self.emb2pid = self.emb_offsets = None
            self._init_capacities()
        else:
            self.codes = fmt.load_all_codes(self.index_path)
            self.residuals = fmt.load_all_residuals(self.index_path)
            self.emb2pid = ranking.build_emb2pid(self.doclens)
            self.emb_offsets = np.concatenate(
                [[0], np.cumsum(self.doclens[:-1])]
            ).astype(np.int64) if len(self.doclens) else np.zeros((1,), np.int64)

    # auto-capacity ceilings: the jitted search always pays its STATIC
    # capacity, so exact sizing must not scale unboundedly with the corpus.
    # Small indexes stay exact; past these ceilings the (score-ordered,
    # counted) truncation kicks in and a one-time warning points at the
    # config overrides.
    AUTO_CELL_CAP_MAX = 4096
    AUTO_MAX_CANDIDATES_MAX = 8192

    def _init_capacities(self) -> None:
        """Static capacities of the jitted search program. Auto mode sizes
        them exactly (no truncation) up to a ceiling; explicit config values
        trade recall for speed. Any truncation is warned about, and actual
        overflow is counted at query time."""
        import logging

        cfg = self.config
        logger = logging.getLogger(__name__)
        # pallas fused decompress+MaxSim for stage-2 (TPU only): ~XLA-par
        # at most batch buckets, 18x faster at the B=8 bucket where XLA
        # schedules pathologically, and higher fp32 accuracy — see
        # device_index._stage2_scores and ops/fused_maxsim.py
        from colbert_tpu.ops.fused_maxsim import pallas_stage2_supported

        self._stage2_pallas = bool(cfg.use_pallas) and pallas_stage2_supported(
            cfg.nbits, cfg.dim
        )
        # size cell_cap from the PROBING-side cell lengths (the balanced IVF
        # split makes these <= ivf_balance_cap even when storage cells are
        # huge, so auto mode is exact without mega-cell truncation); the
        # sharded backend's per-shard balanced table is the probing side there
        probe_index = getattr(self, "device_index", None) or getattr(
            self, "sharded_index", None
        )
        probe_lengths = getattr(probe_index, "ivf_lengths", None)
        if probe_lengths is not None and len(probe_lengths):
            max_ivf = int(np.asarray(probe_lengths).max())
        else:
            max_ivf = int(self.ivf_lengths.max()) if len(self.ivf_lengths) else 1
        if cfg.search_cell_cap is not None:
            self.cell_cap = int(cfg.search_cell_cap)
        else:
            self.cell_cap = min(
                self.AUTO_CELL_CAP_MAX, max(32, -(-max_ivf // 32) * 32)
            )
        if max_ivf > self.cell_cap:
            logger.warning(
                "cell_cap=%d truncates IVF cells (largest has %d embeddings); "
                "recall may drop vs exhaustive probing — raise "
                "config.search_cell_cap to widen",
                self.cell_cap, max_ivf,
            )
        if cfg.search_max_candidates is not None:
            self.max_candidates = int(cfg.search_max_candidates)
        else:
            exact = max(128, -(-(len(self.doclens) + 1) // 128) * 128)
            self.max_candidates = min(self.AUTO_MAX_CANDIDATES_MAX, exact)

    # ------------------------------------------------------------------

    # every distinct query-batch size B is a new compile of the jitted search
    # program (all shapes static), so serving pads B up to these bucket sizes
    # and slices the tail off the results: at most len(buckets) programs per
    # geometry ever compile, and arbitrary request sizes never retrace.
    # Batches beyond the largest bucket run in largest-bucket chunks.
    QUERY_BATCH_BUCKETS = (1, 4, 8, 16, 32, 64, 128)

    def reload(self) -> "Searcher":
        """Fresh Searcher over the current on-disk artifacts — the read side
        of :class:`~colbert_tpu.indexing.updater.IndexUpdater` changes
        (this instance keeps serving its loaded snapshot). Pair with
        ``serving.BatchingSearcher.swap`` for zero-downtime updates; the
        encoder (and its compiled programs) are shared."""
        return Searcher(self.index_path, encoder=self.encoder, backend=self.backend)

    def set_balance_cap(self, cap: int | None) -> None:
        """Re-balance the probe-side IVF for a new ``ivf_balance_cap``
        WITHOUT reloading the index (device backend only; the balanced
        split affects only the probe tables —
        :meth:`~colbert_tpu.retrieval.device_index.DeviceIndex.rebalance`).
        ``cap`` follows ``config.ivf_balance_cap`` semantics: ``None`` =
        the 1024 default, ``<= 0`` = no splitting, ``> 0`` = the cap.
        Updates the config and re-sizes the auto capacities (``cell_cap``
        follows the probe-side cell lengths), so the next search compiles
        the new geometry (~seconds with the persistent cache). The
        autotuner sweeps this to pick the per-corpus cap automatically."""
        if self.backend != "device":
            raise NotImplementedError(
                "set_balance_cap: device backend only (rebuild the "
                "Searcher for sharded/host)"
            )
        self.config.ivf_balance_cap = cap
        balance_cap = 1024 if cap is None else (cap if cap > 0 else None)
        self.device_index.rebalance(self.ivf_lengths, balance_cap)
        self._init_capacities()

    def search(self, query: str, k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        """-> (pids (k,), scores (k,)) for one query (reference searching.jl:93-128)."""
        pids, scores = self.search_batch([query], k)
        return pids[0], scores[0]

    def search_batch(
        self, queries: Sequence[str], k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched retrieval -> (pids (B, k), scores (B, k))."""
        if self.backend in ("device", "sharded"):
            return self.finish_search(self.launch_search(queries, k), k)
        return self._search_batch_impl(queries, k)

    # --- async serving primitives (device + sharded backends) ----------
    # launch_search dispatches the fused device program(s) for one query
    # batch WITHOUT blocking (JAX dispatch is asynchronous); finish_search
    # blocks on the result D2H. Keeping the next batch's launch ahead of the
    # previous batch's finish overlaps host work (tokenization, result
    # conversion, the ~50-60 ms dispatch floor) with device execution —
    # search_stream and serving.BatchingSearcher both pipeline through this
    # pair. Results are bit-identical to search_batch.

    def _device_search_kwargs(self, k: int, probe_index) -> dict:
        cfg = self.config
        ncand, threshold = self._stage_params(k)
        nprobe = cfg.nprobe
        if cfg.probe_dup_compensation:
            nprobe = probe_index.compensated_nprobe(
                nprobe, saturate=cfg.probe_comp_saturation
            )
        return dict(
            k=k, nprobe=nprobe, ncandidates=ncand,
            cell_cap=self.cell_cap, max_candidates=self.max_candidates,
            centroid_threshold=threshold,
            stage1_refine=cfg.plaid_stage1_refine,
            refine_width=cfg.refine_width_factor,
        )

    def launch_search(self, queries: Sequence[str], k: int = 10) -> list:
        """Tokenize + dispatch the fused search for ``queries`` without
        blocking -> opaque handle for :meth:`finish_search`. Batches wider
        than the largest query-batch bucket split into bucket-sized
        launches; narrower ones pad up (finish slices the tail off).
        Device and sharded backends only."""
        from colbert_tpu.tokenization.tensorize import tensorize_queries

        cfg = self.config
        sharded = self.backend == "sharded"
        index = self.sharded_index if sharded else self.device_index
        kw = self._device_search_kwargs(k, index)
        if not sharded:
            # the fully fused single-device program also runs the query BERT
            # encode in-program from token ids
            kw.update(use_pallas=self._stage2_pallas,
                      dtype_name=cfg.activation_dtype)
        cap = self.QUERY_BATCH_BUCKETS[-1]
        parts = []  # [(true_B, PendingSearch | PendingShardSearch)]
        for i in range(0, len(queries), cap):
            piece = list(queries[i:i + cap])
            B = len(piece)
            padded = next(b for b in self.QUERY_BATCH_BUCKETS if b >= B)
            piece = piece + [""] * (padded - B)
            if sharded:
                # encode on device (no host round-trip) and hand the live
                # array straight to the shard_map program
                Q = self.encoder.encode_queries_device(piece)
                parts.append((B, index.search_Q_batch_async(Q, **kw)))
                continue
            ids, mask = tensorize_queries(
                piece,
                self.encoder.tokenizer,
                query_token_id=self.encoder.query_token_id,
                query_maxlen=cfg.query_maxlen,
                attend_to_mask_tokens=cfg.attend_to_mask_tokens,
            )
            parts.append((B, index.search_tokens_batch_async(
                self.encoder.params, self.encoder.bert_config, ids, mask,
                **kw,
            )))
        return parts

    def finish_search(
        self, parts: list, k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Block on a :meth:`launch_search` handle -> (pids (B,k), scores)."""
        if not parts:  # empty query batch
            return (np.empty((0, k), np.int64), np.empty((0, k), np.float32))
        index = self.sharded_index if self.backend == "sharded" else self.device_index
        outs = [(B, index.finalize(p)) for B, p in parts]
        pids = np.concatenate([pi[:B] for B, (pi, _) in outs])
        scores = np.concatenate([sc[:B] for B, (_, sc) in outs])
        if pids.shape[1] < k:  # tiny index: fewer than k hits exist
            pad = k - pids.shape[1]
            pids = np.pad(pids, ((0, 0), (0, pad)), constant_values=-1)
            scores = np.pad(
                scores.astype(np.float32), ((0, 0), (0, pad)),
                constant_values=-np.inf,
            )
        return pids.astype(np.int64), scores.astype(np.float32)

    def search_stream(
        self, query_batches, k: int = 10, max_inflight: int = 2
    ):
        """Pipelined batched search: yields one (pids, scores) pair per
        input batch (order preserved), keeping up to ``max_inflight``
        device programs in flight.

        JAX dispatch is asynchronous, so launching batch N+1's fused
        program before reading batch N's results overlaps the host work
        (tokenization, result conversion) and the result D2H with device
        execution — the serving win is the fixed per-batch host+dispatch
        cost, which otherwise serializes with the program (~50-60 ms
        dispatch floor through the tunnel). Works on the device and
        sharded backends; the host backend falls back to sequential
        :meth:`search_batch` (same results, no overlap). Batches wider
        than the largest query-batch bucket are split into bucket-sized
        launches and re-joined on yield.
        """
        if self.backend not in ("device", "sharded"):
            for qb in query_batches:
                yield self.search_batch(list(qb), k)
            return

        from collections import deque

        pending = deque()
        for qb in query_batches:
            if len(pending) >= max(1, max_inflight):
                yield self.finish_search(pending.popleft(), k)
            pending.append(self.launch_search(list(qb), k))
        while pending:
            yield self.finish_search(pending.popleft(), k)

    def _search_batch_impl(
        self, queries: Sequence[str], k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host-backend search (the device and sharded backends route
        through launch_search/finish_search in :meth:`search_batch`)."""
        cfg = self.config
        B = len(queries)
        out_pids = np.full((B, k), -1, np.int64)
        out_scores = np.full((B, k), -np.inf, np.float32)

        Q = jnp.asarray(self.encoder.encode_queries(list(queries)))  # (B, Lq, dim)

        cells = np.asarray(
            ranking.probe_centroids(Q, self.centroids, nprobe=cfg.nprobe)
        )  # (B, Lq, nprobe)
        for b in range(B):
            pids = ranking.candidate_pids(
                cells[b], self.ivf, self.ivf_lengths, self.emb2pid
            )
            if len(pids) == 0:
                continue
            pids, scores = self._score_pids(Q[b : b + 1], pids, k)
            order = np.argsort(-scores)[:k]
            kk = len(order)
            out_pids[b, :kk] = pids[order]
            out_scores[b, :kk] = scores[order]
        return out_pids, out_scores

    # ------------------------------------------------------------------

    def _stage_params(self, k: int) -> Tuple[int, float | None]:
        """(stage-2 doc budget, stage-1 cell threshold) for a top-k search.

        Stage-2 (full decompress+MaxSim) is the gather-bandwidth-bound
        stage; with pruning on, only ``plaid_stage2_docs`` (default
        ``max(16k, 1024)`` — PLAID's operating point) survivors of the
        centroid-only stage-1 are fully scored.
        """
        cfg = self.config
        if not cfg.use_plaid_pruning:
            return self.max_candidates, None
        ndocs = cfg.plaid_stage2_docs or max(16 * k, 1024)
        return min(cfg.ncandidates, ndocs), cfg.centroid_score_threshold

    def _score_pids(
        self, Qb: jnp.ndarray, pids: np.ndarray, k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.config
        ndocs, _ = self._stage_params(k)
        # PLAID stage 1: centroid-only scores, keep the stage-2 doc budget
        if cfg.use_plaid_pruning and len(pids) > ndocs:
            idx, mask = ranking.gather_padded(
                pids, self.doclens, self.emb_offsets
            )
            approx = np.asarray(
                ranking.score_approx(
                    Qb, jnp.asarray(self.codes[idx]), jnp.asarray(mask), self.centroids
                )
            )[0, : len(pids)]
            keep = np.argsort(-approx)[:ndocs]
            pids = pids[np.sort(keep)]

        idx, mask = ranking.gather_padded(pids, self.doclens, self.emb_offsets)
        scores = np.asarray(
            ranking.score_full(
                Qb,
                jnp.asarray(self.codes[idx]),
                jnp.asarray(self.residuals[idx]),
                jnp.asarray(mask),
                self.centroids,
                self.bucket_weights,
                nbits=cfg.nbits,
            )
        )[0, : len(pids)]
        return pids, scores


def search(searcher: Searcher, query: str, k: int = 10):
    """Functional alias mirroring the reference's ``search`` export."""
    return searcher.search(query, k)
