"""High-level encode pipeline: texts -> compacted token embeddings.

Reference: src/modelling/checkpoint.jl:159-189 ``encode_passages`` and
:271-301 ``encode_queries``. The reference loops ``index_bsize`` batches with
a GPU->CPU transfer and a growing ``cat`` per batch — its measured bottleneck
(43% GC time in the 141k-doc build, SURVEY §3.5). Here:

  - batches are *length-bucketed* (sorted by token length, padded to a small
    closed set of bucket lengths) so the jitted forward compiles a handful of
    shapes and wastes no FLOPs on pad tokens,
  - device programs are dispatched asynchronously with a bounded in-flight
    window: batch ``i+1``'s host tokenize/tensorize and device compute
    overlap batch ``i``'s device->host transfer,
  - host-side compaction (dropping masked token rows, restoring original
    passage order) is one vectorized scatter per batch — no per-row Python,
  - attention can route through the pallas flash kernel
    (``config.use_pallas``; length buckets are forced to multiples of 128
    where the kernel requires it),
  - the same pipeline object serves indexing and searching.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.models.bert import BertConfig
from colbert_tpu.models.colbert import (
    ColBERTParams,
    encode_batch,
    encode_compact_batch,
    encode_compress_batch,
    encode_compress_compact_batch,
    skiplist_keep_mask,
)
from colbert_tpu.tokenization.tensorize import (
    build_skiplist,
    tensorize_docs,
    tensorize_queries,
)
from colbert_tpu.tokenization.wordpiece import WordPieceTokenizer

__all__ = ["ColBERTEncoder"]

# batches allowed in flight (dispatched, not yet copied to host) before the
# pipeline drains the oldest; bounds HBM held by outstanding outputs.
MAX_INFLIGHT = 8


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_rows(buf: jax.Array, rows: jax.Array, offset: jax.Array) -> jax.Array:
    """In-place (donated) row append into a preallocated device buffer —
    assembling a device-resident sample without ``jnp.concatenate``'s 2x
    transient (HBM-fatal at 1M-passage sample sizes: the sample alone is
    ~7.5GB bf16)."""
    return jax.lax.dynamic_update_slice(buf, rows, (offset, 0))


def _start_host_copy(*arrays) -> None:
    """Kick off device->host copies without blocking (measured ~1.6x
    end-to-end on a tunneled chip where synchronous D2H serializes with
    compute); ``np.asarray`` later completes them cheaply."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:
            return


def _take_rows(keep: np.ndarray) -> tuple[np.ndarray, int]:
    """keep mask (B, L) -> (take (M,) int32 flat kept-row indices padded to a
    2048-row bucket with duplicates of row 0, real count). The bucket keeps
    the compact-output program shape set closed (every distinct M is a fresh
    XLA compile)."""
    flat = np.flatnonzero(keep.reshape(-1)).astype(np.int32)
    v = flat.shape[0]
    m = max(2048, -(-v // 2048) * 2048)
    take = np.zeros((m,), np.int32)
    take[:v] = flat
    return take, v


def _scatter_compact_rows(
    out: np.ndarray,
    dest_offsets: np.ndarray,
    idx: np.ndarray,
    counts: np.ndarray,
    values: np.ndarray,
) -> None:
    """Scatter one batch's ALREADY-COMPACTED kept rows into the global flat
    array. ``values`` is ``(M, ...)`` in keep-mask row-major order (passage
    ``idx[r]``'s kept tokens are contiguous); ``counts[r]`` is passage
    ``idx[r]``'s kept-token count."""
    total = int(counts.sum())
    if total == 0:
        return
    starts = np.concatenate([[0], np.cumsum(counts[:-1])])
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    dest = np.repeat(dest_offsets[idx], counts) + within
    vals = values[:total]
    out[dest] = vals if vals.dtype == out.dtype else vals.astype(out.dtype)


def _scatter_compact(
    out: np.ndarray,
    dest_offsets: np.ndarray,
    idx: np.ndarray,
    keep: np.ndarray,
    values: np.ndarray,
) -> None:
    """Scatter one batch's kept token rows into the global flat array.

    ``values`` is the batch output ``(B, L, ...)``; row ``r`` holds passage
    ``idx[r]`` whose kept tokens land at ``dest_offsets[idx[r]] + [0..)``.
    Vectorized equivalent of the reference's per-passage flatten+compact
    (embedding_utils.jl:195-205), with original-order restore.
    """
    counts = keep.sum(axis=1).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return
    starts = np.concatenate([[0], np.cumsum(counts[:-1])])
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    dest = np.repeat(dest_offsets[idx], counts) + within
    vals = values[keep]
    # transfers may ride in bf16/fp16 (config.transfer_dtype); upcast here
    out[dest] = vals if vals.dtype == out.dtype else vals.astype(out.dtype)


@dataclass
class ColBERTEncoder:
    """Bundles params + tokenizer + config into doc/query encode calls."""

    params: ColBERTParams
    bert_config: BertConfig
    tokenizer: WordPieceTokenizer
    config: ColBERTConfig
    skiplist: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        if not self.skiplist:
            self.skiplist = build_skiplist(
                self.tokenizer, self.config.mask_punctuation
            )
        self.doc_token_id = self.tokenizer.token_to_id(self.config.doc_token_id)
        self.query_token_id = self.tokenizer.token_to_id(self.config.query_token_id)
        # native (C++) batch tokenizer; output-identical, ~20x faster on the
        # host side, graceful fallback to pure Python
        from colbert_tpu.tokenization.native import NativeWordPiece

        self._native_tok = NativeWordPiece(self.tokenizer)
        # pallas flash attention: TPU backends only, and only for padded
        # lengths >= config.flash_min_seqlen (XLA's fused attention is faster
        # below that — measured on v5e); the kernel needs seqlen % 128 == 0,
        # so when flash can trigger, buckets are coarsened to 128.
        self._flash_capable = bool(self.config.use_pallas) and (
            jax.default_backend() not in ("cpu",)
        )
        self.length_bucket = self.config.length_bucket
        self._strict_buckets = (
            self._flash_capable
            and self.config.doc_maxlen >= self.config.flash_min_seqlen
        )
        if self._strict_buckets and self.length_bucket % 128 != 0:
            self.length_bucket = 128
        # pay the backend's one-time device<->host handshake now (measured
        # ~100s on a tunneled chip's FIRST transfer) instead of inside the
        # first encode call
        np.asarray(jnp.zeros((1,), jnp.float32))
        self.mesh = None
        self._data_sharding = None

    def attach_mesh(self, mesh) -> None:
        """Enable mesh-parallel encoding: batches shard over the ``data``
        axis (padded to its size, leading-dim sharded), and with a ``model``
        axis > 1 the BERT blocks shard Megatron-style
        (:mod:`colbert_tpu.parallel.tp` — column-parallel q/k/v + mlp_in,
        row-parallel attn_out + mlp_out, one all-reduce per block inserted
        by XLA). With model=1 params are simply replicated and the DP
        forward runs with no collectives. SURVEY §2's parallel-encode
        replacement, reachable from the public ``Indexer``/``Searcher``
        facades."""
        from jax.sharding import NamedSharding, PartitionSpec

        from colbert_tpu.parallel.tp import shard_params

        self.mesh = mesh
        self._data_sharding = NamedSharding(mesh, PartitionSpec("data"))
        self.params = shard_params(self.params, mesh, self.bert_config)

    def _put_batch(self, ids, mask, keep):
        """Host arrays -> device arrays (padded + data-sharded under a mesh).

        Returns device arrays whose leading dim may exceed the host batch
        (padded rows have empty masks); callers slice transfers back to the
        real row count.
        """
        if self.mesh is None:
            return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(keep)
        ndev = self.mesh.shape["data"]
        n = ids.shape[0]
        padded = -(-n // ndev) * ndev
        if padded != n:
            pad = ((0, padded - n), (0, 0))
            ids = np.pad(ids, pad)
            mask = np.pad(mask, pad)
            keep = np.pad(keep, pad)
        return (
            jax.device_put(ids, self._data_sharding),
            jax.device_put(mask, self._data_sharding),
            jax.device_put(keep, self._data_sharding),
        )

    def tokenize_batch(self, texts) -> list[list[int]]:
        # lists and byte-backed Collections both pass straight through
        # (Collections take the native zero-decode blob path)
        return self._native_tok.encode_batch(texts)

    def _flash_for(self, padded_len: int) -> bool:
        """Per-batch routing: pallas flash only where it beats XLA."""
        return (
            self._flash_capable
            and padded_len >= self.config.flash_min_seqlen
            and padded_len % 128 == 0
        )

    def _pipeline_batches(self, passages, dispatch):
        """Shared async encode pipeline: dispatch every doc batch, keep at
        most ``MAX_INFLIGHT`` outputs on device (async host copies started at
        dispatch), slice off mesh-padding rows at drain.

        ``dispatch(idx, ids, mask, keep) -> (tuple of device arrays, nrows)``
        where ``nrows`` is how many leading rows of each output are real
        (the batch size for padded-block outputs, the kept-token count for
        compacted outputs). -> (drained [(idx, keep, host arrays...)],
        doclens).
        """
        doclens = np.zeros((len(passages),), np.int64)

        def drain(item):
            idx, keep, outs, nrows = item
            host = []
            for o in outs:
                h = np.asarray(o)[:nrows]
                if h.dtype == np.int8:  # int8 wire: dequantize (see encode_batch)
                    h = h.astype(np.float32) / 127.0
                host.append(h)
            return (idx, keep, *host)

        drained, pending = [], []
        for idx, ids, mask, keep in self._doc_batches(passages):
            outs, nrows = dispatch(idx, ids, mask, keep)
            doclens[idx] = keep.sum(axis=1)
            _start_host_copy(*outs)
            pending.append((idx, keep, outs, nrows))
            if len(pending) > MAX_INFLIGHT:
                drained.append(drain(pending.pop(0)))
        drained.extend(drain(p) for p in pending)
        return drained, doclens

    @property
    def dim(self) -> int:
        return self.params["linear"]["kernel"].shape[1]

    # -- passages ------------------------------------------------------------

    def encode_passages(
        self, passages: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (flat embeddings (sum doclens, dim) fp32, doclens (N,) int64).

        Length-sorted batching: passages are encoded in token-length order so
        each ``index_bsize`` batch pads to its own bucket, then results are
        scattered back to the original passage order (the reference's
        ``_sort_by_length`` is commented out — utils.jl:1-36; here it's on).

        The device->host payload rides in ``config.transfer_dtype`` (default
        bf16: D2H bandwidth is the encode bottleneck, and halving the bytes
        ~doubles throughput on a tunneled chip); the returned array is always
        fp32 (host-side upcast).
        """
        cfg = self.config
        n = len(passages)
        if n == 0:
            return np.zeros((0, self.dim), np.float32), np.zeros((0,), np.int64)

        compact = self.mesh is None  # under a mesh the take-gather would
        # all-gather the sharded batch; ship padded blocks there instead

        def dispatch(idx, ids, mask, keep):
            ids_d, mask_d, keep_d = self._put_batch(ids, mask, keep)
            common = dict(
                cfg=self.bert_config,
                dtype_name=cfg.activation_dtype,
                use_flash=self._flash_for(ids.shape[1]),
                out_dtype_name=cfg.transfer_dtype,
            )
            if compact:
                # ship ONLY kept rows: pad + skiplist rows never cross the
                # wire (the D2H link, not the forward, bounds this path)
                take, v = _take_rows(keep)
                return (encode_compact_batch(
                    self.params, ids_d, mask_d, keep_d, jnp.asarray(take),
                    **common,
                ),), v
            return (encode_batch(
                self.params, ids_d, mask_d, keep_d, **common,
            ),), len(idx)

        drained, doclens = self._pipeline_batches(passages, dispatch)
        dest_offsets = np.concatenate([[0], np.cumsum(doclens[:-1])])
        flat = np.empty((int(doclens.sum()), self.dim), np.float32)
        for idx, keep, emb in drained:
            if compact:
                counts = keep.sum(axis=1).astype(np.int64)
                _scatter_compact_rows(flat, dest_offsets, idx, counts, emb)
            else:
                _scatter_compact(flat, dest_offsets, idx, keep, emb)
        return flat, doclens

    def _doc_batches(
        self, passages: Sequence[str]
    ) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """Length-sorted batches -> (orig_indices, ids, attn_mask, keep_mask).

        Passages are processed in groups of ``config.passages_batch_size``
        (reference: config.jl:83) so host tokenization of group ``g+1``
        overlaps device compute of group ``g``'s async-dispatched batches;
        within a group, batches are token-length-sorted (the reference's
        ``_sort_by_length`` is commented out — utils.jl:1-36; here it's on)
        and tensorized from pre-tokenized ids (native C++ path when
        available).
        """
        cfg = self.config
        bsize = cfg.index_bsize
        group = max(cfg.passages_batch_size, bsize)
        for glo in range(0, len(passages), group):
            ghi = min(len(passages), glo + group)
            token_ids = self.tokenize_batch(passages[glo:ghi])
            order = glo + np.argsort([len(t) for t in token_ids], kind="stable")
            for start in range(0, ghi - glo, bsize):
                idx = order[start : start + bsize]
                ids, mask = tensorize_docs(
                    (),  # texts unused: tensorize consumes pre-tokenized ids
                    self.tokenizer,
                    doc_token_id=self.doc_token_id,
                    doc_maxlen=cfg.doc_maxlen,
                    length_bucket=self.length_bucket,
                    encoded=[token_ids[i - glo] for i in idx],
                    strict_multiple=self._strict_buckets,
                )
                keep = skiplist_keep_mask(ids, mask, self.skiplist)
                yield idx, ids, mask, keep

    def encode_passages_to_device(
        self, passages: Sequence[str], *, return_layout: bool = False
    ) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
        """-> (padded flat embeddings ON DEVICE (M, dim), valid (M,) host bool,
        doclens (N,) host). With ``return_layout`` a fourth element records
        each batch block's (orig_indices, keep, row_offset, B, L) so a later
        pass (``compress_sample_to_host``) can map padded rows back to
        passage order.

        Device-resident variant for the codec training phase: embeddings
        never cross the device->host link. Instead of compacting (which would
        need one gather program per distinct batch occupancy — a recompile
        per batch), the padded per-batch blocks are concatenated as-is and a
        host-side validity mask marks real token rows; the k-means/quantile
        consumers weight rows by validity. Row order is encode order, NOT
        passage order (training statistics don't care).

        The sample is kept in bfloat16: Lloyd statistics and quantile
        histograms accumulate in fp32 regardless, the quantization noise is
        far below the codec's own bucket granularity, and halving the bytes
        is what lets a 250k-passage sample (~29M padded token rows) fit in
        one chip's HBM alongside its transient copies.
        """
        cfg = self.config
        n = len(passages)
        if n == 0:
            empty = (jnp.zeros((0, self.dim), jnp.float32), np.zeros((0,), bool),
                     np.zeros((0,), np.int64))
            return empty + ([],) if return_layout else empty
        # materialize the batch plan first (tokenized host arrays, ~6B/token)
        # so the exact row total is known and the device buffer can be
        # preallocated — appends are then donated in-place updates with NO
        # concatenation transient. Rows are padded up to the codec trainer's
        # shape bucket so the downstream Lloyd/quantile programs recur.
        batches = list(self._doc_batches(passages))
        from colbert_tpu.indexing.codec_trainer import sample_bucket_step

        total = 0
        for _, ids, _, _ in batches:
            b = ids.shape[0]
            if self.mesh is not None:
                ndev = self.mesh.shape["data"]
                b = -(-b // ndev) * ndev
            total += b * ids.shape[1]
        step = sample_bucket_step(total)
        padded = -(-total // step) * step

        doclens = np.zeros((n,), np.int64)
        valid = np.zeros((padded,), bool)
        layout: list[tuple] = []
        buf = jnp.zeros((padded, self.dim), jnp.bfloat16)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            buf = jax.device_put(buf, NamedSharding(self.mesh, PartitionSpec()))
        offset = 0
        for idx, ids, mask, keep in batches:
            ids_d, mask_d, keep_d = self._put_batch(ids, mask, keep)
            emb = encode_batch(
                self.params,
                ids_d,
                mask_d,
                keep_d,
                cfg=self.bert_config,
                dtype_name=cfg.activation_dtype,
                use_flash=self._flash_for(ids.shape[1]),
            )
            B, L, dim = emb.shape  # B includes mesh padding rows (valid=False)
            buf = _append_rows(
                buf, emb.astype(jnp.bfloat16).reshape(B * L, dim),
                jnp.int32(offset),
            )
            # the keep mask is host-born: pad it locally instead of reading
            # keep_d back (a per-batch D2H round-trip costs ~100ms of tunnel
            # latency; over a 200-batch sample that was ~20s of pure sync)
            keep_h = keep if keep.shape[0] == B else np.pad(
                keep, ((0, B - keep.shape[0]), (0, 0))
            )
            valid[offset:offset + B * L] = keep_h.reshape(B * L)
            doclens[idx] = keep.sum(axis=1)
            layout.append((idx, keep, offset, B, L))
            offset += B * L
        if return_layout:
            return buf, valid, doclens, layout
        return buf, valid, doclens

    def compress_sample_to_host(
        self,
        buf: jnp.ndarray,
        layout: list[tuple],
        doclens: np.ndarray,
        centroids: jnp.ndarray,
        bucket_cutoffs: jnp.ndarray,
        *,
        nbits: int,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Compress an already-encoded device-resident sample into host
        (codes (M,), packed residuals (M, nbytes)) in passage order.

        The small-corpus fast path: when the planner samples the ENTIRE
        collection (``sample_pids``' 16·√(120·N) ≥ N for every N ≤ 30720),
        the sample embeddings already ARE the corpus embeddings, yet the
        reference re-encodes every chunk from scratch for the index proper
        (collection_indexer.jl:271-297). This pass replaces that second full
        BERT sweep with ONE fused compress program over the padded sample
        buffer plus ONE D2H of the packed artifacts (~36 B/token at nbits=2).

        Numerics note: the sample rides bf16 (the HBM-halving documented in
        ``encode_passages_to_device``), so codes/bucket indices can differ
        from the fp32 fused path at ulp-level argmax/bucket ties — far below
        the codec's own quantization granularity.
        """
        from colbert_tpu.ops import codec as codec_ops

        codes_d, res_d = codec_ops.compress(
            buf, centroids, bucket_cutoffs, nbits=nbits
        )
        _start_host_copy(codes_d, res_d)
        codes_h = np.asarray(codes_d)
        res_h = np.asarray(res_d)
        nbytes = self.dim // 8 * nbits
        dest_offsets = np.concatenate([[0], np.cumsum(doclens[:-1])])
        total = int(doclens.sum())
        flat_codes = np.empty((total,), np.uint32)
        flat_res = np.empty((total, nbytes), np.uint8)
        for idx, keep, offset, B, L in layout:
            blk_codes = codes_h[offset:offset + B * L].reshape(B, L)[: len(idx)]
            blk_res = res_h[offset:offset + B * L].reshape(B, L, nbytes)[: len(idx)]
            _scatter_compact(flat_codes, dest_offsets, idx, keep, blk_codes)
            _scatter_compact(flat_res, dest_offsets, idx, keep, blk_res)
        return flat_codes, flat_res

    def encode_passages_compressed(
        self,
        passages: Sequence[str],
        centroids: jnp.ndarray,
        bucket_cutoffs: jnp.ndarray,
        *,
        nbits: int,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Fused encode+compress -> (codes (M,), packed residuals (M, nbytes),
        doclens (N,)) in original passage order, all host numpy.

        The indexing hot path: only compressed artifacts (~36 bytes/token at
        nbits=2) cross the device->host link instead of fp32 embeddings
        (512 bytes/token).
        """
        cfg = self.config
        n = len(passages)
        nbytes = self.dim // 8 * nbits
        if n == 0:
            return (np.zeros((0,), np.uint32), np.zeros((0, nbytes), np.uint8),
                    np.zeros((0,), np.int64))

        compact = self.mesh is None  # see encode_passages

        def dispatch(idx, ids, mask, keep):
            ids_d, mask_d, keep_d = self._put_batch(ids, mask, keep)
            common = dict(
                cfg=self.bert_config,
                dtype_name=cfg.activation_dtype,
                nbits=nbits,
                use_flash=self._flash_for(ids.shape[1]),
            )
            if compact:
                # compact BEFORE compressing: pad/skiplist rows skip the
                # codec matmul and never cross the wire
                take, v = _take_rows(keep)
                return encode_compress_compact_batch(
                    self.params, ids_d, mask_d, keep_d, centroids,
                    bucket_cutoffs, jnp.asarray(take), **common,
                ), v
            return encode_compress_batch(
                self.params, ids_d, mask_d, keep_d, centroids, bucket_cutoffs,
                **common,
            ), len(idx)

        drained, doclens = self._pipeline_batches(passages, dispatch)
        dest_offsets = np.concatenate([[0], np.cumsum(doclens[:-1])])
        total = int(doclens.sum())
        flat_codes = np.empty((total,), np.uint32)
        flat_res = np.empty((total, nbytes), np.uint8)
        for idx, keep, codes, res in drained:
            if compact:
                counts = keep.sum(axis=1).astype(np.int64)
                _scatter_compact_rows(flat_codes, dest_offsets, idx, counts, codes)
                _scatter_compact_rows(flat_res, dest_offsets, idx, counts, res)
            else:
                _scatter_compact(flat_codes, dest_offsets, idx, keep, codes)
                _scatter_compact(flat_res, dest_offsets, idx, keep, res)
        return flat_codes, flat_res, doclens

    # -- queries -------------------------------------------------------------

    def encode_queries(self, queries: Sequence[str]) -> np.ndarray:
        """-> (N, query_maxlen, dim) fp32 normalized query embeddings."""
        cfg = self.config
        out = np.zeros((len(queries), cfg.query_maxlen, self.dim), np.float32)
        bsize = cfg.index_bsize
        for start in range(0, len(queries), bsize):
            batch = queries[start : start + bsize]
            emb = self._encode_query_batch_device(batch)
            out[start : start + len(batch)] = np.asarray(emb)[: len(batch)]
        return out

    def encode_queries_device(self, queries: Sequence[str]):
        """-> (N, query_maxlen, dim) fp32 query embeddings as a LIVE device
        array — no host round-trip. Serving paths that feed the embeddings
        straight into another device program (the sharded search) use this:
        ``encode_queries`` would pull the batch over the tunnel (~100 ms D2H)
        only to re-upload it."""
        import jax.numpy as jnp

        bsize = self.config.index_bsize
        parts = []
        for s in range(0, len(queries), bsize):
            n = len(queries[s : s + bsize])
            # _put_batch may pad the batch (mesh sharding); drop pad rows
            parts.append(self._encode_query_batch_device(queries[s : s + bsize])[:n])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def _encode_query_batch_device(self, batch: Sequence[str]):
        """One <=index_bsize query batch -> device embeddings (async)."""
        cfg = self.config
        ids, mask = tensorize_queries(
            batch,
            self.tokenizer,
            query_token_id=self.query_token_id,
            query_maxlen=cfg.query_maxlen,
            attend_to_mask_tokens=cfg.attend_to_mask_tokens,
        )
        # query skiplist is pad-only (searching.jl:62); pads were replaced
        # by [MASK], so every position is kept.
        keep = np.ones_like(mask)
        ids_d, mask_d, keep_d = self._put_batch(ids, mask, keep)
        return encode_batch(
            self.params,
            ids_d,
            mask_d,
            keep_d,
            cfg=self.bert_config,
            dtype_name=cfg.activation_dtype,
        )
