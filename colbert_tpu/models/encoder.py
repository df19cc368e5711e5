"""High-level encode pipeline: texts -> compacted token embeddings.

Reference: src/modelling/checkpoint.jl:159-189 ``encode_passages`` and
:271-301 ``encode_queries``. The reference loops ``index_bsize`` batches with
a GPU->CPU transfer and a growing ``cat`` per batch — its measured bottleneck
(43% GC time in the 141k-doc build, SURVEY §3.5). Here:

  - batches are *length-bucketed* (sorted by token length, padded to a small
    closed set of bucket lengths) so the jitted forward compiles a handful of
    shapes and wastes no FLOPs on pad tokens,
  - each batch is one jitted device program; results land in a preallocated
    host array (no quadratic concatenation),
  - the same pipeline object serves indexing and searching.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.models.bert import BertConfig
from colbert_tpu.models.colbert import (
    ColBERTParams,
    compact_doc_embeddings,
    encode_batch,
    encode_compress_batch,
    skiplist_keep_mask,
)
from colbert_tpu.tokenization.tensorize import (
    build_skiplist,
    tensorize_docs,
    tensorize_queries,
)
from colbert_tpu.tokenization.wordpiece import WordPieceTokenizer

__all__ = ["ColBERTEncoder"]


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

    def tokenize_batch(self, texts: Sequence[str]) -> list[list[int]]:
        return self._native_tok.encode_batch(list(texts))

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
        """
        cfg = self.config
        n = len(passages)
        if n == 0:
            return np.zeros((0, self.dim), np.float32), np.zeros((0,), np.int64)

        per_passage_embs: list[np.ndarray | None] = [None] * n
        doclens = np.zeros((n,), np.int64)
        for idx, ids, mask, keep in self._doc_batches(passages):
            emb = encode_batch(
                self.params,
                jnp.asarray(ids),
                jnp.asarray(mask),
                jnp.asarray(keep),
                cfg=self.bert_config,
                dtype_name=cfg.activation_dtype,
            )
            emb = np.asarray(emb)
            for row, i in enumerate(idx):
                k = keep[row]
                per_passage_embs[i] = emb[row][k]
                doclens[i] = int(k.sum())

        flat = np.concatenate([e for e in per_passage_embs], axis=0) if n else None
        return np.ascontiguousarray(flat, dtype=np.float32), doclens

    def _doc_batches(self, passages: Sequence[str]):
        """Length-sorted batches -> (orig_indices, ids, attn_mask, keep_mask).

        Tokenizes once (native C++ path when available), sorts by token
        length, and tensorizes each batch from the pre-tokenized ids.
        """
        cfg = self.config
        token_ids = self.tokenize_batch(passages)
        order = np.argsort([len(t) for t in token_ids], kind="stable")
        bsize = cfg.index_bsize
        for start in range(0, len(passages), bsize):
            idx = order[start : start + bsize]
            ids, mask = tensorize_docs(
                [passages[i] for i in idx],
                self.tokenizer,
                doc_token_id=self.doc_token_id,
                doc_maxlen=cfg.doc_maxlen,
                length_bucket=cfg.length_bucket,
                encoded=[token_ids[i] for i in idx],
            )
            keep = skiplist_keep_mask(ids, mask, self.skiplist)
            yield idx, ids, mask, keep

    def encode_passages_to_device(
        self, passages: Sequence[str]
    ) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
        """-> (padded flat embeddings ON DEVICE (M, dim), valid (M,) host bool,
        doclens (N,) host).

        Device-resident variant for the codec training phase: fp32 embeddings
        never cross the device->host link. Instead of compacting (which would
        need one gather program per distinct batch occupancy — a recompile
        per batch), the padded per-batch blocks are concatenated as-is and a
        host-side validity mask marks real token rows; the k-means/quantile
        consumers weight rows by validity. Row order is encode order, NOT
        passage order (training statistics don't care).
        """
        cfg = self.config
        n = len(passages)
        if n == 0:
            return (jnp.zeros((0, self.dim), jnp.float32), np.zeros((0,), bool),
                    np.zeros((0,), np.int64))
        flats = []
        valids = []
        doclens = np.zeros((n,), np.int64)
        for idx, ids, mask, keep in self._doc_batches(passages):
            emb = encode_batch(
                self.params,
                jnp.asarray(ids),
                jnp.asarray(mask),
                jnp.asarray(keep),
                cfg=self.bert_config,
                dtype_name=cfg.activation_dtype,
            )
            B, L, dim = emb.shape
            flats.append(emb.reshape(B * L, dim))
            valids.append(keep.reshape(B * L))
            doclens[idx] = keep.sum(axis=1)
        flat = flats[0] if len(flats) == 1 else jnp.concatenate(flats, axis=0)
        return flat, np.concatenate(valids), doclens

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
        doclens = np.zeros((n,), np.int64)
        per_passage: list[tuple[np.ndarray, np.ndarray]] = [None] * n  # type: ignore
        pending = []
        for idx, ids, mask, keep in self._doc_batches(passages):
            codes_d, res_d = encode_compress_batch(
                self.params,
                jnp.asarray(ids),
                jnp.asarray(mask),
                jnp.asarray(keep),
                centroids,
                bucket_cutoffs,
                cfg=self.bert_config,
                dtype_name=cfg.activation_dtype,
                nbits=nbits,
            )
            # async dispatch: defer host transfers so the next batch's
            # compute overlaps this batch's (slow) device->host copy
            pending.append((idx, keep, codes_d, res_d))
            doclens[idx] = keep.sum(axis=1)
        for idx, keep, codes_d, res_d in pending:
            codes = np.asarray(codes_d)
            res = np.asarray(res_d)
            for r, passage_i in enumerate(idx):
                k = keep[r]
                per_passage[passage_i] = (codes[r][k], res[r][k])
        flat_codes = np.concatenate([c for c, _ in per_passage])
        flat_res = np.concatenate([r for _, r in per_passage], axis=0)
        return flat_codes.astype(np.uint32), flat_res, doclens

    # -- queries -------------------------------------------------------------

    def encode_queries(self, queries: Sequence[str]) -> np.ndarray:
        """-> (N, query_maxlen, dim) fp32 normalized query embeddings."""
        cfg = self.config
        out = np.zeros((len(queries), cfg.query_maxlen, self.dim), np.float32)
        bsize = cfg.index_bsize
        for start in range(0, len(queries), bsize):
            batch = queries[start : start + bsize]
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
            emb = encode_batch(
                self.params,
                jnp.asarray(ids),
                jnp.asarray(mask),
                jnp.asarray(keep),
                cfg=self.bert_config,
                dtype_name=cfg.activation_dtype,
            )
            out[start : start + len(batch)] = np.asarray(emb)
        return out
