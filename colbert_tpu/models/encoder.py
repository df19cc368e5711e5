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

        # tokenize everything once, sort by length
        token_ids = self.tokenizer.encode_batch(passages)
        order = np.argsort([len(t) for t in token_ids], kind="stable")

        per_passage_embs: list[np.ndarray | None] = [None] * n
        doclens = np.zeros((n,), np.int64)
        bsize = cfg.index_bsize
        for start in range(0, n, bsize):
            idx = order[start : start + bsize]
            ids, mask = tensorize_docs(
                [passages[i] for i in idx],
                self.tokenizer,
                doc_token_id=self.doc_token_id,
                doc_maxlen=cfg.doc_maxlen,
                length_bucket=cfg.length_bucket,
            )
            keep = skiplist_keep_mask(ids, mask, self.skiplist)
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
