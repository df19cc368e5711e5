"""Deterministic test/bench fixtures: tiny vocab + random-weight encoders.

No model checkpoints ship with this environment (zero egress), so
integration tests and benchmarks run the real code paths with seeded
random weights — SURVEY §4's 'tiny deterministic fake encoder' suggestion,
implemented as a *real* ColBERT encoder with random params so every code
path (tokenizer, BERT forward, masking, codec) is the production one.
"""

from __future__ import annotations

import jax
import numpy as np

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.models.bert import BertConfig
from colbert_tpu.models.colbert import init_colbert_params
from colbert_tpu.models.encoder import ColBERTEncoder
from colbert_tpu.tokenization.wordpiece import WordPieceTokenizer

__all__ = ["make_vocab", "make_encoder", "synthetic_collection"]

_SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[unused0]", "[unused1]"]
_BASE_WORDS = [
    "the", "a", "of", "and", "to", "in", "is", "it", "dog", "cat", "bird",
    "fish", "runs", "jumps", "sleeps", "eats", "red", "blue", "green", "big",
    "small", "fast", "slow", "house", "tree", "river", "mountain", "city",
    "music", "science", "history", "cooking", "sports", "travel",
] + list("!,.?;:'\"()-")


def make_vocab(extra_words: int = 64) -> dict[str, int]:
    words = _SPECIALS + _BASE_WORDS + [f"w{i}" for i in range(extra_words)]
    return {w: i for i, w in enumerate(words)}


def make_encoder(
    *,
    dim: int = 32,
    seed: int = 0,
    config: ColBERTConfig | None = None,
    bert_config: BertConfig | None = None,
) -> ColBERTEncoder:
    vocab = make_vocab()
    tokenizer = WordPieceTokenizer(vocab)
    bert_cfg = bert_config or BertConfig(
        vocab_size=len(vocab),
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=512,
    )
    cfg = config or ColBERTConfig(dim=dim, doc_maxlen=64, query_maxlen=16,
                                  index_bsize=8, length_bucket=16)
    params = init_colbert_params(jax.random.PRNGKey(seed), bert_cfg, dim=dim)
    return ColBERTEncoder(params, bert_cfg, tokenizer, cfg)


def synthetic_collection(n: int, seed: int = 0, words_per_doc: int = 12) -> list[str]:
    """Deterministic pseudo-text passages over the tiny vocab's word list."""
    rng = np.random.default_rng(seed)
    words = _BASE_WORDS[: len(_BASE_WORDS) - 11]  # drop punctuation-only tail
    docs = []
    for _ in range(n):
        k = rng.integers(max(3, words_per_doc // 2), words_per_doc + 1)
        docs.append(" ".join(rng.choice(words, size=k)))
    return docs
