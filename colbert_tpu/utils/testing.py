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

__all__ = [
    "make_vocab", "make_encoder", "synthetic_collection", "synthesize_index",
]

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


def synthesize_index(
    path: str,
    n_passages: int,
    *,
    dim: int = 128,
    nbits: int = 2,
    avg_doclen: int = 110,
    chunksize: int = 25_000,
    num_partitions: int | None = None,
    seed: int = 0,
    code_locality: bool = True,
) -> dict:
    """Write a complete, loadable index straight to disk — random but
    mutually consistent codec/chunks/IVF/plan, NO encoder involved. For
    load-time and serving-capacity experiments at scales where a real
    encode would dominate the experiment (1M+ passages). Returns the plan.

    ``code_locality`` draws each passage's token codes near a per-passage
    base cell (real indexes cluster a passage's tokens into few cells);
    False gives uniform codes (perfectly balanced IVF).
    """
    import math

    from colbert_tpu.config import ColBERTConfig
    from colbert_tpu.indexing.planner import setup_plan
    from colbert_tpu.storage import format as fmt

    rng = np.random.default_rng(seed)
    plan = setup_plan(n_passages, float(avg_doclen), 10**9, chunksize, 1)
    if num_partitions is not None:
        plan["num_partitions"] = int(num_partitions)
    k = plan["num_partitions"]
    nbytes = dim // 8 * nbits

    cfg = ColBERTConfig(dim=dim, nbits=nbits)
    cfg.save(f"{path}/config.json")
    centroids = rng.normal(size=(k, dim)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    q = 2**nbits
    cutoffs = np.linspace(-0.02, 0.02, q - 1).astype(np.float32)
    weights = np.linspace(-0.025, 0.025, q).astype(np.float32)
    fmt.save_codec(path, centroids, cutoffs, weights, 0.02)

    all_codes = []
    offsets = []
    total = 0
    for ci in range(plan["num_chunks"]):
        lo = ci * chunksize
        n_chunk = min(chunksize, n_passages - lo)
        doclens = rng.integers(
            max(8, avg_doclen - 30), avg_doclen + 30, size=n_chunk
        ).astype(np.int32)
        rows = int(doclens.sum())
        if code_locality:
            base = rng.integers(0, k, size=n_chunk)
            codes = (
                np.repeat(base, doclens) + rng.integers(0, 32, size=rows)
            ) % k
        else:
            codes = rng.integers(0, k, size=rows)
        codes = codes.astype(np.uint32)
        residuals = rng.integers(0, 256, size=(rows, nbytes), dtype=np.uint8)
        fmt.save_chunk(
            path, ci, codes=codes, residuals=residuals,
            doclens=doclens, passage_offset=lo,
        )
        all_codes.append(codes)
        offsets.append(total)
        total += rows
    plan["num_embeddings"] = total
    plan["embedding_offsets"] = offsets
    fmt.save_plan(path, plan)

    from colbert_tpu.indexing.builder import build_ivf

    ivf, ivf_lengths = build_ivf(np.concatenate(all_codes), k)
    fmt.save_ivf(path, ivf, ivf_lengths)
    return plan


def synthetic_collection(n: int, seed: int = 0, words_per_doc: int = 12) -> list[str]:
    """Deterministic pseudo-text passages over the tiny vocab's word list."""
    rng = np.random.default_rng(seed)
    words = _BASE_WORDS[: len(_BASE_WORDS) - 11]  # drop punctuation-only tail
    docs = []
    for _ in range(n):
        k = rng.integers(max(3, words_per_doc // 2), words_per_doc + 1)
        docs.append(" ".join(rng.choice(words, size=k)))
    return docs
