"""Benchmark: ColBERT doc-encode throughput at bert-base scale on one chip.

Headline metric mirrors the reference's directly comparable number:
``encode_passages`` throughput. Baseline: 40 passages/s — 1,000 LoTTe
passages in 25.25s (warm) on one CUDA GPU (reference:
src/modelling/checkpoint.jl:151-155; see BASELINE.md). Model here is a
bert-base-sized ColBERT (12 layers, hidden 768, dim 128) with deterministic
random weights (no checkpoints ship in this zero-egress environment;
throughput is weight-independent) over synthetic ~110-word passages (the
reference corpus averages 120 tokens/doc).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostics (full index-build throughput, search latency) go to stderr.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np

BASELINE_ENCODE_PASSAGES_PER_SEC = 40.0  # checkpoint.jl:151-155 (25.25s / 1000)
BASELINE_BUILD_PASSAGES_PER_SEC = 16.1   # examples/AIHelpMe/indexing_output:121


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_bench_encoder(n_words: int = 2000):
    import jax

    from colbert_tpu.config import ColBERTConfig
    from colbert_tpu.models.bert import BertConfig
    from colbert_tpu.models.colbert import init_colbert_params
    from colbert_tpu.models.encoder import ColBERTEncoder
    from colbert_tpu.tokenization.wordpiece import WordPieceTokenizer

    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[unused0]", "[unused1]"]
    words = [f"word{i:05d}" for i in range(n_words)]
    vocab = {t: i for i, t in enumerate(specials + words + list("!,.?;:'\"()-"))}
    tokenizer = WordPieceTokenizer(vocab)
    bert_cfg = BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
    )
    cfg = ColBERTConfig(
        dim=128, doc_maxlen=300, query_maxlen=32, index_bsize=64,
        length_bucket=64, nbits=2, kmeans_niters=4, chunksize=2048,
    )
    params = init_colbert_params(jax.random.PRNGKey(0), bert_cfg, dim=128)
    return ColBERTEncoder(params, bert_cfg, tokenizer, cfg), cfg


def synthetic_passages(n: int, mean_words: int = 110, n_words: int = 2000) -> list[str]:
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n):
        k = int(rng.integers(mean_words - 30, mean_words + 30))
        ids = rng.integers(0, n_words, k)
        out.append(" ".join(f"word{i:05d}" for i in ids))
    return out


def main() -> None:
    encoder, cfg = make_bench_encoder()

    # --- headline: encode_passages throughput (vs reference 40 p/s) ---
    warm = synthetic_passages(256)
    t = time.time()
    encoder.encode_passages(warm)
    log(f"warmup encode (256 passages, incl. compile): {time.time() - t:.1f}s")

    n = 1024
    passages = synthetic_passages(n)
    t0 = time.time()
    embs, doclens = encoder.encode_passages(passages)
    dt = time.time() - t0
    pps = n / dt
    log(f"encode: {n} passages ({int(doclens.sum())} embeddings) in {dt:.2f}s "
        f"= {pps:.1f} passages/s")

    # --- secondary: full index build + search latency (stderr only) ---
    try:
        from colbert_tpu.indexing.builder import Indexer
        from colbert_tpu.retrieval.searcher import Searcher

        nb = 2048
        bp = synthetic_passages(nb)
        with tempfile.TemporaryDirectory() as d:
            t1 = time.time()
            Indexer(cfg, encoder=encoder, collection=bp).index(d + "/idx")
            bt = time.time() - t1
            log(f"full index build: {nb} passages in {bt:.1f}s = {nb/bt:.1f} p/s "
                f"(baseline {BASELINE_BUILD_PASSAGES_PER_SEC}; includes one-time "
                f"program overhead)")
            s = Searcher(d + "/idx", encoder=encoder)
            s.search(bp[0], k=5)  # warm
            t2 = time.time()
            reps = 20
            for i in range(reps):
                s.search(bp[i], k=5)
            log(f"search latency (warm, 1 query): {(time.time()-t2)/reps*1000:.1f} ms")
    except Exception as e:  # secondary metrics must never break the headline
        log(f"secondary bench failed: {e!r}")

    print(json.dumps({
        "metric": "encode_passages_per_sec",
        "value": round(pps, 2),
        "unit": "passages/s",
        "vs_baseline": round(pps / BASELINE_ENCODE_PASSAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
