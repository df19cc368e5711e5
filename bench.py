"""Benchmark: end-to-end index build + serving throughput on one TPU chip.

Headline metric is the reference's own headline: full index-build
passages/sec. Baseline: 16.1 p/s — 141,431 passages in 8,771.6s on one CUDA
GPU (reference: examples/AIHelpMe/indexing_output:121; see BASELINE.md).
The build here runs twice: the first pass pays one-time program compiles
(cached on disk across runs) and the second measures steady state, which is
what a long build amortizes to.

Secondary numbers on stderr: encode throughput (passages/s, tokens/s,
estimated MFU vs the reference's 40 p/s), batched-query QPS (the serving
north star, BASELINE.md "≥10x QPS/chip"), and single-query p50 latency.

Model: bert-base-sized ColBERT (12 layers, hidden 768, dim 128) with
deterministic random weights (no checkpoints ship in this zero-egress
environment; throughput is weight-independent) over synthetic ~110-word
passages (the reference corpus averages 120 tokens/doc).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import numpy as np

BASELINE_ENCODE_PASSAGES_PER_SEC = 40.0  # checkpoint.jl:151-155 (25.25s / 1000)
BASELINE_BUILD_PASSAGES_PER_SEC = 16.1   # examples/AIHelpMe/indexing_output:121
BF16_PEAK_TFLOPS = 197.0                 # TPU v5e
BERT_BASE_GFLOP_PER_TOKEN = 0.22         # ~2 x 110M params, forward


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
        dim=128, doc_maxlen=300, query_maxlen=32, index_bsize=256,
        length_bucket=128, nbits=2, kmeans_niters=4, chunksize=4096,
        # serving funnel: static shapes mean the jitted search always pays
        # its capacity, so cap the dedup set and stage-2 docs (score-ordered
        # truncation + PLAID pruning; top-k preservation is tested)
        search_max_candidates=2048, plaid_stage2_docs=512,
    )
    params = init_colbert_params(jax.random.PRNGKey(0), bert_cfg, dim=128)
    return ColBERTEncoder(params, bert_cfg, tokenizer, cfg), cfg


N_TOPICS = 64
TOPIC_VOCAB = 60  # words per topic (overlapping windows over the word list)


def _topic_words(topic: int, n_words: int) -> np.ndarray:
    start = (topic * (n_words - TOPIC_VOCAB)) // max(1, N_TOPICS - 1)
    return np.arange(start, start + TOPIC_VOCAB)


def synthetic_passages(n: int, mean_words: int = 110, n_words: int = 2000) -> list[str]:
    """Topical corpus: each passage draws ~60% of its words from one of
    N_TOPICS overlapping vocabulary windows and ~40% from the global
    vocabulary. Real collections are topical (uniform-random tokens would
    make every query's IVF candidate set ~the whole corpus) but not
    near-duplicates (pure topic-window sampling gives every passage of a
    topic the same token SET, which no centroid-level pruning stage —
    including reference-faithful PLAID — can discriminate)."""
    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        words = _topic_words(i % N_TOPICS, n_words)
        k = int(rng.integers(mean_words - 30, mean_words + 30))
        k_topic = int(k * 0.6)
        ids = np.concatenate([
            rng.choice(words, size=k_topic),
            rng.integers(0, n_words, k - k_topic),
        ])
        rng.shuffle(ids)
        out.append(" ".join(f"word{i:05d}" for i in ids))
    return out


def synthetic_queries(n: int, n_words: int = 2000) -> list[str]:
    rng = np.random.default_rng(11)
    out = []
    for i in range(n):
        words = _topic_words(int(rng.integers(0, N_TOPICS)), n_words)
        out.append(" ".join(f"word{i:05d}" for i in rng.choice(words, size=8)))
    return out


def main() -> None:
    from colbert_tpu.indexing.builder import Indexer
    from colbert_tpu.retrieval.searcher import Searcher

    encoder, cfg = make_bench_encoder()
    n = 4096
    passages = synthetic_passages(n)

    # --- encode throughput (vs reference 40 p/s) ---
    warm = passages[:512]
    t = time.time()
    encoder.encode_passages(warm)
    log(f"warmup encode (512 passages, incl. compile): {time.time() - t:.1f}s")
    t0 = time.time()
    embs, doclens = encoder.encode_passages(passages[:2048])
    dt = time.time() - t0
    enc_pps = 2048 / dt
    # MFU from padded tokens actually pushed through the MXU
    padded_tokens = 2048 * 128  # length_bucket=128 covers the ~110-word docs
    tput_tok = padded_tokens / dt
    mfu = tput_tok * BERT_BASE_GFLOP_PER_TOKEN / 1e3 / BF16_PEAK_TFLOPS
    log(f"encode: 2048 passages ({int(doclens.sum())} embeddings) in {dt:.2f}s "
        f"= {enc_pps:.1f} passages/s, {tput_tok/1e3:.1f}k tokens/s, "
        f"~{mfu*100:.1f}% MFU (vs reference 40 p/s: {enc_pps/40:.1f}x; "
        f"payload rides the ~30 MB/s tunneled D2H link in "
        f"{encoder.config.transfer_dtype})")

    try:
        flash_probe()
    except Exception:
        import traceback

        log("flash-attention probe failed:")
        traceback.print_exc(file=sys.stderr)

    tmp = tempfile.mkdtemp()
    try:
        # --- headline: full index build, steady state (vs 16.1 p/s) ---
        # (a build failure propagates: no headline without a build)
        t1 = time.time()
        Indexer(cfg, encoder=encoder, collection=passages).index(tmp + "/warm")
        cold = time.time() - t1
        log(f"index build #1 (cold, incl. compiles): {n} passages in {cold:.1f}s "
            f"= {n/cold:.1f} p/s")
        t1 = time.time()
        Indexer(cfg, encoder=encoder, collection=passages).index(tmp + "/idx")
        bt = time.time() - t1
        build_pps = n / bt
        log(f"index build #2 (steady state): {n} passages in {bt:.1f}s "
            f"= {build_pps:.1f} p/s (baseline {BASELINE_BUILD_PASSAGES_PER_SEC})")

        # secondary metrics must never break the headline: once the build
        # succeeded, any serving/quality failure is logged and the one
        # headline JSON line still prints (driver contract)
        try:
            serve_and_probe(encoder, cfg, tmp, passages, n)
        except Exception:
            import traceback

            log("secondary (serving/quality) bench section failed:")
            traceback.print_exc(file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({
        "metric": "index_build_passages_per_sec",
        "value": round(build_pps, 2),
        "unit": "passages/s",
        "vs_baseline": round(build_pps / BASELINE_BUILD_PASSAGES_PER_SEC, 2),
    }))


def serve_and_probe(encoder, cfg, tmp, passages, n) -> None:
    """Serving QPS/latency + funnel-quality probes (non-headline metrics)."""
    from colbert_tpu.retrieval.searcher import Searcher

    s = Searcher(tmp + "/idx", encoder=encoder)
    queries = synthetic_queries(128)
    s.search_batch(queries[:32], k=10)  # warm/compile
    t2 = time.time()
    reps = 4
    for r in range(reps):
        s.search_batch(queries[32 * (r % 3):32 * (r % 3) + 32], k=10)
    qps = reps * 32 / (time.time() - t2)
    log(f"batched search (B=32, warm, quality-first defaults): "
        f"{qps:.1f} QPS/chip")
    # throughput-tuned operating point: skip the stage-1 full-centroid
    # refine and probe exactly nprobe slots (quality still verified by
    # the success@1 probe below, which runs with the defaults)
    s.config.plaid_stage1_refine = False
    s.config.probe_dup_compensation = False
    s.search_batch(queries[:32], k=10)  # warm the new program
    t2 = time.time()
    for r in range(reps):
        s.search_batch(queries[32 * (r % 3):32 * (r % 3) + 32], k=10)
    qps_fast = reps * 32 / (time.time() - t2)
    log(f"batched search (B=32, warm, throughput-tuned): "
        f"{qps_fast:.1f} QPS/chip")
    s.config.plaid_stage1_refine = True
    s.config.probe_dup_compensation = True
    s.search(queries[0], k=10)  # warm the B=1 program
    t3 = time.time()
    for i in range(20):
        s.search(queries[i % len(queries)], k=10)
    lat = (time.time() - t3) / 20 * 1000
    log(f"single-query latency (warm): {lat:.1f} ms")
    # retrieval sanity on the topical corpus: a passage is its own best
    # match
    p_self, _ = s.search_batch([passages[5], passages[900]], k=3)
    assert p_self[0][0] == 5 and p_self[1][0] == 900, p_self

    # pruning quality with REAL relevance signal: queries are passage
    # prefixes, ground truth is the passage itself; the PLAID funnel
    # must not lose it vs exhaustive candidate scoring. (Top-10 OVERLAP
    # is not meaningful here: random weights leave the tail of the
    # ranking in statistical ties.)
    import jax.numpy as jnp

    probe = list(range(0, n, n // 32))[:32]
    Qe = jnp.asarray(
        s.encoder.encode_queries([passages[i][:200] for i in probe]))
    kw = dict(k=10, nprobe=cfg.nprobe, cell_cap=s.cell_cap,
              max_candidates=s.max_candidates, use_pallas=s._stage2_pallas)
    p_pruned, _ = s.device_index.search_Q_batch(
        Qe, ncandidates=cfg.plaid_stage2_docs or 1024,
        centroid_threshold=cfg.centroid_score_threshold, **kw)
    p_full, _ = s.device_index.search_Q_batch(
        Qe, ncandidates=s.max_candidates, centroid_threshold=None,
        stage1_refine=False, **kw)
    s1_pr = float(np.mean([p_pruned[b][0] == probe[b] for b in range(32)]))
    s1_full = float(np.mean([p_full[b][0] == probe[b] for b in range(32)]))
    log(f"self-retrieval success@1: pruned funnel {s1_pr:.3f} vs "
        f"exhaustive {s1_full:.3f}")


if __name__ == "__main__":
    main()
