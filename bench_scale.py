"""At-scale build + serve demonstration on one TPU chip.

Builds and serves a synthetic corpus the size of the reference's only real
measurement — 141,431 passages, ~16M embeddings (reference:
examples/AIHelpMe/indexing_output:1-121, 8,771.6s on one CUDA GPU = 16.1
passages/s) — and reports:

  - end-to-end build wall time + passages/sec (the headline at scale),
  - peak host RSS (validates the single-copy index load: RSS must stay
    ~1x index size, not 2x) and device HBM in use,
  - batched serving QPS at the scale's static capacities,
  - candidate-overflow / balanced-IVF truncation counters,
  - funnel recall vs an exhaustive exact-codec oracle, and a
    self-retrieval probe with real relevance signal.

Usage: ``python bench_scale.py [n_passages] [scaled]`` (default 141431; a
committed run log lives in SCALE.md). Prints one JSON summary line at the
end.

The default corpus keeps bench.py's 64 topics, so per-topic tie counts grow
linearly with the corpus — the adversarial regime for centroid-level
pruning (recall vs the exhaustive oracle is then construction-bound; the
real-signal self-retrieval probe is the quality number). Passing ``scaled``
grows topics with the corpus (``n/64`` topics over a 30k-word vocabulary),
matching the 4k bench's per-topic hardness at any scale — the controlled
experiment separating corpus-induced tie collapse from funnel loss.
"""

from __future__ import annotations

import json
import resource
import shutil
import sys
import tempfile
import time

import numpy as np

from bench import (
    BASELINE_BUILD_PASSAGES_PER_SEC,
    _recall,
    _score_recall,
    _time_qps,
    exhaustive_scores,
    log,
    make_bench_encoder,
    synthetic_passages,
    synthetic_queries,
)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # KB -> GB


def hbm_gb() -> float:
    """Device memory in use, GB. The tunneled backend doesn't expose
    allocator stats, so fall back to the bytes held by live jax arrays
    (an accurate lower bound: index shards + params dominate)."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        b = stats.get("bytes_in_use")
        if b:
            return b / 1e9
    except Exception:
        pass
    try:
        return sum(x.nbytes for x in jax.live_arrays()) / 1e9
    except Exception:
        return -1.0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 141_431
    scaled = len(sys.argv) > 2 and sys.argv[2] == "scaled"
    from colbert_tpu.indexing.builder import Indexer
    from colbert_tpu.retrieval.searcher import Searcher

    n_topics = max(64, n // 64) if scaled else 64
    n_words = 30_000 if scaled else 2_000
    encoder, cfg = make_bench_encoder(n_words=n_words)
    # at-scale serving capacities: auto cell_cap from the balanced IVF,
    # stage-2 budget at PLAID's operating point
    cfg.search_max_candidates = 8192
    cfg.chunksize = 25_000  # reference default at this corpus size

    t = time.time()
    passages = synthetic_passages(n, n_words=n_words, n_topics=n_topics)
    log(f"synthesized {n} passages in {time.time() - t:.1f}s "
        f"({n_topics} topics over {n_words} words, ~110 words each)")

    tmp = tempfile.mkdtemp()
    try:
        t0 = time.time()
        Indexer(cfg, encoder=encoder, collection=passages).index(tmp + "/idx")
        build_s = time.time() - t0
        build_pps = n / build_s
        log(f"index build: {n} passages in {build_s:.1f}s = {build_pps:.1f} p/s "
            f"(reference: same-size corpus took 8771.6s = 16.1 p/s -> "
            f"{build_pps / BASELINE_BUILD_PASSAGES_PER_SEC:.1f}x)")
        log(f"after build: peak host RSS {rss_gb():.2f} GB, HBM in use {hbm_gb():.2f} GB")

        import os

        idx_bytes = sum(
            os.path.getsize(os.path.join(tmp + "/idx", f))
            for f in os.listdir(tmp + "/idx")
        )
        log(f"on-disk index: {idx_bytes / 1e9:.2f} GB "
            f"({idx_bytes / max(1, n):.0f} B/passage)")

        t1 = time.time()
        s = Searcher(tmp + "/idx", encoder=encoder)
        log(f"searcher load (chunks stream mmap -> HBM): "
            f"{time.time() - t1:.1f}s; peak host RSS {rss_gb():.2f} GB "
            f"(streaming load: the packed {idx_bytes / 1e9:.2f} GB index "
            f"never lands in host RAM), HBM {hbm_gb():.2f} GB")
        log(f"static capacities: cell_cap={s.cell_cap}, "
            f"max_candidates={s.max_candidates}, "
            f"probe_dup_max={s.device_index.probe_dup_max} "
            f"(split mass {s.device_index.probe_split_mass:.4f} -> "
            f"effective nprobe {s.device_index.compensated_nprobe(cfg.nprobe)})")

        queries = synthetic_queries(192, n_words=n_words, n_topics=n_topics)
        # B=128 included: at 4k it is the best quality-first operating
        # point (amortizes the fixed per-batch funnel cost further)
        for B in (32, 64, 128):
            qps = _time_qps(s, queries, B)
            log(f"batched search (B={B}, warm, quality-first): {qps:.1f} QPS/chip")
        s.config.plaid_stage1_refine = False
        s.config.probe_dup_compensation = False
        qps_fast = _time_qps(s, queries, 128)
        log(f"batched search (B=128, warm, throughput-tuned): {qps_fast:.1f} QPS/chip")
        qps_fast = _time_qps(s, queries, 64)
        log(f"batched search (B=64, warm, throughput-tuned): {qps_fast:.1f} QPS/chip")
        # pipelined serving at scale: search_stream keeps 2 fused programs
        # in flight so host tokenize + result D2H overlap device execution
        # (bench.py measures the same stage at 4k: 1.13x/1.35x there)
        batches = [queries[(i * 64) % 128:(i * 64) % 128 + 64] for i in range(8)]
        list(s.search_stream(batches[:2], k=10))  # warm
        t3 = time.time()
        list(s.search_stream(batches, k=10, max_inflight=2))
        qps_stream_fast = 64 * len(batches) / (time.time() - t3)
        log(f"pipelined search_stream (B=64, throughput-tuned, 2 in flight): "
            f"{qps_stream_fast:.1f} QPS/chip")
        s.config.plaid_stage1_refine = True
        s.config.probe_dup_compensation = True
        list(s.search_stream(batches[:2], k=10))  # warm quality-first stream
        t4 = time.time()
        list(s.search_stream(batches, k=10, max_inflight=2))
        qps_stream_q = 64 * len(batches) / (time.time() - t4)
        log(f"pipelined search_stream (B=64, quality-first, 2 in flight): "
            f"{qps_stream_q:.1f} QPS/chip")
        log(f"candidate overflow after QPS runs: "
            f"{s.device_index.overflow_candidates} dropped beyond the "
            f"stage-1 selection width (score-ordered)")

        # funnel quality at scale: exhaustive oracle over ALL n passages
        import jax.numpy as jnp

        Qe = jnp.asarray(s.encoder.encode_queries(list(
            synthetic_queries(16, n_words=n_words, n_topics=n_topics))))
        t2 = time.time()
        oscores = exhaustive_scores(s, Qe)
        log(f"exhaustive oracle over {n} passages x 16 queries: "
            f"{time.time() - t2:.1f}s")
        oracle = np.argsort(-oscores, axis=1)[:, :100]
        pids_b, _ = s.device_index.search_Q_batch(
            Qe, k=100, nprobe=s.device_index.compensated_nprobe(cfg.nprobe),
            ncandidates=cfg.plaid_stage2_docs or max(16 * 100, 1024),
            cell_cap=s.cell_cap, max_candidates=s.max_candidates,
            centroid_threshold=cfg.centroid_score_threshold,
            use_pallas=s._stage2_pallas,
        )
        pids_np = np.asarray(pids_b)
        r10 = _recall(pids_np, oracle, 10)
        sr10 = _score_recall(pids_np, oscores, 10)
        log(f"funnel recall vs exhaustive (quality-first): set@10 {r10:.3f}, "
            f"score@10 {sr10:.3f}")

        # self-retrieval with real relevance signal
        probe = list(range(0, n, n // 32))[:32]
        pp, _ = s.search_batch([passages[i][:200] for i in probe], k=3)
        s1 = float(np.mean([pp[b][0] == probe[b] for b in range(32)]))
        log(f"self-retrieval success@1 over {n} passages: {s1:.3f}")

        print(json.dumps({
            "metric": "scale_build_passages_per_sec",
            "n_passages": n,
            "value": round(build_pps, 2),
            "unit": "passages/s",
            "vs_baseline": round(build_pps / BASELINE_BUILD_PASSAGES_PER_SEC, 2),
            "build_seconds": round(build_s, 1),
            "peak_host_rss_gb": round(rss_gb(), 2),
            "hbm_gb": round(hbm_gb(), 2),
            "index_gb": round(idx_bytes / 1e9, 3),
            "qps_b64_tuned": round(qps_fast, 1),
            "qps_b64_stream_tuned": round(qps_stream_fast, 1),
            "qps_b64_stream_quality": round(qps_stream_q, 1),
            "self_retrieval_s1": s1,
            "score_recall_at_10": round(sr10, 3),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
