"""Funnel quality in a regime where it is MEASURABLE: train margins into
the embedding space, rebuild the index, then funnel recall vs exhaustive.

Round-3 finding (SCALE.md "scale-matched topic hardness"): with random
weights the exhaustive oracle's top-k at 141k+ is tie-dominated (corpus
geometry), so funnel recall measured against it says nothing about the
funnel. This experiment closes that gap with the in-repo trainer
(reference protocol being reproduced: examples/AIHelpMe/evals.jl:29-43 —
retrieval quality against a ground-truth signal):

  1. fine-tune the bench ColBERT on (prefix-query, passage, SAME-topic
     negative) triples — within-topic hard negatives force per-passage
     margins, exactly the structure real relevance training produces;
  2. rebuild the index at the requested scale with the trained encoder;
  3. report the oracle's margin (top1-top10 spread must be >> tie noise)
     and funnel recall@10/@100 vs the exhaustive exact-codec oracle across
     the bench's operating points, plus self-retrieval success@1.

Usage: ``python bench_quality.py [n_passages] [train_steps] [num_partitions]
[balance_cap]`` (defaults 141431, 300, planner formula, 1024). The last two
are the per-corpus A/B knobs (config.num_partitions / ivf_balance_cap): a
TRAINED encoder concentrates topic clusters, so at 1M the cap's truncation
(472k entries at cap=1024) is the recall suspect. Prints one JSON summary
line; committed run log in SCALE.md §quality.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import numpy as np

from bench import (
    N_TOPICS,
    _recall,
    _score_recall,
    exhaustive_scores,
    log,
    make_bench_encoder,
    synthetic_passages,
)


def make_triples(
    passages: list[str], n: int, *, n_topics: int = N_TOPICS, seed: int = 0,
    prefix_chars: int = 200,
) -> list[tuple[str, str, str]]:
    """(query, positive, negative): query = the positive's prefix, negative
    = a DIFFERENT passage of the SAME topic (bench corpus assigns topics
    round-robin: passage i belongs to topic i % n_topics). Same-topic
    negatives are the hard case — they share ~60% of their vocabulary with
    the positive, so the encoder must learn per-passage margins, not topic
    membership."""
    rng = np.random.default_rng(seed)
    P = len(passages)
    if P < 2 * n_topics:
        # below this every topic isn't guaranteed a second member, and the
        # same-topic resampling loop below could never find j != i
        raise ValueError(
            f"need >= {2 * n_topics} passages ({n_topics} topics x 2) to "
            f"sample same-topic negatives; got {P}")
    out = []
    for _ in range(n):
        i = int(rng.integers(0, P))
        j = int(rng.integers(0, P // n_topics)) * n_topics + i % n_topics
        while j == i or j >= P:
            j = int(rng.integers(0, P // n_topics)) * n_topics + i % n_topics
        out.append((passages[i][:prefix_chars], passages[i], passages[j]))
    return out


def train_encoder(encoder, passages, *, steps: int, batch_size: int = 32,
                  seed: int = 0) -> dict:
    from colbert_tpu.training.trainer import ColBERTTrainer

    # train at the corpus's actual length (~110-140 tokens): the trainer
    # pads docs to doc_maxlen, and bench's 300 would pay 2x attention cost
    # for padding (restored before indexing below)
    doc_maxlen_full = encoder.config.doc_maxlen
    encoder.config.doc_maxlen = min(192, doc_maxlen_full)
    trainer = ColBERTTrainer(
        encoder, learning_rate=3e-5, warmup_steps=min(20, steps // 5),
        total_steps=steps, in_batch_negatives=True,
    )
    triples = make_triples(passages, steps * batch_size, seed=seed)
    t0 = time.time()
    for step in range(steps):
        batch = triples[step * batch_size:(step + 1) * batch_size]
        m = trainer.train_step(batch)
        if step < 3 or (step + 1) % 25 == 0:
            log(f"  step {step + 1:4d}: loss {m['loss']:.4f} "
                f"acc {m['pairwise_acc']:.3f} margin {m['margin']:.3f}")
    dt = time.time() - t0
    last = trainer.history[-1]
    acc_tail = float(np.mean(
        [h["pairwise_acc"] for h in trainer.history[-20:]]
    ))
    encoder.config.doc_maxlen = doc_maxlen_full
    log(f"trained {steps} steps x {batch_size} triples in {dt:.1f}s "
        f"({steps / dt:.2f} steps/s); tail-20 pairwise acc {acc_tail:.3f}")
    return {"steps": steps, "train_seconds": round(dt, 1),
            "final_loss": round(last["loss"], 4),
            "tail_acc": round(acc_tail, 4),
            "final_margin": round(last["margin"], 4)}


def main() -> None:
    # trailing non-numeric args are flags: "tune" runs the autotuner drill
    # (balance-cap sweep + depth target), "probesweep" calibrates the
    # probe-dup compensation knee at this geometry
    flags = {a for a in sys.argv[1:] if not a.lstrip("-").isdigit()}
    nums = [a for a in sys.argv[1:] if a.lstrip("-").isdigit()]
    n = int(nums[0]) if len(nums) > 0 else 141_431
    steps = int(nums[1]) if len(nums) > 1 else 300
    partitions = int(nums[2]) if len(nums) > 2 else None
    balance_cap = int(nums[3]) if len(nums) > 3 else None
    if partitions == 0:
        partitions = None
    if balance_cap == 0:
        balance_cap = None
    import jax.numpy as jnp

    from colbert_tpu.indexing.builder import Indexer
    from colbert_tpu.retrieval.searcher import Searcher

    encoder, cfg = make_bench_encoder()
    cfg.chunksize = 25_000
    cfg.search_max_candidates = 8192
    if partitions:
        cfg.num_partitions = partitions
        log(f"num_partitions override: {partitions}")
    if balance_cap is not None:
        cfg.ivf_balance_cap = balance_cap
        log(f"ivf_balance_cap override: {balance_cap}")
    passages = synthetic_passages(n)
    log(f"corpus: {n} passages, {N_TOPICS} topics")

    train_stats = train_encoder(encoder, passages, steps=steps)

    tmp = tempfile.mkdtemp()
    try:
        t0 = time.time()
        Indexer(cfg, encoder=encoder, collection=passages).index(tmp + "/idx")
        build_s = time.time() - t0
        log(f"index rebuilt with trained encoder: {build_s:.1f}s "
            f"= {n / build_s:.1f} p/s")
        s = Searcher(tmp + "/idx", encoder=encoder)

        # eval queries: passage prefixes (the training distribution) over a
        # spread of pids; ground truth for self-retrieval is the pid itself
        probe = list(range(0, n, max(1, n // 32)))[:32]
        queries = [passages[i][:200] for i in probe]
        Qe = jnp.asarray(encoder.encode_queries(queries))

        t1 = time.time()
        oscores = exhaustive_scores(s, Qe)
        log(f"exhaustive oracle over {n} x {len(probe)} queries: "
            f"{time.time() - t1:.1f}s")
        osorted = -np.sort(-oscores, axis=1)
        margin_1_10 = float(np.mean(osorted[:, 0] - osorted[:, 9]))
        margin_10_100 = float(np.mean(osorted[:, 9] - osorted[:, 99]))
        log(f"oracle margins (trained space): top1-top10 {margin_1_10:.3f}, "
            f"top10-top100 {margin_10_100:.3f} "
            f"(tie threshold ~0.01: recall@k is now a funnel property)")
        oracle = np.argsort(-oscores, axis=1)[:, :100]
        s1_oracle = float(np.mean(
            [oracle[b, 0] == probe[b] for b in range(len(probe))]
        ))

        kw = dict(k=100, cell_cap=s.cell_cap, max_candidates=s.max_candidates,
                  use_pallas=s._stage2_pallas)
        nprobe_c = s.device_index.compensated_nprobe(cfg.nprobe)
        points = {
            "quality-first": dict(
                nprobe=nprobe_c,
                ncandidates=cfg.plaid_stage2_docs or max(16 * 100, 1024),
                centroid_threshold=cfg.centroid_score_threshold,
                stage1_refine=True),
            "throughput-tuned (ncand=512, no refine)": dict(
                nprobe=cfg.nprobe, ncandidates=512,
                centroid_threshold=cfg.centroid_score_threshold,
                stage1_refine=False),
            "no refine, nprobe+2 (refine-vs-probes tradeoff)": dict(
                nprobe=nprobe_c + 2, ncandidates=cfg.plaid_stage2_docs
                or max(16 * 100, 1024),
                centroid_threshold=cfg.centroid_score_threshold,
                stage1_refine=False),
            "quality-first rw=2 (half refine window)": dict(
                nprobe=nprobe_c,
                ncandidates=cfg.plaid_stage2_docs or max(16 * 100, 1024),
                centroid_threshold=cfg.centroid_score_threshold,
                stage1_refine=True, refine_width=2),
            "tight (ncand=128)": dict(
                nprobe=nprobe_c, ncandidates=128,
                centroid_threshold=cfg.centroid_score_threshold,
                stage1_refine=True),
        }
        recalls = {}
        for name, p in points.items():
            pids_b, _ = s.device_index.search_Q_batch(Qe, **p, **kw)
            pids_np = np.asarray(pids_b)
            r10 = _recall(pids_np, oracle, 10)
            r100 = _recall(pids_np, oracle, 100)
            sr10 = _score_recall(pids_np, oscores, 10)
            recalls[name] = (r10, r100, sr10)
            log(f"funnel recall vs exhaustive [{name}]: set@10 {r10:.3f} / "
                f"@100 {r100:.3f}; score@10 {sr10:.3f}")

        pp, _ = s.search_batch(queries, k=3)
        s1 = float(np.mean([pp[b][0] == probe[b] for b in range(len(probe))]))
        log(f"self-retrieval success@1: funnel {s1:.3f} vs oracle {s1_oracle:.3f}")

        # serving QPS on the TRAINED index: real models produce clustered
        # spaces (fewer mega-cells than random weights -> lower probe-dup
        # compensation cost), so this is the production-shaped number
        from bench import _time_qps, synthetic_queries

        qs = synthetic_queries(192)
        qps_quality = _time_qps(s, qs, 64)
        log(f"batched search on trained index (B=64, quality-first): "
            f"{qps_quality:.1f} QPS/chip (probe_dup_max="
            f"{s.device_index.probe_dup_max}, split_mass="
            f"{s.device_index.probe_split_mass:.4f}, effective nprobe="
            f"{s.device_index.compensated_nprobe(cfg.nprobe)})")
        # the refine-vs-probes tradeoff point: recall@10 matches
        # quality-first (see the recall table above) without the refine's
        # token-code reads — if faster, it is the better quality point
        s.config.refine_width_factor = 2
        qps_rw2 = _time_qps(s, qs, 64)
        log(f"batched search on trained index (B=64, quality-first rw=2): "
            f"{qps_rw2:.1f} QPS/chip")
        s.config.refine_width_factor = 4
        s.config.plaid_stage1_refine = False
        s.config.nprobe = cfg.nprobe + 2
        qps_probes = _time_qps(s, qs, 64)
        log(f"batched search on trained index (B=64, no refine, nprobe+2): "
            f"{qps_probes:.1f} QPS/chip")
        s.config.nprobe = cfg.nprobe
        s.config.probe_dup_compensation = False
        s.config.plaid_stage2_docs = 512
        qps_tuned = _time_qps(s, qs, 64)
        log(f"batched search on trained index (B=64, throughput-tuned): "
            f"{qps_tuned:.1f} QPS/chip")
        s.config.plaid_stage1_refine = True
        s.config.probe_dup_compensation = True
        s.config.plaid_stage2_docs = None

        if "probesweep" in flags:
            # probe_comp_saturation calibration at THIS geometry: recall and
            # QPS at 0..dup_max-1 extra probes (the knee is where recall
            # stops moving; see config.probe_comp_saturation)
            dup = s.device_index.probe_dup_max
            mass = s.device_index.probe_split_mass
            for extra in range(0, dup):
                p = dict(nprobe=cfg.nprobe + extra,
                         ncandidates=cfg.plaid_stage2_docs
                         or max(16 * 100, 1024),
                         centroid_threshold=cfg.centroid_score_threshold,
                         stage1_refine=True)
                pids_b, _ = s.device_index.search_Q_batch(Qe, **p, **kw)
                pids_np = np.asarray(pids_b)
                s.config.probe_dup_compensation = False
                s.config.nprobe = cfg.nprobe + extra
                qps_e = _time_qps(s, qs, 64)
                s.config.nprobe = cfg.nprobe
                s.config.probe_dup_compensation = True
                log(f"probe-comp sweep [dup_max={dup} split_mass={mass:.3f}] "
                    f"extra={extra}: set@10 {_recall(pids_np, oracle, 10):.3f} "
                    f"score@10 {_score_recall(pids_np, oscores, 10):.3f} "
                    f"@100 {_recall(pids_np, oracle, 100):.3f} "
                    f"{qps_e:.1f} QPS")

        if "depthsweep" in flags:
            # depth@100 floor mapping (VERDICT r4/r5): at 1M the tuner's
            # table shows score@100 monotone in ncand at fixed cap — this
            # sweep extends the axis past the tuner grid (plus the
            # selection-width and probe knobs) to show the floor is the
            # STATIC candidate/selection budget, not a funnel defect, and
            # to price each +0.0x of depth in ms/batch.
            s.set_balance_cap(2048)
            kw_d = dict(k=100, cell_cap=s.cell_cap,
                        use_pallas=s._stage2_pallas)
            np_c = s.device_index.compensated_nprobe(cfg.nprobe)
            log(f"depth sweep at cap=2048 (compensated nprobe {np_c}, "
                f"cell_cap {s.cell_cap})")
            for ncand, maxc, npr in (
                (4096, 8192, np_c),
                (8192, 8192, np_c),
                (8192, 16384, np_c),
                (8192, 16384, np_c + 2),
                (16384, 32768, np_c),
            ):
                p = dict(nprobe=npr, ncandidates=ncand,
                         centroid_threshold=cfg.centroid_score_threshold,
                         stage1_refine=True, max_candidates=maxc)
                t0 = time.time()
                pids_b, _ = s.device_index.search_Q_batch(Qe, **p, **kw_d)
                pids_np = np.asarray(pids_b)
                warm = time.time() - t0
                best = float("inf")  # best-of-2 warm reps (tunnel stalls)
                for _ in range(2):
                    t0 = time.time()
                    pids_b, _ = s.device_index.search_Q_batch(
                        Qe, **p, **kw_d)
                    np.asarray(pids_b)
                    best = min(best, time.time() - t0)
                log(f"depth sweep [ncand={ncand} maxcand={maxc} "
                    f"nprobe={npr}]: set@10 {_recall(pids_np, oracle, 10):.3f} "
                    f"score@10 {_score_recall(pids_np, oscores, 10):.3f} "
                    f"set@100 {_recall(pids_np, oracle, 100):.3f} "
                    f"{best * 1e3:.0f} ms/batch(B={Qe.shape[0]}) "
                    f"(first incl. compile {warm:.1f}s)")
            s.set_balance_cap(cfg.ivf_balance_cap)

        tune_report = None
        if "tune" in flags:
            # the one-command drill: does the autotuner pick a >=0.95
            # score@10 point (with a depth floor) at this scale on its own?
            from colbert_tpu.evaluation.autotune import tune_operating_point

            t0 = time.time()
            res = tune_operating_point(
                s, queries, k=10, target_score_recall=0.95,
                balance_caps=(1024, 2048, 4096),
                depth_k=100, target_depth_recall=0.90, time_reps=2,
            )
            log(f"autotune (balance_caps x grid, depth@100) took "
                f"{time.time() - t0:.1f}s")
            log(str(res))
            res.apply(s)
            qps_tuned_auto = _time_qps(s, qs, 64)
            log(f"autotuned point [{res.chosen.point.label()}, cap="
                f"{res.chosen.balance_cap}]: {qps_tuned_auto:.1f} QPS/chip, "
                f"score@10 {res.chosen.score_recall:.3f}, "
                f"score@100 {res.chosen.depth_score_recall:.3f}, "
                f"met_target={res.met_target}")
            tune_report = {
                "chosen": res.chosen.point.label(),
                "balance_cap": res.chosen.balance_cap,
                "met_target": res.met_target,
                "score_recall_10": round(res.chosen.score_recall, 3),
                "score_recall_100": round(res.chosen.depth_score_recall, 3),
                "qps_b64": round(qps_tuned_auto, 1),
            }

        qf = recalls["quality-first"]
        print(json.dumps({
            "metric": "trained_funnel_recall_at_10",
            "n_passages": n,
            "value": round(qf[0], 3),
            "unit": "set-recall@10 vs exhaustive",
            "recall_at_100": round(qf[1], 3),
            "score_recall_at_10": round(qf[2], 3),
            "oracle_margin_top1_top10": round(margin_1_10, 3),
            "self_retrieval_s1": s1,
            "qps_b64_quality": round(qps_quality, 1),
            "qps_b64_quality_rw2": round(qps_rw2, 1),
            "qps_b64_probes_no_refine": round(qps_probes, 1),
            "qps_b64_tuned": round(qps_tuned, 1),
            "tune": tune_report,
            "train": train_stats,
            "build_seconds": round(build_s, 1),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
