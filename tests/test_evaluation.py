"""Eval metric unit tests + a synthetic end-to-end eval run."""

import numpy as np
import pytest

from colbert_tpu.evaluation import metrics
from colbert_tpu.evaluation.runner import (
    evaluate,
    load_qrels_lotte,
    load_qrels_trec,
    load_queries_tsv,
)


def test_mrr():
    rankings = [[3, 1, 2], [9, 9, 9], [5, 4]]
    relevant = [{1}, {0}, {5}]
    # 1/2 + 0 + 1 = 1.5 / 3
    assert metrics.mrr_at_k(rankings, relevant) == pytest.approx(0.5)


def test_success_at_k():
    rankings = [[3, 1], [9], [5, 4]]
    relevant = [{1}, {0}, {5}]
    assert metrics.success_at_k(rankings, relevant, k=2) == pytest.approx(2 / 3)
    assert metrics.success_at_k(rankings, relevant, k=1) == pytest.approx(1 / 3)


def test_ndcg():
    rankings = [[1, 2, 3]]
    relevance = [{1: 3.0, 2: 2.0, 3: 1.0}]
    assert metrics.ndcg_at_k(rankings, relevance) == pytest.approx(1.0)
    worst = [[3, 2, 1]]
    assert metrics.ndcg_at_k(worst, relevance) < 1.0


def test_lcs_distance():
    assert metrics.lcs_distance("abc", "abc") == 0.0
    assert metrics.lcs_distance("abc", "xyz") == 1.0
    assert metrics.lcs_distance("", "abc") == 1.0
    assert metrics.lcs_distance("abcd", "abxd") == pytest.approx(0.25)


def test_lcs_hit_rate():
    retrieved = [["hello world", "zzz"], ["qqq"]]
    gold = ["hello world!", "hello"]
    assert metrics.lcs_hit_rate(retrieved, gold) == pytest.approx(0.5)


def test_qrels_loaders(tmp_path):
    trec = tmp_path / "qrels.tsv"
    trec.write_text("q1 0 5 1\nq1 0 7 0\nq2 0 3 2\n")
    rel = load_qrels_trec(str(trec))
    assert rel == {"q1": {5}, "q2": {3}}

    lotte = tmp_path / "qas.jsonl"
    lotte.write_text('{"qid": 1, "answer_pids": [2, 4]}\n{"qid": 2, "answer_pids": []}\n')
    rel = load_qrels_lotte(str(lotte))
    assert rel == {"1": {2, 4}, "2": set()}

    q = tmp_path / "queries.tsv"
    q.write_text("1\twhat is a dog\n2\tbig cats\n")
    qids, texts = load_queries_tsv(str(q))
    assert qids == ["1", "2"] and texts[0] == "what is a dog"


def test_evaluate_end_to_end(tmp_path):
    from colbert_tpu.config import ColBERTConfig
    from colbert_tpu.indexing.builder import Indexer
    from colbert_tpu.retrieval.searcher import Searcher
    from colbert_tpu.utils.testing import make_encoder, synthetic_collection

    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=32, nbits=2, kmeans_niters=4, nprobe=4,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg)
    passages = synthetic_collection(40, seed=5)
    path = str(tmp_path / "idx")
    Indexer(cfg, encoder=encoder, collection=passages).index(path)
    searcher = Searcher(path, encoder=encoder)

    # self-retrieval eval: gold pid == query's source passage
    qids = [str(i) for i in [2, 9, 17, 30]]
    queries = [passages[int(q)] for q in qids]
    qrels = {q: {int(q)} for q in qids}
    report = evaluate(searcher, queries, qids, qrels, k=5)
    assert report["num_queries"] == 4
    assert report["success@5"] >= 0.75
    assert 0.0 <= report["mrr@10"] <= 1.0
    assert report["qps"] > 0
