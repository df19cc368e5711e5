"""Serving layer: cross-request batching + HTTP front must return exactly
what direct Searcher calls return, coalesce concurrent requests, and survive
errors. (No reference equivalent; serving is on the reference's roadmap,
README.md:179-190.)"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.indexing.builder import Indexer
from colbert_tpu.retrieval.searcher import Searcher
from colbert_tpu.serving.batcher import BatchingSearcher
from colbert_tpu.serving.http import make_server
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=32, nbits=2, kmeans_niters=5, nprobe=4,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg)
    passages = synthetic_collection(40, seed=2)
    path = str(tmp_path_factory.mktemp("serve") / "idx")
    Indexer(cfg, encoder=encoder, collection=passages).index(path)
    return passages, Searcher(path, encoder=encoder)


def test_batcher_matches_direct(served):
    passages, s = served
    b = BatchingSearcher(s, max_batch=8, max_wait_ms=20)
    try:
        queries = [passages[3], passages[17], "the dog runs", passages[29]]
        direct_p, direct_s = s.search_batch(queries, k=5)
        got = b.search_many(queries, k=5)
        for i, (p, sc) in enumerate(got):
            np.testing.assert_array_equal(p, direct_p[i])
            np.testing.assert_allclose(sc, direct_s[i])
    finally:
        b.close()


def test_batcher_coalesces_concurrent_requests(served):
    passages, s = served
    # long wait window: all threads' requests land in one device batch
    b = BatchingSearcher(s, max_batch=64, max_wait_ms=200)
    try:
        results = {}

        def worker(i):
            p, _ = b.search(passages[i], k=3)
            results[i] = p

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(12):
            assert results[i][0] == i  # self-retrieval through the batcher
        assert b.stats["queries"] == 12
        assert b.stats["max_batch_seen"] > 1  # actually coalesced
    finally:
        b.close()


def test_batcher_pipelines_multiple_batches(served):
    """max_batch=4 with 16 queued requests forces >=4 successive launches
    through the launch/finish pipeline (max_inflight=2); every request must
    still get its own exact result, in spite of overlap."""
    passages, s = served
    b = BatchingSearcher(s, max_batch=4, max_wait_ms=5, max_inflight=2)
    try:
        futs = [b.submit(passages[i], k=3) for i in range(16)]
        for i, f in enumerate(futs):
            p, sc = f.result(timeout=120)
            assert p[0] == i, f"request {i} got {p}"
        assert b.stats["batches"] >= 4
        assert b.stats["queries"] == 16
    finally:
        b.close()


def test_batcher_host_backend_fallback(served):
    """Non-device backends take the synchronous path in the batcher loop."""
    passages, s = served
    host = Searcher(s.index_path, encoder=s.encoder, backend="host")
    with BatchingSearcher(host, max_batch=4, max_wait_ms=5) as b:
        futs = [b.submit(passages[i], k=2) for i in (5, 9)]
        for i, f in zip((5, 9), futs):
            p, _ = f.result(timeout=120)
            assert p[0] == i


def test_batcher_context_manager(served):
    passages, s = served
    with BatchingSearcher(s, max_batch=4, max_wait_ms=10) as b:
        p, _ = b.search(passages[6], k=2)
        assert p[0] == 6
    with pytest.raises(RuntimeError):
        b.submit("closed on exit")


def test_batcher_mixed_k_and_error_recovery(served):
    passages, s = served
    b = BatchingSearcher(s, max_batch=8, max_wait_ms=20)
    try:
        f1 = b.submit(passages[1], k=2)
        f2 = b.submit(passages[2], k=7)
        p1, s1 = f1.result(timeout=60)
        p2, s2 = f2.result(timeout=60)
        assert len(p1) == 2 and len(p2) == 7
        assert p1[0] == 1 and p2[0] == 2
    finally:
        b.close()
    with pytest.raises(RuntimeError):
        b.submit("after close")


def test_http_concurrent_burst(served):
    """A burst of concurrent clients must all be served (the stdlib accept
    backlog of 5 RST'd bursts before request_queue_size was raised)."""
    import urllib.error

    passages, s = served
    server = make_server(s, port=0, max_batch=64, max_wait_ms=30)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    results, errors = {}, []

    def client(i):
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps({"query": passages[i % 40], "k": 2}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())
        except Exception as e:  # pragma: no cover - failure detail
            errors.append((i, repr(e)))

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(64)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors[:3]
        assert len(results) == 64
        for i in range(0, 64, 7):
            assert results[i]["pids"][0] == i % 40
        assert server.batcher.stats["max_batch_seen"] > 1
    finally:
        server.shutdown()
        server.batcher.close()


def test_swap_serves_updated_index(served):
    """Zero-downtime update flow: IndexUpdater mutates the artifacts, a
    fresh Searcher loads them, batcher.swap() switches serving over without
    dropping requests."""
    from colbert_tpu.indexing.updater import IndexUpdater

    passages, s = served
    b = BatchingSearcher(s, max_batch=8, max_wait_ms=20)
    try:
        p0, _ = b.search(passages[3], k=2)
        assert p0[0] == 3
        fresh = "science history cooking travel music mountain river city"
        new_pids = IndexUpdater(s.index_path, s.encoder).add([fresh])
        # old snapshot keeps serving (doesn't know the new passage)
        p_old, _ = b.search(passages[3], k=2)
        assert p_old[0] == 3
        b.swap(Searcher(s.index_path, encoder=s.encoder))
        p_new, _ = b.search(fresh, k=2)
        assert p_new[0] == new_pids[0]
        p_keep, _ = b.search(passages[3], k=2)
        assert p_keep[0] == 3
    finally:
        b.close()


def test_http_server_roundtrip(served):
    passages, s = served
    server = make_server(s, port=0, max_batch=8, max_wait_ms=20)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def post(path, obj):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=60
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["n_passages"] == 40

        out = post("/search", {"query": passages[7], "k": 3})
        assert out["pids"][0] == 7 and len(out["pids"]) == 3
        direct_p, direct_s = s.search(passages[7], k=3)
        np.testing.assert_array_equal(out["pids"], direct_p)
        np.testing.assert_allclose(out["scores"], direct_s, rtol=1e-6)

        outb = post("/search_batch", {"queries": [passages[4], passages[9]], "k": 2})
        assert outb["pids"][0][0] == 4 and outb["pids"][1][0] == 9

        # bad request -> 400, server keeps serving
        try:
            post("/search", {"k": 3})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        out2 = post("/search", {"query": passages[5], "k": 1})
        assert out2["pids"][0] == 5
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=60
        ) as r:
            stats = json.loads(r.read())
        assert stats["queries"] >= 4
    finally:
        server.shutdown()
        server.batcher.close()
