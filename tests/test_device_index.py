"""Device-resident search must return the same results as the host-staged
reference-shaped pipeline (both backends share the codec math)."""

import numpy as np
import pytest

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.indexing.builder import Indexer
from colbert_tpu.retrieval.searcher import Searcher
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=32, nbits=2, kmeans_niters=5, nprobe=4,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg)
    passages = synthetic_collection(60, seed=2)
    path = str(tmp_path_factory.mktemp("dev_idx") / "idx")
    Indexer(cfg, encoder=encoder, collection=passages).index(path)
    return cfg, encoder, passages, path


def test_device_matches_host_backend(built):
    cfg, encoder, passages, path = built
    s_dev = Searcher(path, encoder=encoder, backend="device")
    s_host = Searcher(path, encoder=encoder, backend="host")
    queries = [passages[5], passages[33], "the dog runs fast", passages[59]]
    pd, sd = s_dev.search_batch(queries, k=5)
    ph, sh = s_host.search_batch(queries, k=5)
    # same candidate generation + same scoring math => identical results
    np.testing.assert_array_equal(pd, ph)
    np.testing.assert_allclose(sd, sh, rtol=1e-4, atol=1e-4)


def test_device_search_single(built):
    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)  # default backend=device
    pids, scores = s.search(passages[10], k=3)
    assert pids[0] == 10 or 10 in pids  # self-retrieval sanity
    assert (np.diff(scores[scores > -np.inf]) <= 1e-6).all()


def test_device_backend_k_larger_than_candidates(built):
    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)
    pids, scores = s.search(passages[0], k=len(passages) + 20)
    valid = pids >= 0
    assert valid.sum() <= len(passages)
    assert len(np.unique(pids[valid])) == valid.sum()  # no duplicate pids
