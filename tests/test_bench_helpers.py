"""The bench's measurement machinery must itself be correct: the exhaustive
oracle (the yardstick behind every committed recall number in BENCH/SCALE)
must equal brute-force decompressed MaxSim, and the recall metrics must
count what they claim."""

import numpy as np
import pytest

from bench import _recall, _score_recall, exhaustive_scores
from colbert_tpu.config import ColBERTConfig
from colbert_tpu.indexing.builder import Indexer
from colbert_tpu.retrieval.searcher import Searcher
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


def test_exhaustive_oracle_equals_bruteforce(tmp_path):
    import jax.numpy as jnp

    from colbert_tpu.ops import codec as codec_ops
    from colbert_tpu.storage import format as fmt

    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=16, nbits=2, kmeans_niters=4, nprobe=4,
    )
    enc = make_encoder(dim=32, seed=0, config=cfg)
    passages = synthetic_collection(40, seed=2)
    path = str(tmp_path / "idx")
    Indexer(cfg, encoder=enc, collection=passages).index(path)
    s = Searcher(path, encoder=enc)

    Q = jnp.asarray(enc.encode_queries([passages[5], "the dog runs fast"]))
    oracle = exhaustive_scores(s, Q)
    assert oracle.shape == (2, 40)

    # brute force: decompress EVERY embedding, per-pid MaxSim by hand
    codes = fmt.load_all_codes(path)
    residuals = fmt.load_all_residuals(path)
    emb = np.asarray(codec_ops.decompress(
        jnp.asarray(codes), jnp.asarray(residuals), s.centroids,
        s.bucket_weights, nbits=cfg.nbits,
    ))
    doclens = np.asarray(s.doclens, np.int64)
    offs = np.concatenate([[0], np.cumsum(doclens)])
    Qn = np.asarray(Q)
    for b in range(2):
        for pid in range(40):
            D = emb[offs[pid]:offs[pid + 1]]
            want = np.einsum("ld,td->lt", Qn[b], D).max(axis=1).sum()
            np.testing.assert_allclose(oracle[b, pid], want, rtol=1e-4, atol=1e-4)


def test_recall_metrics_count_correctly():
    got = np.asarray([[3, 1, 4, 9, 9]])
    oracle_top = np.asarray([[1, 2, 3, 4, 5]])
    # top-3 of got = {3,1,4}; oracle top-3 = {1,2,3} -> overlap 2/3
    np.testing.assert_allclose(_recall(got, oracle_top, 3), 2 / 3)
    # score-recall: oracle scores descending by pid order 0..9
    oscores = np.asarray([[9, 8, 7, 6, 5, 4, 3, 2, 1, 0]], np.float32)
    # got top-3 = pids {3,1,4} -> scores {6,8,5}; oracle 3rd-best = 7
    # hits: 8 >= 7 only -> 1/3
    np.testing.assert_allclose(_score_recall(got, oscores, 3), 1 / 3)
    # invalid pids (-1) never count as hits
    got_bad = np.asarray([[-1, -1, -1]])
    np.testing.assert_allclose(_score_recall(got_bad, oscores, 3), 0.0)
