"""End-to-end integration: build an index from synthetic passages with a
deterministic random-weight encoder, then search it — the test the reference
lacks entirely (its model paths are only exercised by out-of-CI examples,
SURVEY §4)."""

import numpy as np
import pytest

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.indexing.builder import Indexer, load_collection
from colbert_tpu.retrieval.searcher import Searcher
from colbert_tpu.storage import format as fmt
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=16, nbits=2, kmeans_niters=6, nprobe=4,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg)
    passages = synthetic_collection(40, seed=1)
    path = str(tmp_path_factory.mktemp("index") / "idx")
    indexer = Indexer(cfg, encoder=encoder, collection=passages)
    indexer.index(path)
    return cfg, encoder, passages, path


def test_all_files_saved(built_index):
    _, _, _, path = built_index
    assert fmt.check_all_files_saved(path) == []


def test_plan_consistency(built_index):
    _, _, passages, path = built_index
    plan = fmt.load_plan(path)
    assert plan["num_documents"] == len(passages)
    assert plan["num_chunks"] == -(-len(passages) // plan["chunksize"])
    doclens = fmt.load_all_doclens(path)
    assert len(doclens) == len(passages)
    assert plan["num_embeddings"] == int(doclens.sum())
    codes = fmt.load_all_codes(path)
    assert codes.shape[0] == plan["num_embeddings"]
    ivf, ivf_lengths = fmt.load_ivf(path)
    assert ivf_lengths.sum() == len(ivf) == len(codes)


def test_search_exact_vs_bruteforce(built_index):
    """Search scores must equal brute-force MaxSim over the *decompressed*
    index restricted to the candidate set."""
    cfg, encoder, passages, path = built_index
    searcher = Searcher(path, encoder=encoder)
    from colbert_tpu.ops import codec as codec_ops
    import jax.numpy as jnp

    embs = np.asarray(codec_ops.decompress(
        jnp.asarray(fmt.load_all_codes(path)),
        jnp.asarray(fmt.load_all_residuals(path)),
        searcher.centroids, searcher.bucket_weights, nbits=cfg.nbits,
    ))
    doclens = searcher.doclens
    offsets = np.concatenate([[0], np.cumsum(doclens[:-1])]).astype(np.int64)

    queries = [passages[3], passages[17], "the dog runs fast"]
    pids_out, scores_out = searcher.search_batch(queries, k=5)
    Q = encoder.encode_queries(queries)
    for b, _ in enumerate(queries):
        for rank in range(5):
            pid, got = pids_out[b, rank], scores_out[b, rank]
            if pid < 0:
                continue
            off, dl = offsets[pid], doclens[pid]
            s = Q[b] @ embs[off:off + dl].T
            want = s.max(axis=1).sum()
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # ranking is descending
        valid = scores_out[b][pids_out[b] >= 0]
        assert (np.diff(valid) <= 1e-6).all()


def test_self_retrieval(built_index):
    """Querying with a passage's own text should rank that passage highly
    (truncated to query_maxlen, so allow top-3)."""
    cfg, encoder, passages, path = built_index
    searcher = Searcher(path, encoder=encoder)
    hits = 0
    probe = [0, 5, 11, 23, 37]
    for pid in probe:
        pids, _ = searcher.search(passages[pid], k=3)
        if pid in pids:
            hits += 1
    assert hits >= 4, f"self-retrieval hits {hits}/5"


def test_search_single_equals_batch(built_index):
    cfg, encoder, passages, path = built_index
    searcher = Searcher(path, encoder=encoder)
    p1, s1 = searcher.search(passages[7], k=4)
    pb, sb = searcher.search_batch([passages[7], passages[2]], k=4)
    np.testing.assert_array_equal(p1, pb[0])
    np.testing.assert_allclose(s1, sb[0], rtol=1e-5)


def test_search_stream_equals_sequential(built_index):
    cfg, encoder, passages, path = built_index
    searcher = Searcher(path, encoder=encoder)
    # ragged batch sizes exercise bucket padding inside the stream; an
    # empty batch must yield empty results without breaking the pipeline
    batches = [passages[0:3], passages[3:4], [], passages[4:9]]
    streamed = list(searcher.search_stream(batches, k=4, max_inflight=2))
    assert len(streamed) == len(batches)
    for qb, (pids, scores) in zip(batches, streamed):
        ep, es = searcher.search_batch(list(qb), k=4)
        np.testing.assert_array_equal(pids, ep)
        np.testing.assert_allclose(scores, es, rtol=1e-5)


def test_search_stream_host_backend_fallback(built_index):
    cfg, encoder, passages, path = built_index
    searcher = Searcher(path, encoder=encoder, backend="host")
    batches = [passages[0:2], passages[2:5]]
    streamed = list(searcher.search_stream(batches, k=3))
    assert len(streamed) == 2
    for qb, (pids, _) in zip(batches, streamed):
        ep, _ = searcher.search_batch(list(qb), k=3)
        np.testing.assert_array_equal(pids, ep)


def test_resume_skips_complete_chunks(built_index, tmp_path):
    cfg, encoder, passages, path = built_index
    # removing one chunk's artifacts and rebuilding only rebuilds that chunk
    import os, shutil

    path2 = str(tmp_path / "idx2")
    shutil.copytree(path, path2)
    os.remove(os.path.join(path2, "1.codes.npy"))
    before = fmt.load_chunk(path2, 0)["codes"].copy()
    indexer = Indexer(cfg, encoder=encoder, collection=passages)
    indexer.index(path2)
    assert fmt.check_all_files_saved(path2) == []
    np.testing.assert_array_equal(fmt.load_chunk(path2, 0)["codes"], before)
    # chunk 1 was rebuilt identically (deterministic pipeline)
    np.testing.assert_array_equal(
        fmt.load_chunk(path2, 1)["codes"], fmt.load_chunk(path, 1)["codes"]
    )


def test_load_collection_tsv(tmp_path):
    p = tmp_path / "coll.tsv"
    p.write_text("1\tfirst passage\n2\tsecond passage\ttitle\n")
    assert load_collection(str(p)) == ["first passage", "second passage"]
    p2 = tmp_path / "coll.txt"
    p2.write_text("line one\nline two\n")
    assert load_collection(str(p2)) == ["line one", "line two"]
    assert load_collection(["a", "b"]) == ["a", "b"]


def test_resume_reuses_saved_codec(built_index, tmp_path, monkeypatch):
    # on resume the saved codec must be loaded, NOT retrained: retraining
    # would overwrite the centroids the kept chunks were compressed against
    cfg, encoder, passages, path = built_index
    import os, shutil
    import colbert_tpu.indexing.builder as builder_mod

    path2 = str(tmp_path / "idx_resume_codec")
    shutil.copytree(path, path2)
    os.remove(os.path.join(path2, "1.codes.npy"))
    centroids_before = np.load(os.path.join(path2, "centroids.npy")).copy()

    def boom(*a, **k):
        raise AssertionError("train_codec must not run on resume")

    monkeypatch.setattr(builder_mod, "train_codec", boom)
    Indexer(cfg, encoder=encoder, collection=passages).index(path2)
    assert fmt.check_all_files_saved(path2) == []
    np.testing.assert_array_equal(
        np.load(os.path.join(path2, "centroids.npy")), centroids_before
    )


def test_resume_rejects_different_collection(built_index, tmp_path):
    cfg, encoder, passages, path = built_index
    import os, shutil

    path2 = str(tmp_path / "idx_stale")
    shutil.copytree(path, path2)
    os.remove(os.path.join(path2, "ivf.npy"))  # force incomplete -> rebuild
    with pytest.raises(RuntimeError, match="different"):
        Indexer(cfg, encoder=encoder, collection=passages[:-3]).index(path2)


def test_overwrite_clears_stale_artifacts(built_index, tmp_path):
    cfg, encoder, passages, path = built_index
    import os, shutil

    path2 = str(tmp_path / "idx_overwrite")
    shutil.copytree(path, path2)
    # a stale extra chunk from a previous larger build must not survive
    shutil.copy(
        os.path.join(path2, "1.codes.npy"), os.path.join(path2, "9.codes.npy")
    )
    Indexer(cfg, encoder=encoder, collection=passages).index(path2, overwrite=True)
    assert not os.path.exists(os.path.join(path2, "9.codes.npy"))
    assert fmt.check_all_files_saved(path2) == []


def test_multirank_build_stride(built_index, tmp_path):
    """nranks > 1 shards chunks across ranks against a shared index dir;
    the last rank to finish builds the IVF, and the result matches a
    single-rank build exactly."""
    import dataclasses
    import os

    cfg, encoder, passages, path = built_index
    path2 = str(tmp_path / "idx_ranks")
    cfg0 = dataclasses.replace(cfg, nranks=2, rank=0)
    Indexer(cfg0, encoder=encoder, collection=passages).index(path2)
    # rank 0 alone leaves the build partial (no IVF yet)
    assert not os.path.exists(os.path.join(path2, "ivf.npy"))
    assert fmt.chunk_is_complete(path2, 0)
    assert not fmt.chunk_is_complete(path2, 1)
    cfg1 = dataclasses.replace(cfg, nranks=2, rank=1)
    Indexer(cfg1, encoder=encoder, collection=passages).index(path2)
    assert fmt.check_all_files_saved(path2) == []
    np.testing.assert_array_equal(
        fmt.load_all_codes(path2), fmt.load_all_codes(path)
    )
    ivf1, _ = fmt.load_ivf(path)
    ivf2, _ = fmt.load_ivf(path2)
    np.testing.assert_array_equal(ivf1, ivf2)


def test_build_and_search_nbits4(tmp_path):
    """The full pipeline at nbits=4 (codec paths beyond the default 2)."""
    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=16, nbits=4, kmeans_niters=4, nprobe=4, mesh_data_axis=1,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg)
    passages = synthetic_collection(32, seed=9)
    path = str(tmp_path / "idx4")
    Indexer(cfg, encoder=encoder, collection=passages).index(path)
    s = Searcher(path, encoder=encoder)
    pids, scores = s.search_batch([passages[3], passages[30]], k=3)
    assert pids[0][0] == 3 and pids[1][0] == 30
    assert (np.diff(scores[0][scores[0] > -np.inf]) <= 1e-6).all()


def test_multirank_build_concurrent_processes(built_index, tmp_path):
    """TWO concurrent rank processes on a shared index dir: rank 1 must wait
    for rank 0's codec (not race-train its own), and whichever finishes last
    must complete the IVF. Result matches the single-rank build."""
    import os
    import subprocess
    import sys

    cfg, encoder, passages, path = built_index
    path2 = str(tmp_path / "idx_concurrent")
    script = r"""
import sys, os
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
from colbert_tpu.config import ColBERTConfig
from colbert_tpu.indexing.builder import Indexer
from colbert_tpu.utils.testing import make_encoder, synthetic_collection

rank = int(sys.argv[1])
cfg = ColBERTConfig(
    dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
    chunksize=16, nbits=2, kmeans_niters=6, nprobe=4, mesh_data_axis=1,
    nranks=2, rank=rank,
)
enc = make_encoder(dim=32, seed=0, config=cfg)
passages = synthetic_collection(40, seed=1)
Indexer(cfg, encoder=enc, collection=passages).index({path!r})
""".format(root=os.getcwd(), path=path2)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(r)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for r in (1, 0)  # start the WAITING rank first to force the race
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    assert fmt.check_all_files_saved(path2) == []
    np.testing.assert_array_equal(
        fmt.load_all_codes(path2), fmt.load_all_codes(path)
    )


def test_long_context_end_to_end(tmp_path):
    """doc_maxlen > 512 (SURVEY §5 long-context): ~600-token passages build
    and retrieve through the full pipeline — the reference truncates at 300
    and has no long-doc story (config.jl:72). On TPU these lengths route
    through strict 128-buckets; attention stays on XLA's fused path (the
    flash kernel measured slower at every BERT-reachable length, see
    config.flash_min_seqlen)."""
    from colbert_tpu.models.bert import BertConfig

    cfg = ColBERTConfig(
        dim=32, doc_maxlen=640, query_maxlen=16, index_bsize=4,
        length_bucket=128, chunksize=8, nbits=2, kmeans_niters=4, nprobe=4,
    )
    bert_cfg = BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=768,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg, bert_config=bert_cfg)
    passages = synthetic_collection(12, seed=6, words_per_doc=600)
    path = str(tmp_path / "idx")
    Indexer(cfg, encoder=encoder, collection=passages).index(path)
    s = Searcher(path, encoder=encoder)
    # long docs were not truncated: doclens reflect ~600 kept tokens
    assert int(np.median(s.doclens)) > 400
    pids, _ = s.search_batch([passages[3][:400], passages[9][:400]], k=3)
    assert pids[0][0] == 3 and pids[1][0] == 9
