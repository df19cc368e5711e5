"""The parallel layer must be reachable from the PUBLIC API: an Indexer on a
multi-device mesh (DP encode + psum'd k-means + distributed quantiles) and a
Searcher with the sharded backend must reproduce single-device results.
Runs on the 8-virtual-CPU-device mesh (tests/conftest.py)."""

import jax
import numpy as np
import pytest

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.indexing.builder import Indexer
from colbert_tpu.retrieval.searcher import Searcher
from colbert_tpu.storage import format as fmt
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


def _cfg(**kw):
    return ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=32, nbits=2, kmeans_niters=5, nprobe=4, **kw,
    )


@pytest.fixture(scope="module")
def builds(tmp_path_factory):
    passages = synthetic_collection(64, seed=3)
    paths = {}
    for name, n_data, n_model in [("single", 1, 1), ("mesh", -1, 1), ("tp", 4, 2)]:
        cfg = _cfg(mesh_data_axis=n_data, mesh_model_axis=n_model)
        enc = make_encoder(dim=32, seed=0, config=cfg)
        path = str(tmp_path_factory.mktemp(f"par_{name}") / "idx")
        indexer = Indexer(cfg, encoder=enc, collection=passages)
        if name == "mesh":
            assert indexer.mesh is not None and indexer.mesh.shape["data"] == 8
            assert enc.mesh is indexer.mesh  # DP encode wired into the facade
        elif name == "tp":
            assert dict(indexer.mesh.shape) == {"data": 4, "model": 2}
            qk = enc.params["bert"]["layers"]["q"]["kernel"]
            assert "model" in qk.sharding.spec  # Megatron-sharded params
        else:
            assert indexer.mesh is None
        indexer.index(path)
        paths[name] = (cfg, enc, path)
    return passages, paths


def test_mesh_build_matches_single_device(builds):
    passages, paths = builds
    cfg1, enc1, p1 = paths["single"]
    cfg8, enc8, p8 = paths["mesh"]
    # identical artifact *shapes* and near-identical codec (same seeds; the
    # sharded Lloyd psum may reorder float additions)
    c1, c8 = fmt.load_codec(p1), fmt.load_codec(p8)
    assert c1["centroids"].shape == c8["centroids"].shape
    np.testing.assert_allclose(c1["centroids"], c8["centroids"], atol=2e-3)
    np.testing.assert_allclose(
        c1["bucket_cutoffs"], c8["bucket_cutoffs"], atol=2e-3
    )
    # retrieval through the public API must agree
    queries = [passages[5], passages[40], "the dog runs"]
    s1 = Searcher(p1, encoder=enc1)
    s8 = Searcher(p8, encoder=enc8)
    pids1, scores1 = s1.search_batch(queries, k=5)
    pids8, scores8 = s8.search_batch(queries, k=5)
    # the two codecs differ by float reduction order (psum'd Lloyd stats),
    # so near-tied tail ranks may swap; the podium and scores must agree
    np.testing.assert_array_equal(pids1[:, :3], pids8[:, :3])
    np.testing.assert_allclose(scores1, scores8, atol=0.02)


def test_tp_build_matches_single_device(builds):
    """A 4x2 dp x tp build through the public Indexer must reproduce the
    single-device index at the behavior level. (Unlike DP — which is
    bitwise-identical per example — TP's per-block all-reduce perturbs
    embeddings at float precision, which can flip near-tied k-means
    assignments and move the affected centroids; retrieval must agree
    anyway.)"""
    passages, paths = builds
    cfg1, enc1, p1 = paths["single"]
    cfgt, enct, pt = paths["tp"]
    c1, ct = fmt.load_codec(p1), fmt.load_codec(pt)
    close = np.abs(c1["centroids"] - ct["centroids"]) < 2e-3
    assert close.mean() > 0.9, f"only {close.mean():.2%} of centroid entries agree"
    queries = [passages[5], passages[40], passages[17], "the dog runs"]
    s1 = Searcher(p1, encoder=enc1)
    st = Searcher(pt, encoder=enct)
    pids1, scores1 = s1.search_batch(queries, k=5)
    pidst, scorest = st.search_batch(queries, k=5)
    # self-retrieval queries agree on the winner; scores agree closely
    np.testing.assert_array_equal(pids1[:3, 0], [5, 40, 17])
    np.testing.assert_array_equal(pidst[:3, 0], [5, 40, 17])
    # scores reconstruct through slightly different codecs: <1% of the
    # ~10-15 MaxSim magnitude
    np.testing.assert_allclose(scores1[:, 0], scorest[:, 0], atol=0.15)


def test_sharded_searcher_backend(builds):
    passages, paths = builds
    cfg, enc, path = paths["mesh"]
    s_dev = Searcher(path, encoder=enc, backend="device")
    s_sh = Searcher(path, encoder=enc, backend="sharded")
    assert s_sh.mesh.shape["data"] == 8
    assert s_sh.codes is None  # no host-resident index copies
    queries = [passages[2], passages[33], passages[63]]
    pd, sd = s_dev.search_batch(queries, k=5)
    ps, ss = s_sh.search_batch(queries, k=5)
    np.testing.assert_array_equal(pd, ps)
    np.testing.assert_allclose(sd, ss, rtol=1e-4, atol=1e-4)


def test_sharded_pipelined_serving(builds):
    """search_stream and the BatchingSearcher pipeline on the sharded
    backend too (launch/finish through search_Q_batch_async + the
    device-resident query encode) and must match sequential results."""
    from colbert_tpu.serving.batcher import BatchingSearcher

    passages, paths = builds
    cfg, enc, path = paths["mesh"]
    s_sh = Searcher(path, encoder=enc, backend="sharded")
    queries = [passages[i] for i in (2, 9, 33, 41, 63, 7)]
    batches = [queries[:2], queries[2:4], queries[4:]]
    seq = [s_sh.search_batch(qb, k=4) for qb in batches]
    streamed = list(s_sh.search_stream(batches, k=4, max_inflight=2))
    for (sp, ssc), (gp, gsc) in zip(seq, streamed):
        np.testing.assert_array_equal(sp, gp)
        np.testing.assert_allclose(ssc, gsc)
    with BatchingSearcher(s_sh, max_batch=2, max_wait_ms=5) as b:
        futs = [b.submit(q, k=4) for q in queries]
        flat_p = np.concatenate([p for p, _ in seq])
        for i, f in enumerate(futs):
            p, _ = f.result(timeout=120)
            np.testing.assert_array_equal(p, flat_p[i])
        assert b.stats["batches"] >= 3


def test_distributed_quantiles_match_exact(rng):
    from colbert_tpu.ops.quantile import sharded_quantiles
    from colbert_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, 1)
    x = rng.standard_normal((4096, 16)).astype(np.float32)
    w = np.ones((4096,), np.float32)
    w[4000:] = 0.0  # padding rows must be ignored
    qs = np.asarray([0.25, 0.5, 0.75, 0.875], np.float32)
    got, mean_abs = sharded_quantiles(x, qs, mesh, weights=w)
    want = np.quantile(x[:4000].reshape(-1), qs)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
    np.testing.assert_allclose(
        float(mean_abs), np.abs(x[:4000]).mean(), rtol=1e-5
    )
