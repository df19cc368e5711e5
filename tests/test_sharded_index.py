"""Sharded (pod-serving) index must return the same results as the
single-device DeviceIndex on the 8-device virtual CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.indexing.builder import Indexer
from colbert_tpu.parallel.mesh import make_mesh
from colbert_tpu.parallel.sharded_index import ShardedDeviceIndex
from colbert_tpu.retrieval.searcher import Searcher
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=32, nbits=2, kmeans_niters=5, nprobe=6,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg)
    passages = synthetic_collection(100, seed=7)
    path = str(tmp_path_factory.mktemp("sh_idx") / "idx")
    Indexer(cfg, encoder=encoder, collection=passages).index(path)
    searcher = Searcher(path, encoder=encoder)  # device backend, 1 "device"
    return cfg, encoder, passages, searcher


def test_sharded_matches_single_device(built):
    cfg, encoder, passages, s = built
    from colbert_tpu.storage import format as fmt

    mesh = make_mesh(8, 1)
    sharded = ShardedDeviceIndex.build(
        mesh,
        centroids=np.asarray(s.centroids),
        codes=fmt.load_all_codes(s.index_path),
        residuals=fmt.load_all_residuals(s.index_path),
        doclens=np.asarray(s.doclens, np.int64),
        bucket_weights=np.asarray(s.bucket_weights),
        nbits=cfg.nbits,
    )
    queries = [passages[3], passages[55], passages[99], "the dog runs"]
    Q = jnp.asarray(encoder.encode_queries(queries))
    # single-device exhaustive scoring as ground truth: nprobe = all via
    # existing device path
    p1, s1 = s.search_batch(queries, k=5)
    p2, s2 = sharded.search_Q_batch(
        Q, k=5, nprobe=cfg.nprobe, ncandidates=cfg.ncandidates,
    )
    # candidate generation is shard-local (per-shard IVFs probe the same
    # nprobe cells), so every pid surfaced by the single-device search is
    # also surfaced by its shard; exact same scores and ranking.
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)


def test_sharded_pid_ranges(built):
    cfg, encoder, passages, s = built
    from colbert_tpu.storage import format as fmt

    mesh = make_mesh(4, 1)
    sharded = ShardedDeviceIndex.build(
        mesh,
        centroids=np.asarray(s.centroids),
        codes=fmt.load_all_codes(s.index_path),
        residuals=fmt.load_all_residuals(s.index_path),
        doclens=np.asarray(s.doclens, np.int64),
        bucket_weights=np.asarray(s.bucket_weights),
        nbits=cfg.nbits,
    )
    assert sharded.pid_base[0] == 0
    assert (np.diff(sharded.pid_base) > 0).all()
    Q = jnp.asarray(encoder.encode_queries([passages[0]]))
    pids, scores = sharded.search_Q_batch(
        Q, k=10, nprobe=cfg.nprobe, ncandidates=cfg.ncandidates
    )
    valid = pids[0][pids[0] >= 0]
    assert len(np.unique(valid)) == len(valid)
    assert valid.max() < len(passages)


def test_sharded_balanced_matches_unbalanced(built, rng):
    """Per-shard balanced IVF (duplicated-centroid sub-cells padded to a
    common K' across shards) must reproduce the unbalanced sharded results
    when enough probes cover the splits."""
    from colbert_tpu.storage import format as fmt

    cfg, encoder, passages, s = built
    codes = fmt.load_all_codes(s.index_path)
    residuals = fmt.load_all_residuals(s.index_path)
    common = dict(
        centroids=np.asarray(s.centroids), codes=codes, residuals=residuals,
        doclens=np.asarray(s.doclens, np.int64),
        bucket_weights=np.asarray(s.bucket_weights), nbits=cfg.nbits,
    )
    mesh = make_mesh(4, 1)
    plain = ShardedDeviceIndex.build(mesh, balance_cap=None, **common)
    cap = 8
    bal = ShardedDeviceIndex.build(mesh, balance_cap=cap, **common)
    assert bal.probe_cents.shape[1] >= plain.ivf_lengths.shape[1]
    assert int(np.asarray(bal.ivf_lengths).max()) <= cap

    queries = [passages[3], passages[55], "the dog runs"]
    Q = jnp.asarray(encoder.encode_queries(queries))
    k_cells = int(np.asarray(s.centroids).shape[0])
    kw = dict(k=5, ncandidates=64, max_candidates=512)
    p1, s1 = plain.search_Q_batch(
        Q, nprobe=k_cells, cell_cap=1024, **kw
    )
    # probe every sub-cell: K' slots cover everything each shard holds
    p2, s2 = bal.search_Q_batch(
        Q, nprobe=int(bal.probe_cents.shape[1]), cell_cap=cap, **kw
    )
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)
