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


def test_pad_probe_rows_unselectable():
    """Probe-table pads (shards padded to a common K' after per-shard
    balancing) must never win probe slots: a query whose top cell on the
    less-split shard coincides with whatever centroid fills the pad rows
    must still reach its OTHER cells with the remaining nprobe slots."""
    dim, nbits, k = 32, 2, 4
    eye = np.eye(k, dim, dtype=np.float32)          # centroids e0..e3
    # shard A (first 32 passages): every token in cell 0 -> mega-cell that
    # splits into MAX_CELL_DUP sub-cells at cap=8 (K_A = 3 + 4 = 7)
    # shard B (last 32): codes cycle 0..3, max cell 8 <= cap -> unsplit,
    # K_B = 4, padded to K'=7 with 3 pad rows
    codes = np.concatenate([
        np.zeros(32, np.uint32),
        (np.arange(32) % k).astype(np.uint32),
    ])
    residuals = np.zeros((64, dim // 8 * nbits), np.uint8)
    doclens = np.ones(64, np.int64)
    mesh = make_mesh(2, 1)
    idx = ShardedDeviceIndex.build(
        mesh,
        centroids=eye,
        codes=codes,
        residuals=residuals,
        doclens=doclens,
        bucket_weights=np.zeros(2 ** nbits, np.float32),  # tokens == centroids
        nbits=nbits,
        balance_cap=8,
    )
    assert idx.probe_cents.shape[1] == 7   # K' from shard A's split
    assert int(np.asarray(idx.n_cells)[1, 0]) == 4  # shard B valid rows

    # query token: cell 0 strongest, cell 1 second
    q = (0.9 * eye[0] + 0.45 * eye[1])[None, None, :]  # (B=1, Lq=1, dim)
    pids, scores = idx.search_Q_batch(
        jnp.asarray(q), k=48, nprobe=2, ncandidates=64,
        cell_cap=8, max_candidates=128,
    )
    got = set(pids[0][scores[0] > -np.inf].tolist())
    cell1_docs_shard_b = {32 + i for i in range(32) if i % k == 1}
    # with pads selectable, shard B's 2nd probe slot was a cell-0 duplicate
    # and none of its cell-1 docs ever surfaced
    assert cell1_docs_shard_b <= got, (sorted(got), sorted(cell1_docs_shard_b))


def test_overwrite_rank0_only(tmp_path):
    """overwrite=True on a non-zero rank of a multi-rank build must be
    rejected (it would clear rank 0's plan/codec mid-build)."""
    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8,
        length_bucket=16, chunksize=32, nbits=2, kmeans_niters=2,
        nranks=2, rank=1,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg)
    idxr = Indexer(cfg, encoder=encoder, collection=synthetic_collection(40, seed=3))
    with pytest.raises(ValueError, match="rank 0"):
        idxr.index(str(tmp_path / "idx"), overwrite=True)


def test_sharded_search_program_cached(built):
    """search_Q_batch must reuse ONE compiled program per geometry: the
    shard_map+jit factory is lru_cached, so repeated batches neither rebuild
    the callable nor retrace (VERDICT r2: per-call re-jit made the sharded
    backend unusable for serving)."""
    from colbert_tpu.parallel.sharded_index import _sharded_search_fn
    from colbert_tpu.storage import format as fmt

    cfg, encoder, passages, s = built
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
    static = dict(
        sentinel_pid=sharded.shard_passages, nbits=cfg.nbits,
        max_doclen=sharded.max_doclen, k=5, nprobe=2, ncandidates=64,
        cell_cap=64, max_candidates=256, centroid_threshold=None,
        stage1_refine=True,
    )
    f1 = _sharded_search_fn(mesh, **static)
    f2 = _sharded_search_fn(mesh, **static)
    assert f1 is f2  # same geometry -> same jitted callable (jit cache hits)

    Q = jnp.asarray(encoder.encode_queries([passages[0], passages[42]]))
    sharded.search_Q_batch(Q, k=5, nprobe=2, ncandidates=64,
                           cell_cap=64, max_candidates=256)
    fn = _sharded_search_fn(
        mesh, sentinel_pid=sharded.shard_passages, nbits=sharded.nbits,
        max_doclen=sharded.max_doclen, k=5, nprobe=2, ncandidates=64,
        cell_cap=64, max_candidates=256, centroid_threshold=None,
        stage1_refine=True,
    )
    n_traces = fn._cache_size()
    sharded.search_Q_batch(Q, k=5, nprobe=2, ncandidates=64,
                           cell_cap=64, max_candidates=256)
    sharded.search_Q_batch(Q, k=5, nprobe=2, ncandidates=64,
                           cell_cap=64, max_candidates=256)
    assert fn._cache_size() == n_traces  # no retrace on repeat batches


def test_merge_shard_topk_semantics():
    """The host merge: sentinel rows masked, shard-local pids globalized via
    pid_base, exact top-k across shards (bench_sharded times this function
    on real table shapes — keep it equivalent to an explicit reference)."""
    from colbert_tpu.parallel.sharded_index import merge_shard_topk

    sentinel = 100
    pid_base = np.array([0, 100, 250], np.int64)  # 3 shards, ragged sizes
    # shard 1 returns one sentinel (padded) slot; shard 2 dominates
    lp = np.array([
        [[3, 1], [0, 2]],
        [[5, sentinel], [sentinel, sentinel]],
        [[7, 0], [1, 2]],
    ], np.int32)  # (D=3, B=2, k_local=2)
    ls = np.array([
        [[0.9, 0.5], [0.1, 0.05]],
        [[0.7, 123.0], [-9.0, -9.0]],
        [[1.5, 0.8], [0.3, 0.2]],
    ], np.float32)  # sentinel slots carry garbage scores

    out_p, out_s = merge_shard_topk(lp, ls, pid_base, sentinel, k=4)
    # query 0: shard2 pid7 -> 257 (1.5), shard0 pid3 -> 3 (0.9),
    # shard2 pid0 -> 250 (0.8), shard1 pid5 -> 105 (0.7); the sentinel
    # slot's garbage 123.0 must NOT surface
    assert out_p[0].tolist() == [257, 3, 250, 105]
    np.testing.assert_allclose(out_s[0], [1.5, 0.9, 0.8, 0.7], rtol=1e-6)
    # query 1: shard 1 fully sentinel -> only shards 0/2 contribute
    assert out_p[1].tolist() == [251, 252, 0, 2]
    np.testing.assert_allclose(out_s[1], [0.3, 0.2, 0.1, 0.05], rtol=1e-6)
    # no sentinel-derived global pid anywhere
    banned = {int(b) + sentinel for b in pid_base}
    assert not (set(out_p.ravel().tolist()) & banned)
    assert (out_p >= 0).all()


def test_merge_shard_topk_all_sentinel_query():
    from colbert_tpu.parallel.sharded_index import merge_shard_topk

    lp = np.full((2, 1, 3), 7, np.int32)  # every slot sentinel
    ls = np.zeros((2, 1, 3), np.float32)
    out_p, out_s = merge_shard_topk(lp, ls, np.array([0, 7]), 7, k=2)
    assert (out_p == -1).all()
    assert not np.isfinite(out_s).any()


def test_build_requires_residuals_with_codes():
    mesh = make_mesh(8, 1)
    with pytest.raises(ValueError, match="together"):
        ShardedDeviceIndex.build(
            mesh, centroids=np.zeros((4, 16), np.float32),
            codes=np.zeros((8,), np.int32), residuals=None,
            doclens=np.array([4, 4]), bucket_weights=np.zeros((4,)), nbits=2,
        )
