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


def test_streaming_build_equals_array_build(built):
    """stream_from (mmap chunk -> donated HBM writes, no host index copy)
    must produce a bit-identical device index to the host-array path."""
    import jax.numpy as jnp

    from colbert_tpu.retrieval.device_index import DeviceIndex
    from colbert_tpu.storage import format as fmt

    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)  # uses stream_from internally
    codec = fmt.load_codec(path)
    ivf, ivf_lengths = fmt.load_ivf(path)
    arr = DeviceIndex.build(
        centroids=codec["centroids"],
        codes=fmt.load_all_codes(path, mmap=True, extra_rows=1),
        residuals=fmt.load_all_residuals(path, mmap=True, extra_rows=1),
        ivf=ivf, ivf_lengths=ivf_lengths,
        doclens=np.asarray(s.doclens, np.int64),
        bucket_weights=codec["bucket_weights"], nbits=cfg.nbits,
        balance_cap=1024,
    )
    np.testing.assert_array_equal(
        np.asarray(s.device_index.codes), np.asarray(arr.codes)
    )
    np.testing.assert_array_equal(
        np.asarray(s.device_index.residuals), np.asarray(arr.residuals)
    )


def test_query_batch_bucketing(built):
    """Odd batch sizes pad to the next bucket (serving never retraces) and
    the padded rows must not perturb real queries' results."""
    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)
    queries = [passages[5], passages[33], "the dog runs fast", passages[59],
               passages[12]]
    p5, s5 = s.search_batch(queries, k=5)           # B=5 -> bucket 8
    assert p5.shape == (5, 5)
    p8, s8 = s.search_batch(queries + [""] * 3, k=5)  # explicit pad rows
    np.testing.assert_array_equal(p5, p8[:5])
    np.testing.assert_allclose(s5, s8[:5])
    # chunking: B > largest bucket still returns B rows, chunk-equal
    big = (queries * 27)[:130]
    cap = Searcher.QUERY_BATCH_BUCKETS[-1]
    pb, sb = s.search_batch(big, k=3)
    assert pb.shape == (130, 3)
    ph, _ = s.search_batch(big[:cap], k=3)
    np.testing.assert_array_equal(pb[:cap], ph)


def test_device_backend_k_larger_than_candidates(built):
    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)
    pids, scores = s.search(passages[0], k=len(passages) + 20)
    valid = pids >= 0
    assert valid.sum() <= len(passages)
    assert len(np.unique(pids[valid])) == valid.sum()  # no duplicate pids


def test_plaid_cell_pruning_preserves_topk(built):
    """Centroid-threshold cell pruning must keep the same top-k on clustered
    data (the pruned cells only ever contribute weak candidates)."""
    import jax.numpy as jnp

    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)
    queries = [passages[5], passages[33], passages[59]]
    Q = jnp.asarray(encoder.encode_queries(queries))
    kw = dict(k=5, nprobe=cfg.nprobe, ncandidates=cfg.ncandidates,
              cell_cap=s.cell_cap, max_candidates=s.max_candidates)
    p_full, s_full = s.device_index.search_Q_batch(Q, centroid_threshold=None, **kw)
    p_pruned, s_pruned = s.device_index.search_Q_batch(
        Q, centroid_threshold=cfg.centroid_score_threshold, **kw
    )
    np.testing.assert_array_equal(p_full, p_pruned)
    np.testing.assert_allclose(s_full, s_pruned, rtol=1e-4, atol=1e-4)


def test_candidate_overflow_counted_and_score_ordered(built):
    """When max_candidates truncates the dedup set, the overflow is counted
    and the kept candidates are the best stage-0 scorers (so the true top-1
    survives), not an arbitrary pid-ordered prefix."""
    import jax.numpy as jnp

    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)
    Q = jnp.asarray(encoder.encode_queries([passages[20]]))
    kw = dict(k=3, nprobe=cfg.nprobe, ncandidates=cfg.ncandidates,
              cell_cap=s.cell_cap)
    p_full, _ = s.device_index.search_Q_batch(
        Q, max_candidates=s.max_candidates, **kw
    )
    before = s.device_index.overflow_candidates
    p_tight, _ = s.device_index.search_Q_batch(Q, max_candidates=4, **kw)
    assert s.device_index.overflow_candidates > before  # surfaced
    assert p_tight[0, 0] == p_full[0, 0]  # best candidate survives truncation


@pytest.mark.parametrize("nprobe,ncand,cell_cap,refine", [
    (1, 8, 32, False),     # nprobe=1: probed bound degenerates; midpoint must still rank
    (2, 4, 16, True),      # tiny caps: heavy truncation everywhere
    (6, 64, 128, True),    # wide probe
])
def test_search_invariants_under_configs(built, nprobe, ncand, cell_cap, refine):
    """Structural invariants must hold for any funnel configuration: unique
    in-range pids, descending scores, sentinel-free output rows."""
    import jax.numpy as jnp

    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)
    Q = jnp.asarray(encoder.encode_queries([passages[9], "dog runs fast", passages[41]]))
    pids, scores = s.device_index.search_Q_batch(
        Q, k=7, nprobe=nprobe, ncandidates=ncand, cell_cap=cell_cap,
        max_candidates=256, centroid_threshold=0.45, stage1_refine=refine,
    )
    for b in range(pids.shape[0]):
        valid = pids[b] >= 0
        vp = pids[b][valid]
        assert len(np.unique(vp)) == len(vp)              # no duplicates
        assert (vp < len(passages)).all()                 # in range
        vs = scores[b][valid]
        assert (np.diff(vs) <= 1e-5).all()                # descending
        assert np.isfinite(vs).all()
        assert valid.sum() >= 1                           # something returned


def test_balanced_ivf_split_preserves_results(rng):
    """A mega-cell split into duplicated-centroid sub-cells must stay fully
    probeable: with enough probes, results match the unbalanced exact index."""
    import jax.numpy as jnp
    from colbert_tpu.ops import codec as codec_ops
    from colbert_tpu.retrieval.device_index import DeviceIndex

    P, Ld, dim, k, nbits = 24, 4, 32, 8, 2
    N = P * Ld
    embs = rng.standard_normal((N, dim)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    cent = rng.standard_normal((k, dim)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    # force a skewed assignment: half of all embeddings into cell 0
    codes = np.asarray(rng.integers(0, k, N), np.uint32)
    codes[: N // 2] = 0
    cuts = np.sort(rng.standard_normal(3)).astype(np.float32) * 0.1
    res = np.asarray(codec_ops.compress_residuals(
        jnp.asarray(embs), jnp.asarray(cent[codes]), jnp.asarray(cuts), nbits=nbits
    ))
    bw = np.sort(rng.standard_normal(4)).astype(np.float32) * 0.1
    ivf = np.argsort(codes, kind="stable").astype(np.int64)
    ivf_lengths = np.bincount(codes, minlength=k).astype(np.int32)
    doclens = np.full((P,), Ld, np.int64)
    common = dict(centroids=cent, codes=codes, residuals=res, ivf=ivf,
                  ivf_lengths=ivf_lengths, doclens=doclens,
                  bucket_weights=bw, nbits=nbits)

    full = DeviceIndex.build(balance_cap=None, **common)
    cap = 16  # ceil(max_cell / cap) stays within MAX_CELL_DUP: no truncation
    nsub = np.clip(-(-ivf_lengths // cap), 1, DeviceIndex.MAX_CELL_DUP)
    assert int((-(-ivf_lengths // cap)).max()) <= DeviceIndex.MAX_CELL_DUP
    bal = DeviceIndex.build(balance_cap=cap, **common)
    # sub-cell lengths repartition the originals exactly
    assert int(np.asarray(bal.ivf_lengths).sum()) == N
    assert int(np.asarray(bal.ivf_lengths).max()) <= cap
    assert bal.probe_centroids.shape[0] == int(nsub.sum()) > k
    assert bal.probe_dup_max == int(nsub.max())

    Q = jnp.asarray(rng.standard_normal((2, 8, dim)).astype(np.float32))
    kw = dict(k=5, ncandidates=P, max_candidates=256, use_pallas=False)
    p_full, s_full = full.search_Q_batch(
        Q, nprobe=k, cell_cap=int(ivf_lengths.max()), **kw
    )
    # probing every sub-cell covers every entry the unbalanced index reads
    p_bal, s_bal = bal.search_Q_batch(Q, nprobe=int(nsub.sum()), cell_cap=cap, **kw)
    np.testing.assert_array_equal(p_full, p_bal)
    np.testing.assert_allclose(s_full, s_bal, rtol=1e-4, atol=1e-4)

    # half the corpus lives in the forced mega-cell -> split mass saturates
    # the compensation at the worst case (the pre-round-4 fixed rule)
    assert bal.probe_split_mass > 0.01
    assert bal.compensated_nprobe(2) == 2 + int(nsub.max()) - 1


def test_probe_compensation_scales_with_split_mass():
    """The probe-dup compensation is worst-case when split cells carry real
    mass, and ~zero when one stray cell split (measured at 141k with 4x
    partitions: one 4.7k-entry cell of 131072 -> the old fixed dup_max-1
    rule cost 2.5x stage-1 entries for a 0.03% recall exposure)."""
    from colbert_tpu.retrieval.device_index import (
        probe_compensation,
        split_mass_fraction,
    )

    assert probe_compensation(1, 0.5) == 0          # nothing split
    assert probe_compensation(4, 0.0) == 0
    assert probe_compensation(4, 0.5) == 3          # heavy split: worst case
    assert probe_compensation(4, 0.05) == 3         # saturation point
    assert probe_compensation(4, 0.0003) == 0       # one stray cell
    assert probe_compensation(4, 0.0123) == 1       # the measured 141k@4x
    assert probe_compensation(2, 1.0) == 1

    # split_mass_fraction counts probeable (post-truncation) entries
    lengths = np.array([10, 10, 100], np.int64)
    cap = 16
    # cell 2 splits: probeable mass min(100, 4*16)=64 of 10+10+64
    assert split_mass_fraction(lengths, cap) == 64 / 84
    assert split_mass_fraction(np.array([5, 5], np.int64), cap) == 0.0
    assert split_mass_fraction(np.zeros(0, np.int64), cap) == 0.0


def test_float_sort_fallback_matches_int_path(built):
    """Corpora beyond the int32 composite-key range take a two-sort float
    path; it must produce identical results to the int path."""
    import jax.numpy as jnp

    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)
    Q = jnp.asarray(encoder.encode_queries([passages[9], passages[41]]))
    kw = dict(k=5, nprobe=4, ncandidates=64, cell_cap=s.cell_cap,
              max_candidates=s.max_candidates, centroid_threshold=0.45)
    p_int, s_int = s.device_index.search_Q_batch(Q, **kw)
    p_flt, s_flt = s.device_index.search_Q_batch(Q, force_float_sort=True, **kw)
    np.testing.assert_array_equal(p_int, p_flt)
    np.testing.assert_allclose(s_int, s_flt, rtol=1e-5, atol=1e-5)


def test_gather_fallback_beyond_ivf_pad_matches_sliced_path(built):
    """cell_cap > IVF_PAD routes the IVF cell reads through the clamped
    element-gather fallback (the dynamic_slice window would run past the
    tail pad); it must produce identical results to the sliced path. Both
    caps cover every cell of this corpus in full, so outputs must match."""
    import jax.numpy as jnp

    from colbert_tpu.retrieval.device_index import IVF_PAD

    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)
    assert int(np.asarray(s.device_index.ivf_lengths).max()) <= 1024
    Q = jnp.asarray(encoder.encode_queries([passages[7], passages[52]]))
    kw = dict(k=5, nprobe=4, ncandidates=64, max_candidates=256)
    p_sl, s_sl = s.device_index.search_Q_batch(Q, cell_cap=1024, **kw)
    p_ga, s_ga = s.device_index.search_Q_batch(Q, cell_cap=IVF_PAD + 1, **kw)
    np.testing.assert_array_equal(p_sl, p_ga)
    np.testing.assert_allclose(s_sl, s_ga, rtol=1e-5, atol=1e-5)
