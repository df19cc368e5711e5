"""Planner math + storage roundtrips (reference:
test/indexing/collection_indexer.jl:6-83, test/loaders_and_savers.jl)."""

import os

import numpy as np
import pytest

from colbert_tpu.indexing import planner
from colbert_tpu.storage import format as fmt


def test_sample_pids_bounds(rng):
    for n in [1, 10, 1000, 141_431]:
        pids = planner.sample_pids(n, rng)
        assert len(pids) <= n
        assert len(np.unique(pids)) == len(pids)
        assert pids.min() >= 0 and pids.max() < n
        expected = int(min(1 + np.floor(16 * np.sqrt(120 * n)), n))
        assert len(pids) == expected


def test_heldout_split_sizes(rng):
    sample = rng.standard_normal((1000, 8)).astype(np.float32)
    train, heldout = planner.heldout_split(sample, rng)
    assert len(heldout) == 50  # 5% of 1000
    assert len(train) == 950
    # rows are preserved (same multiset)
    both = np.vstack([train, heldout])
    assert np.allclose(np.sort(both.sum(1)), np.sort(sample.sum(1)), atol=1e-4)


def test_setup_plan_math():
    # reference collection_indexer.jl:38-83 formulas
    plan = planner.setup_plan(100_000, 120.0, 500_000, None, 1)
    assert plan["chunksize"] == 25_000
    assert plan["num_chunks"] == 4
    est = 100_000 * 120.0
    expected_partitions = int(2 ** np.floor(np.log2(16 * np.sqrt(est))))
    assert plan["num_partitions"] == expected_partitions
    # partitions capped by the clustering sample size
    plan2 = planner.setup_plan(100_000, 120.0, 1000, None, 1)
    assert plan2["num_partitions"] == 1000
    # explicit chunksize wins; nranks feeds the default
    plan3 = planner.setup_plan(100, 10.0, 100, 7, 1)
    assert plan3["chunksize"] == 7 and plan3["num_chunks"] == 15
    plan4 = planner.setup_plan(100_000, 10.0, 100, None, 8)
    assert plan4["chunksize"] == 1 + 100_000 // 8


def test_codec_roundtrip(tmp_path, rng):
    p = str(tmp_path)
    cent = rng.standard_normal((16, 8)).astype(np.float32)
    cut = np.asarray([0.1, 0.2, 0.3], np.float32)
    wts = np.asarray([0.05, 0.15, 0.25, 0.35], np.float32)
    fmt.save_codec(p, cent, cut, wts, 0.123)
    codec = fmt.load_codec(p)
    np.testing.assert_array_equal(codec["centroids"], cent)
    np.testing.assert_array_equal(codec["bucket_cutoffs"], cut)
    np.testing.assert_array_equal(codec["bucket_weights"], wts)
    assert codec["avg_residual"] == pytest.approx(0.123)


def test_chunk_roundtrip_and_resume(tmp_path, rng):
    p = str(tmp_path)
    codes = rng.integers(0, 100, 50).astype(np.uint32)
    residuals = rng.integers(0, 256, (50, 32)).astype(np.uint8)
    doclens = rng.integers(1, 10, 7).astype(np.int32)
    assert not fmt.chunk_is_complete(p, 0)
    fmt.save_chunk(p, 0, codes=codes, residuals=residuals, doclens=doclens, passage_offset=3)
    assert fmt.chunk_is_complete(p, 0)
    chunk = fmt.load_chunk(p, 0)
    np.testing.assert_array_equal(chunk["codes"], codes)
    np.testing.assert_array_equal(chunk["residuals"], residuals)
    np.testing.assert_array_equal(chunk["doclens"], doclens)
    assert chunk["metadata"] == {
        "passage_offset": 3, "num_passages": 7, "num_embeddings": 50,
    }


def test_check_all_files_saved(tmp_path, rng):
    # reference collection_indexer.jl:190-258 — delete files one at a time
    p = str(tmp_path)
    fmt.save_plan(p, {"num_chunks": 1})
    from colbert_tpu.config import ColBERTConfig

    ColBERTConfig().save(os.path.join(p, "config.json"))
    fmt.save_codec(p, np.zeros((2, 8), np.float32), np.zeros(3), np.zeros(4), 0.0)
    fmt.save_chunk(p, 0, codes=np.zeros(5, np.uint32),
                   residuals=np.zeros((5, 2), np.uint8),
                   doclens=np.ones(2, np.int32), passage_offset=0)
    fmt.save_ivf(p, np.arange(5), np.asarray([5]))
    assert fmt.check_all_files_saved(p) == []
    for name in ["centroids.npy", "0.codes.npy", "ivf.npy", "0.metadata.json"]:
        os.rename(os.path.join(p, name), os.path.join(p, name + ".bak"))
        assert fmt.check_all_files_saved(p) == [name]
        os.rename(os.path.join(p, name + ".bak"), os.path.join(p, name))


def test_load_all_concatenation(tmp_path, rng):
    p = str(tmp_path)
    fmt.save_plan(p, {"num_chunks": 3})
    all_codes, all_doclens = [], []
    for i in range(3):
        codes = rng.integers(0, 50, 10 + i).astype(np.uint32)
        doclens = rng.integers(1, 5, 4).astype(np.int32)
        fmt.save_chunk(p, i, codes=codes,
                       residuals=np.zeros((len(codes), 4), np.uint8),
                       doclens=doclens, passage_offset=4 * i)
        all_codes.append(codes)
        all_doclens.append(doclens)
    np.testing.assert_array_equal(fmt.load_all_codes(p), np.concatenate(all_codes))
    np.testing.assert_array_equal(fmt.load_all_doclens(p), np.concatenate(all_doclens))
    assert fmt.load_all_residuals(p).shape == (sum(len(c) for c in all_codes), 4)
    # sentinel pre-padding: one zeroed extra row, single materialized buffer
    n = sum(len(c) for c in all_codes)
    padded = fmt.load_all_codes(p, mmap=True, extra_rows=1)
    assert padded.shape == (n + 1,) and padded[-1] == 0
    np.testing.assert_array_equal(padded[:n], np.concatenate(all_codes))
    assert padded.flags.writeable and padded.flags.owndata
    res_padded = fmt.load_all_residuals(p, mmap=True, extra_rows=1)
    assert res_padded.shape == (n + 1, 4)
    np.testing.assert_array_equal(res_padded[-1], 0)


def test_num_partitions_override(tmp_path):
    """config.num_partitions overrides the planner formula (TPU serving
    knob; None keeps reference parity) and is clamped to the sample size."""
    from colbert_tpu.config import ColBERTConfig
    from colbert_tpu.indexing.builder import Indexer
    from colbert_tpu.storage import format as fmt
    from colbert_tpu.utils.testing import make_encoder, synthetic_collection

    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8,
        length_bucket=16, chunksize=32, nbits=2, kmeans_niters=2,
        num_partitions=64,
    )
    enc = make_encoder(dim=32, seed=0, config=cfg)
    path = str(tmp_path / "idx")
    Indexer(cfg, encoder=enc, collection=synthetic_collection(60, seed=3)).index(path)
    plan = fmt.load_plan(path)
    assert plan["num_partitions"] == 64
    codec = fmt.load_codec(path)
    assert codec["centroids"].shape[0] == 64
