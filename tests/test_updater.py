"""IndexUpdater: incremental add/remove must behave like a (codec-frozen)
rebuild — added passages retrievable, removed pids never surfaced, untouched
pids unchanged — across all three searcher backends.

No reference equivalent (index updates are on the reference's roadmap,
README.md:179-190); contract mirrors the Python ColBERT IndexUpdater.
"""

import numpy as np
import pytest

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.indexing.builder import Indexer
from colbert_tpu.indexing.updater import (
    IndexUpdater,
    build_ivf_excluding,
    deleted_eids_from_pids,
)
from colbert_tpu.retrieval.searcher import Searcher
from colbert_tpu.storage import format as fmt
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


@pytest.fixture()
def built(tmp_path):
    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=24, nbits=2, kmeans_niters=5, nprobe=4,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg)
    passages = synthetic_collection(48, seed=2)
    path = str(tmp_path / "idx")
    Indexer(cfg, encoder=encoder, collection=passages).index(path)
    return cfg, encoder, passages, path


def test_ivf_excluding_unit(rng):
    codes = rng.integers(0, 8, 40).astype(np.uint32)
    doclens = np.full(10, 4, np.int64)
    eids = deleted_eids_from_pids(np.asarray([2, 7]), doclens)
    np.testing.assert_array_equal(eids, np.r_[8:12, 28:32])
    ivf, lengths = build_ivf_excluding(codes, 8, eids)
    assert lengths.sum() == 32  # 8 rows excluded
    kept = ivf[: lengths.sum()]
    assert not np.isin(kept, eids).any()
    # grouped by cell in order
    cells = codes[kept]
    offs = np.concatenate([[0], np.cumsum(lengths)])
    for c in range(8):
        assert (cells[offs[c]:offs[c + 1]] == c).all()


def test_native_ivf_matches_numpy(rng):
    """The C++ counting sort must be bit-identical to np.argsort(stable) —
    grouping, within-cell order, tombstone tail, and lengths."""
    from colbert_tpu.indexing.native_ivf import build_ivf_native

    k = 37
    codes = rng.integers(0, k, 5000).astype(np.uint32)
    codes[rng.choice(5000, 200, replace=False)] = k  # tombstone overflow cell
    native = build_ivf_native(codes, k)
    if native is None:
        pytest.skip("native toolchain unavailable")
    ivf_n, len_n = native
    codes64 = codes.astype(np.int64)
    ivf_np = np.argsort(codes64, kind="stable").astype(np.int32)
    len_np = np.bincount(codes64, minlength=k + 1)[:k].astype(np.int32)
    np.testing.assert_array_equal(ivf_n, ivf_np)
    np.testing.assert_array_equal(len_n, len_np)
    # empty + all-overflow edge cases
    e_ivf, e_len = build_ivf_native(np.zeros(0, np.uint32), 4)
    assert e_ivf.shape == (0,) and (e_len == 0).all()
    o_ivf, o_len = build_ivf_native(np.full(10, 9, np.uint32), 4)
    np.testing.assert_array_equal(o_ivf, np.arange(10))
    assert (o_len == 0).all()


def test_add_passages_searchable(built):
    cfg, encoder, passages, path = built
    extra = synthetic_collection(7, seed=9)
    new_pids = IndexUpdater(path, encoder).add(extra)
    np.testing.assert_array_equal(new_pids, np.arange(48, 55))

    plan = fmt.load_plan(path)
    assert plan["num_documents"] == 55
    assert fmt.check_all_files_saved(path) == []

    s = Searcher(path, encoder=encoder)
    # each added passage is its own best match
    pids, _ = s.search_batch(extra, k=3)
    np.testing.assert_array_equal(pids[:, 0], new_pids)
    # original passages still retrieve themselves
    pids_old, _ = s.search_batch([passages[3], passages[40]], k=3)
    assert pids_old[0][0] == 3 and pids_old[1][0] == 40


def test_large_add_splits_into_chunks(built):
    """Additions bigger than the plan's chunksize split into uniform chunks
    (like the builder), keeping streaming loads and resume logic uniform."""
    cfg, encoder, passages, path = built
    plan0 = fmt.load_plan(path)
    assert plan0["chunksize"] == 24
    extra = synthetic_collection(60, seed=13)  # 60 > 2 x 24 -> 3 new chunks
    new_pids = IndexUpdater(path, encoder).add(extra)
    plan1 = fmt.load_plan(path)
    assert plan1["num_chunks"] == plan0["num_chunks"] + 3
    assert plan1["num_documents"] == plan0["num_documents"] + 60
    assert fmt.check_all_files_saved(path) == []
    assert plan1["num_embeddings"] == int(fmt.load_all_doclens(path).sum())
    s = Searcher(path, encoder=encoder)
    pids, _ = s.search_batch([extra[0], extra[30], extra[59]], k=3)
    np.testing.assert_array_equal(pids[:, 0], new_pids[[0, 30, 59]])


def test_add_does_not_perturb_existing_scores(built):
    cfg, encoder, passages, path = built
    s_before = Searcher(path, encoder=encoder)
    q = [passages[5], passages[20]]
    p0, s0 = s_before.search_batch(q, k=5)
    IndexUpdater(path, encoder).add(["completely different words entirely"])
    s_after = Searcher(path, encoder=encoder)
    p1, s1 = s_after.search_batch(q, k=5)
    # codec frozen + append-only pids: existing pids keep their exact scores
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backend", ["device", "host", "sharded"])
def test_remove_pids_never_surfaced(built, backend):
    cfg, encoder, passages, path = built
    victims = [5, 17, 40]
    IndexUpdater(path, encoder).remove(victims)
    s = Searcher(path, encoder=encoder, backend=backend)
    # search FOR the removed passages: they must not come back
    pids, _ = s.search_batch([passages[v] for v in victims], k=10)
    assert not np.isin(pids, victims).any()
    # unrelated passages still self-retrieve
    pids_ok, _ = s.search_batch([passages[2], passages[30]], k=3)
    assert pids_ok[0][0] == 2 and pids_ok[1][0] == 30


def test_remove_validates_and_merges(built):
    cfg, encoder, passages, path = built
    up = IndexUpdater(path, encoder)
    with pytest.raises(ValueError):
        up.remove([999])
    up.remove([1])
    up.remove([2, 1])  # idempotent merge
    np.testing.assert_array_equal(fmt.load_deleted(path), [1, 2])


def test_compact_drops_rows_and_renumbers(built):
    cfg, encoder, passages, path = built
    up = IndexUpdater(path, encoder)
    victims = [0, 17, 47]
    up.remove(victims)
    s_before = Searcher(path, encoder=encoder)
    survivors = [i for i in range(48) if i not in victims]
    q = [passages[3], passages[30]]
    p_before, sc_before = s_before.search_batch(q, k=5)

    pid_map = up.compact()
    assert (pid_map[victims] == -1).all()
    np.testing.assert_array_equal(pid_map[survivors], np.arange(45))
    assert len(fmt.load_deleted(path)) == 0
    plan = fmt.load_plan(path)
    assert plan["num_documents"] == 45
    assert fmt.check_all_files_saved(path) == []
    # total embeddings shrank by exactly the victims' doclens
    assert plan["num_embeddings"] == int(fmt.load_all_doclens(path).sum())

    s = Searcher(path, encoder=encoder)
    p_after, sc_after = s.search_batch(q, k=5)
    # same results modulo the renumbering
    np.testing.assert_array_equal(
        p_after, np.where(p_before >= 0, pid_map[p_before], -1)
    )
    np.testing.assert_allclose(sc_after, sc_before, rtol=1e-5, atol=1e-5)
    # compaction is idempotent when nothing is tombstoned
    pid_map2 = up.compact()
    np.testing.assert_array_equal(pid_map2, np.arange(45))


def test_compact_crash_mid_publish_recovers(built, monkeypatch):
    """A crash during compact()'s publish — after the commit journal, with
    only SOME chunks renamed and the old plan/tombstones still on disk —
    must be refused by Searcher and fully repaired by
    finish_pending_compact() (results equal a clean compact)."""
    import os

    cfg, encoder, passages, path = built
    up = IndexUpdater(path, encoder)
    victims = [1, 5, 25, 40]
    up.remove(victims)
    q = [passages[3], passages[30]]
    p_before, sc_before = Searcher(path, encoder=encoder).search_batch(q, k=5)

    # crash simulation: the journal is written, then the publish replay
    # dies after renaming only chunk 0's files
    def dying_replay(self):
        tmp_dir = os.path.join(path, "compact_tmp")
        for name in fmt.chunk_file_names(0):
            os.replace(os.path.join(tmp_dir, name), os.path.join(path, name))
        raise RuntimeError("simulated crash mid-publish")

    monkeypatch.setattr(IndexUpdater, "_replay_compact_journal", dying_replay)
    with pytest.raises(RuntimeError, match="simulated crash"):
        up.compact()
    monkeypatch.undo()

    # torn state: renumbered chunk 0 next to old chunks, old plan, old
    # tombstones, journal present — Searcher must refuse to serve it
    assert os.path.exists(os.path.join(path, IndexUpdater.COMPACT_JOURNAL))
    with pytest.raises(RuntimeError, match="interrupted mid-commit"):
        Searcher(path, encoder=encoder)

    # repair (a fresh process rerunning compact() would hit the same path
    # via the finish_pending_compact() call at its entry)
    up2 = IndexUpdater(path, encoder)
    assert up2.finish_pending_compact() is True
    assert not os.path.exists(os.path.join(path, IndexUpdater.COMPACT_JOURNAL))
    assert fmt.check_all_files_saved(path) == []
    assert len(fmt.load_deleted(path)) == 0
    plan = fmt.load_plan(path)
    assert plan["num_documents"] == 44
    assert plan["num_embeddings"] == int(fmt.load_all_doclens(path).sum())
    # replay is a no-op once finished
    assert up2.finish_pending_compact() is False

    pid_map = np.full(48, -1, np.int64)
    keep = np.setdiff1d(np.arange(48), victims)
    pid_map[keep] = np.arange(44)
    s = Searcher(path, encoder=encoder)
    p_after, sc_after = s.search_batch(q, k=5)
    np.testing.assert_array_equal(
        p_after, np.where(p_before >= 0, pid_map[p_before], -1)
    )
    np.testing.assert_allclose(sc_after, sc_before, rtol=1e-5, atol=1e-5)


def test_torn_update_detected(built, caplog):
    """A crash between the updater's plan write and IVF rebuild leaves a
    stale IVF; Searcher must warn (embeddings exist that no probe reaches)."""
    import logging
    import shutil

    cfg, encoder, passages, path = built
    shutil.copy(f"{path}/ivf.npy", f"{path}/ivf.stale.npy")
    shutil.copy(f"{path}/ivf_lengths.npy", f"{path}/ivf_lengths.stale.npy")
    IndexUpdater(path, encoder).add(["science history cooking travel"])
    # simulate the torn state: plan + chunk written, IVF rebuild "lost"
    shutil.move(f"{path}/ivf.stale.npy", f"{path}/ivf.npy")
    shutil.move(f"{path}/ivf_lengths.stale.npy", f"{path}/ivf_lengths.npy")
    with caplog.at_level(logging.WARNING):
        Searcher(path, encoder=encoder)
    assert any("torn mid-update" in r.message for r in caplog.records)
    # repair: any updater op rebuilds the IVF
    IndexUpdater(path, encoder).remove([0])
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        s = Searcher(path, encoder=encoder)
    assert not any("torn mid-update" in r.message for r in caplog.records)


def test_searcher_reload_sees_updates(built):
    cfg, encoder, passages, path = built
    s = Searcher(path, encoder=encoder)
    n0 = len(s.doclens)
    fresh = "science history cooking travel music mountain"
    new_pids = IndexUpdater(path, encoder).add([fresh])
    assert len(s.doclens) == n0  # the live snapshot is untouched
    s2 = s.reload()
    assert s2.encoder is s.encoder  # shared programs
    assert len(s2.doclens) == n0 + 1
    p, _ = s2.search(fresh, k=2)
    assert p[0] == new_pids[0]


def test_add_then_remove_roundtrip(built):
    cfg, encoder, passages, path = built
    up = IndexUpdater(path, encoder)
    extra = synthetic_collection(5, seed=11)
    new_pids = up.add(extra)
    up.remove(new_pids[:2])
    s = Searcher(path, encoder=encoder)
    pids, _ = s.search_batch(extra, k=3)
    # removed adds are gone, surviving adds still self-retrieve
    assert not np.isin(pids, new_pids[:2]).any()
    np.testing.assert_array_equal(pids[2:, 0], new_pids[2:])
