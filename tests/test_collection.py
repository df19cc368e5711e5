"""Byte-backed Collection: parity with list[str] semantics and the native
tokenizer's zero-decode blob path."""

import numpy as np
import pytest

from colbert_tpu.indexing.builder import load_collection
from colbert_tpu.storage.collection import Collection


def test_from_file_tsv_and_lines(tmp_path):
    p = tmp_path / "coll.tsv"
    p.write_text("1\tfirst passage\n2\tsecond passage\ttitle here\n3\tthird\n")
    c = load_collection(str(p))
    assert isinstance(c, Collection)
    assert c == ["first passage", "second passage", "third"]

    p2 = tmp_path / "coll.txt"
    p2.write_text("line one\nline two\n")
    assert load_collection(str(p2)) == ["line one", "line two"]
    assert load_collection(["a", "b"]) == ["a", "b"]


def test_slice_take_iter(tmp_path):
    c = Collection.from_list([f"passage number {i}" for i in range(20)])
    assert len(c) == 20
    assert c[3] == "passage number 3"
    sub = c[5:9]
    assert isinstance(sub, Collection)
    assert sub == [f"passage number {i}" for i in range(5, 9)]
    taken = c.take(np.asarray([7, 2, 19]))
    assert list(taken) == ["passage number 7", "passage number 2",
                           "passage number 19"]


def test_batch_blob_layout():
    texts = ["abc", "", "de", "fgh"]
    c = Collection.from_list(texts)
    blob, offsets = c.batch_blob()
    assert blob == b"abcdefgh"
    assert offsets.tolist() == [0, 3, 3, 5, 8]
    blob2, off2 = c.batch_blob(np.asarray([3, 0]))
    assert blob2 == b"fghabc"
    assert off2.tolist() == [0, 3, 6]


def test_native_tokenizer_collection_parity(tmp_path):
    from colbert_tpu.tokenization.native import NativeWordPiece
    from colbert_tpu.tokenization.wordpiece import WordPieceTokenizer
    from colbert_tpu.utils.testing import make_vocab

    tok = WordPieceTokenizer(make_vocab())
    native = NativeWordPiece(tok)
    if not native.available:
        pytest.skip("native wordpiece unavailable")
    words = list(tok.vocab)[7:30]
    rng = np.random.default_rng(3)
    texts = [" ".join(rng.choice(words, size=int(rng.integers(1, 15))))
             for _ in range(50)]
    texts.append("café unicode fallback")  # per-text python fallback
    c = Collection.from_list(texts)
    assert native.encode_batch(c) == tok.encode_batch(texts)


def test_build_from_file_matches_list(tmp_path):
    from colbert_tpu.config import ColBERTConfig
    from colbert_tpu.indexing.builder import Indexer
    from colbert_tpu.storage import format as fmt
    from colbert_tpu.utils.testing import make_encoder, synthetic_collection

    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8, length_bucket=16,
        chunksize=16, nbits=2, kmeans_niters=4, mesh_data_axis=1,
    )
    passages = synthetic_collection(32, seed=4)
    tsv = tmp_path / "c.tsv"
    tsv.write_text("".join(f"{i}\t{p}\n" for i, p in enumerate(passages)))

    enc1 = make_encoder(dim=32, seed=0, config=cfg)
    p_list = str(tmp_path / "idx_list")
    Indexer(cfg, encoder=enc1, collection=passages).index(p_list)
    enc2 = make_encoder(dim=32, seed=0, config=cfg)
    p_file = str(tmp_path / "idx_file")
    Indexer(cfg, encoder=enc2, collection=str(tsv)).index(p_file)

    np.testing.assert_array_equal(
        fmt.load_all_codes(p_list), fmt.load_all_codes(p_file)
    )
    np.testing.assert_array_equal(
        fmt.load_all_doclens(p_list), fmt.load_all_doclens(p_file)
    )
