"""Tokenization tests — marker insertion, [MASK] augmentation, skiplist
(reference: test/modelling/tokenization/tokenizer_utils.jl and SURVEY §2 L3)."""

import numpy as np
import pytest

from colbert_tpu.tokenization.tensorize import (
    build_skiplist,
    tensorize_docs,
    tensorize_queries,
)
from colbert_tpu.tokenization.wordpiece import WordPieceTokenizer

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[unused0]", "[unused1]"]
WORDS = ["the", "dog", "run", "##ning", "##s", "cat", "fast", "!", ",", ".", "a", "un", "##known"]


@pytest.fixture
def tok():
    vocab = {t: i for i, t in enumerate(SPECIALS + WORDS)}
    return WordPieceTokenizer(vocab)


def test_wordpiece_greedy_longest_match(tok):
    assert tok.tokenize("running") == ["run", "##ning"]
    assert tok.tokenize("runs") == ["run", "##s"]
    assert tok.tokenize("dog!") == ["dog", "!"]
    assert tok.tokenize("The DOG") == ["the", "dog"]  # lowercase
    assert tok.tokenize("zzz") == ["[UNK]"]


def test_punctuation_split_and_unknown(tok):
    assert tok.tokenize("dog,cat.") == ["dog", ",", "cat", "."]
    # partial wordpiece failure -> whole word is UNK
    assert tok.tokenize("dogzzz") == ["[UNK]"]


def test_tensorize_docs_markers_and_bucketing(tok):
    d_id = tok.vocab["[unused1]"]
    ids, mask = tensorize_docs(
        ["the dog", "a cat runs fast"], tok, doc_token_id=d_id, doc_maxlen=20,
        length_bucket=8,
    )
    assert ids.shape == (2, 8)  # bucketed up to multiple of 8
    # [CLS] [D] ... [SEP]
    assert (ids[:, 0] == tok.cls_id).all()
    assert (ids[:, 1] == d_id).all()
    row0 = [tok.cls_id, d_id, tok.vocab["the"], tok.vocab["dog"], tok.sep_id]
    np.testing.assert_array_equal(ids[0, :5], row0)
    assert mask[0].sum() == 5
    assert (ids[0, 5:] == tok.pad_id).all()


def test_tensorize_docs_truncation(tok):
    d_id = tok.vocab["[unused1]"]
    long = " ".join(["dog"] * 50)
    ids, mask = tensorize_docs([long], tok, doc_token_id=d_id, doc_maxlen=10)
    assert ids.shape[1] <= 10
    assert mask[0].sum() == 10  # fully used: CLS D 7xdog SEP
    assert ids[0, -1] == tok.sep_id


def test_tensorize_queries_mask_augmentation(tok):
    q_id = tok.vocab["[unused0]"]
    ids, mask = tensorize_queries(
        ["the dog"], tok, query_token_id=q_id, query_maxlen=12
    )
    assert ids.shape == (1, 12)
    np.testing.assert_array_equal(
        ids[0, :5], [tok.cls_id, q_id, tok.vocab["the"], tok.vocab["dog"], tok.sep_id]
    )
    # PAD -> MASK augmentation: no pads remain
    assert (ids[0, 5:] == tok.mask_id).all()
    assert mask[0].sum() == 5  # attention still covers only real tokens
    # attend_to_mask_tokens flips the mask to all ones
    _, m2 = tensorize_queries(
        ["the dog"], tok, query_token_id=q_id, query_maxlen=12,
        attend_to_mask_tokens=True,
    )
    assert m2.all()


def test_query_truncation_fixed_len(tok):
    q_id = tok.vocab["[unused0]"]
    ids, mask = tensorize_queries(
        [" ".join(["dog"] * 40)], tok, query_token_id=q_id, query_maxlen=8
    )
    assert ids.shape == (1, 8)
    assert mask[0].all()


def test_build_skiplist(tok):
    skip = build_skiplist(tok)
    assert tok.pad_id in skip
    for ch in "!,.":
        assert tok.vocab[ch] in skip
    # punctuation absent from vocab simply isn't included
    assert all(isinstance(i, int) for i in skip)
    no_punct = build_skiplist(tok, mask_punctuation=False)
    assert no_punct == [tok.pad_id]
