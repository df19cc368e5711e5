"""Native C++ WordPiece must be output-identical to the Python tokenizer
(ASCII fast path; non-ASCII texts take the per-text Python fallback)."""

import numpy as np
import pytest

from colbert_tpu.tokenization.native import NativeWordPiece, load_library
from colbert_tpu.tokenization.wordpiece import WordPieceTokenizer
from colbert_tpu.utils.testing import make_vocab


@pytest.fixture(scope="module")
def pair():
    tok = WordPieceTokenizer(make_vocab())
    native = NativeWordPiece(tok)
    if not native.available:
        pytest.skip("native wordpiece library unavailable (no g++?)")
    return tok, native


def test_ascii_parity(pair, rng):
    tok, native = pair
    words = list(tok.vocab)[7:40]
    texts = []
    for _ in range(200):
        k = rng.integers(1, 20)
        texts.append(" ".join(rng.choice(words, size=k)))
    texts += [
        "The DOG runs, fast!",
        "hello...world",
        "  spaces   everywhere  ",
        "",
        "zzz unknownword dog",
        "a" * 150,  # exceeds max_chars_per_word -> UNK
        "dog!cat?bird.",
    ]
    got = native.encode_batch(texts)
    want = tok.encode_batch(texts)
    assert got == want


def test_non_ascii_fallback(pair):
    tok, native = pair
    texts = ["dog café cat", "普通 text", "dog cat"]
    got = native.encode_batch(texts)
    want = tok.encode_batch(texts)
    assert got == want  # fallback path must still match


def test_library_loads_once():
    lib1 = load_library()
    lib2 = load_library()
    assert lib1 is lib2


def test_native_faster_than_python(pair, rng):
    import time

    tok, native = pair
    words = list(tok.vocab)[7:40]
    texts = [" ".join(rng.choice(words, size=100)) for _ in range(512)]
    t = time.time()
    native.encode_batch(texts)
    t_native = time.time() - t
    t = time.time()
    tok.encode_batch(texts)
    t_python = time.time() - t
    # don't be strict in CI, just sanity: native shouldn't be slower
    assert t_native < t_python, (t_native, t_python)


def test_del_control_char_parity(pair):
    # DEL (0x7f) is a control char: HF BasicTokenizer strips it inside words
    tok, native = pair
    texts = ["hel\x7flo", "\x7fdog", "dog\x7f cat", "\x01\x02dog"]
    assert native.encode_batch(texts) == tok.encode_batch(texts)


def test_overflow_falls_back_not_truncates(pair):
    # texts longer than the native buffer must take the python fallback
    # (full token list), never be silently truncated
    tok, native = pair
    long_text = " ".join(["dog"] * (native.max_tokens + 50))
    got = native.encode_batch([long_text, "dog cat"])
    want = tok.encode_batch([long_text, "dog cat"])
    assert got == want
    assert len(got[0]) == native.max_tokens + 50
