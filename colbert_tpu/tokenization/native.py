"""ctypes bridge to the native WordPiece tokenizer (native/wordpiece.cpp).

Builds the shared library on first use with g++ (cached under
``native/build/``); everything degrades gracefully to the pure-Python
tokenizer if the toolchain or the .so is unavailable. Texts containing
non-ASCII bytes are delegated back to the Python path per-text, so outputs
are always identical to :class:`WordPieceTokenizer`.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["NativeWordPiece", "load_library"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "wordpiece.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libwordpiece.so")

_lib = None
_lib_lock = threading.Lock()


def load_library() -> ctypes.CDLL | None:
    """Compile (once) and load the shared library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SRC):
            return None
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                # temp + atomic rename: concurrent ranks never dlopen a
                # half-written library
                tmp = f"{_SO}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                     _SRC, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("native wordpiece unavailable: %s", e)
            return None
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32]
        lib.wp_encode_batch.restype = None
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.wp_destroy.restype = None
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeWordPiece:
    """Batch encoder backed by the C++ library, with Python-parity fallback."""

    def __init__(self, tokenizer, *, n_threads: int | None = None,
                 max_tokens_per_text: int = 512) -> None:
        self.tokenizer = tokenizer
        self.lib = load_library()
        self.max_tokens = max_tokens_per_text
        self.n_threads = n_threads or min(16, os.cpu_count() or 1)
        self.handle = None
        if self.lib is not None:
            # id = line number: rebuild the ordered token list
            items = sorted(tokenizer.vocab.items(), key=lambda kv: kv[1])
            blob = "\n".join(t for t, _ in items).encode("utf-8")
            self.handle = ctypes.c_void_p(self.lib.wp_create(
                blob, len(items), tokenizer.unk_id, tokenizer.max_chars_per_word
            ))

    @property
    def available(self) -> bool:
        return self.handle is not None

    def encode_batch(self, texts) -> list[list[int]]:
        """Tokenize a list[str] OR a byte-backed ``Collection`` (the latter
        skips the per-text str decode/encode round-trip entirely — bytes go
        from the mmap'd file straight into the C++ tokenizer)."""
        from colbert_tpu.storage.collection import Collection

        if not self.available or not len(texts):
            return self.tokenizer.encode_batch(
                list(texts) if isinstance(texts, Collection) else texts
            )
        if not isinstance(texts, Collection):
            texts = Collection.from_list(texts)
        blob, offsets = texts.batch_blob()
        out_ids = np.empty((len(texts), self.max_tokens), np.int32)
        out_lens = np.empty(len(texts), np.int32)
        self.lib.wp_encode_batch(
            self.handle, blob, offsets, len(texts),
            1 if self.tokenizer.do_lower_case else 0,
            out_ids.reshape(-1), out_lens, self.max_tokens, self.n_threads,
        )
        # out_lens < 0: per-text python fallback (-1 non-ASCII, -2 overflow —
        # the native path never silently truncates)
        result: list[list[int]] = []
        fallback_idx = [i for i in range(len(texts)) if out_lens[i] < 0]
        fallback = {
            i: self.tokenizer.encode(texts[i]) for i in fallback_idx
        }
        for i in range(len(texts)):
            if out_lens[i] < 0:
                result.append(fallback[i])
            else:
                result.append(out_ids[i, : out_lens[i]].tolist())
        return result

    def __del__(self):
        if getattr(self, "handle", None) and self.lib is not None:
            try:
                self.lib.wp_destroy(self.handle)
            except Exception:
                pass
