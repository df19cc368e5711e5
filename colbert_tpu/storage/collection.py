"""Collection: zero-copy passage storage feeding the native tokenizer.

The reference loads collections as an in-memory vector of strings
(reference: src/indexing.jl:28-29 ``readlines``). At production scale the
host-side cost of a build is dominated by per-passage string churn, so this
Collection keeps the file bytes mmap'd and only materializes:

  - (start, end) byte offsets per passage, found with vectorized numpy
    scans (newlines/tabs located at memory bandwidth, no Python line loop),
  - per-batch contiguous UTF-8 blobs handed straight to the C++ WordPiece
    tokenizer (no str decode/encode round-trip on the hot path).

``Collection`` quacks like the ``list[str]`` the rest of the code expects
(`len`, indexing -> str, slicing -> sub-Collection), so every consumer keeps
working; the native tokenizer detects it and takes the blob fast path.

TSV files use the LoTTe/MS MARCO convention ``pid\\ttext[\\t...]``; other
files are one passage per line.
"""

from __future__ import annotations

import mmap
from typing import Iterator, Sequence, Union

import numpy as np

__all__ = ["Collection"]


class Collection:
    """Byte-backed passage collection with list[str]-compatible access."""

    def __init__(self, data: bytes | mmap.mmap, starts: np.ndarray, ends: np.ndarray):
        self._data = data
        self._view = memoryview(data)
        self.starts = starts
        self.ends = ends

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_file(cls, path: str) -> "Collection":
        with open(path, "rb") as f:
            try:
                data = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            except ValueError:  # empty file
                data = b""
        buf = np.frombuffer(data, dtype=np.uint8)
        if buf.size == 0:
            e = np.zeros((0,), np.int64)
            return cls(data, e, e)
        nl = np.flatnonzero(buf == 0x0A)
        line_starts = np.concatenate([[0], nl + 1]).astype(np.int64)
        line_ends = np.concatenate([nl, [buf.size]]).astype(np.int64)
        # drop trailing empty line(s)
        keep = line_ends > line_starts
        line_starts, line_ends = line_starts[keep], line_ends[keep]
        if str(path).endswith(".tsv"):
            # text = second tab-separated field: first tab after line start
            # to the next tab (or line end)
            tabs = np.flatnonzero(buf == 0x09).astype(np.int64)
            pos = np.searchsorted(tabs, line_starts)
            bad = pos >= len(tabs)
            t1 = tabs[np.minimum(pos, max(len(tabs) - 1, 0))] if len(tabs) else line_ends
            bad |= t1 >= line_ends  # line has no tab of its own
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                raise ValueError(
                    f"{path}: line {i} has no tab — not 'pid\\ttext' TSV "
                    f"(line starts with "
                    f"{bytes(buf[line_starts[i]:line_starts[i]+40]).decode('utf-8', 'replace')!r})"
                )
            next_pos = np.searchsorted(tabs, t1 + 1)
            t2 = np.where(
                (next_pos < len(tabs)) & (tabs[np.minimum(next_pos, len(tabs) - 1)] < line_ends),
                tabs[np.minimum(next_pos, len(tabs) - 1)],
                line_ends,
            )
            starts, ends = t1 + 1, np.minimum(t2, line_ends)
        else:
            starts, ends = line_starts, line_ends
        return cls(data, starts, ends)

    @classmethod
    def from_list(cls, passages: Sequence[str]) -> "Collection":
        encoded = [p.encode("utf-8") for p in passages]
        lens = np.asarray([len(e) for e in encoded], np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        return cls(b"".join(encoded), starts, ends)

    # -- list[str] compatibility ---------------------------------------------

    def __len__(self) -> int:
        return len(self.starts)

    def __getitem__(self, i: Union[int, slice]):
        if isinstance(i, slice):
            return Collection(self._data, self.starts[i], self.ends[i])
        return bytes(self._view[self.starts[i]:self.ends[i]]).decode(
            "utf-8", errors="replace"
        )

    def __iter__(self) -> Iterator[str]:
        for i in range(len(self)):
            yield self[i]

    def __eq__(self, other) -> bool:
        if isinstance(other, Collection):
            return (
                len(self) == len(other)
                and bool(np.all(self.ends - self.starts == other.ends - other.starts))
                and list(self) == list(other)
            )
        if isinstance(other, (list, tuple)):
            return len(self) == len(other) and list(self) == list(other)
        return NotImplemented

    def take(self, indices) -> "Collection":
        """Sub-collection at the given passage indices (fancy indexing)."""
        idx = np.asarray(indices, np.int64)
        return Collection(self._data, self.starts[idx], self.ends[idx])

    # -- native fast path ----------------------------------------------------

    def batch_blob(self, indices: np.ndarray | None = None) -> tuple[bytes, np.ndarray]:
        """-> (contiguous UTF-8 blob, (n+1,) offsets) for the given passages
        (all, if None) — the exact input layout of the C++ tokenizer.

        Boundaries are converted to plain ints up front (slicing with numpy
        scalars is ~20x slower than with ints); the join itself runs at
        memcpy speed."""
        if indices is None:
            starts, ends = self.starts, self.ends
        else:
            starts, ends = self.starts[indices], self.ends[indices]
        lens = (ends - starts).astype(np.int64)
        offsets = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        sl, el = starts.tolist(), ends.tolist()
        blob = b"".join([self._view[s:e] for s, e in zip(sl, el)])
        return blob, offsets
