"""Device-resident index + single-program search.

The reference's search path bounces between GPU and CPU five times per query
(SURVEY §3.4: CPU top-k, CPU IVF gather, CPU decompress, GPU maxsim, CPU
sort). On a TPU the device<->host link and per-program dispatch are the
scarce resources, so the entire index lives in HBM and a *batch* of queries
is ONE jitted program — query BERT encode included:

    tokenize (host) -> [one program: BERT query encode -> FLAT batched
    probe-table scores (balanced IVF: oversized cells split into
    duplicated-centroid sub-cells; one (B*Lq, K') MXU matmul, never under
    the per-query vmap) -> top-nprobe cells (+ PLAID cell-score pruning) ->
    per-cell contiguous IVF slice reads -> on-device pid dedup fused with
    gather-free stage-1 ranking (score-descending composite sort, per-pid
    cumsum-diff sums of per-query-token probed-entry maxima, midpoint of
    the WARP/XTR imputation bounds) -> optional 4x-wide full-centroid
    refine -> top-ncandidates -> chunked pallas fused decompress + MaxSim
    over per-candidate contiguous token slices -> final top-k]
    -> (B, k) pids + scores back to host

All shapes are static (``nprobe``, per-cell cap, dedup capacity, stage-2
``ncandidates``, padded doc length, ``k``), so the pipeline compiles once
per index geometry.

HBM cost (measured, SCALE.md): ~5.24 GB per 1M passages at dim=128 nbits=2
(codes 4B + residuals 32B + pid-valued IVF 4B per token, plus probe tables).
An 8.8M-passage MS MARCO index is therefore ~46 GB — beyond one 16 GB v5e;
serve it with ``Searcher(backend="sharded")`` over a 3-4+ chip mesh
(:mod:`colbert_tpu.parallel.sharded_index` splits cells round-robin and
merges per-shard top-k).
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.ops import codec as codec_ops

logger = logging.getLogger(__name__)

__all__ = ["DeviceIndex", "PendingSearch"]

NEG = -1e30


@dataclass
class PendingSearch:
    """An in-flight fused search program's live device arrays (see
    :meth:`DeviceIndex.search_tokens_batch_async`); ``DeviceIndex.finalize``
    blocks on them and postprocesses."""

    pids: jax.Array
    scores: jax.Array
    overflow: jax.Array
    k: int


MAX_CELL_DUP = 4  # sub-cells per oversized cell (see balance_cells)

# Tail padding (entries) on the device IVF array. Stage-2's candidate reads
# are contiguous runs, and so are the IVF cell reads: expressing them as
# vmapped ``dynamic_slice`` (one (cell_cap,) slice per probed cell) instead
# of element gathers lets XLA emit contiguous HBM reads — measured on v5e at
# 1M geometry: 256 ms -> 81 ms per 64-query batch. The slice window is
# ``cell_cap`` wide regardless of the cell's true length, so the array needs
# a tail pad >= cell_cap; searches with cell_cap > IVF_PAD fall back to the
# gather formulation.
IVF_PAD = 4096


def balance_cells(
    ivf_lengths: np.ndarray, orig_offsets: np.ndarray, balance_cap: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Split cells larger than ``balance_cap`` into at most ``MAX_CELL_DUP``
    sub-cells -> (sub_lengths int32, sub_offsets int32, split_origin int32,
    dup_max). Sub-cell offsets derive from ORIGIN offsets so truncated tails
    never shift later cells' segments. Used by both the single-device and
    the sharded index builders."""
    ivf_lengths = np.asarray(ivf_lengths, np.int64)
    nsub = np.clip(-(-ivf_lengths // balance_cap), 1, MAX_CELL_DUP)
    dropped = int(np.maximum(ivf_lengths - nsub * balance_cap, 0).sum())
    if dropped:
        logger.warning(
            "balanced IVF truncates %d entries beyond %d sub-cells of %d "
            "(raise ivf_balance_cap to keep them)",
            dropped, MAX_CELL_DUP, balance_cap,
        )
    split_origin = np.repeat(np.arange(len(ivf_lengths), dtype=np.int32), nsub)
    starts = np.concatenate([[0], np.cumsum(nsub)[:-1]])
    within = np.arange(int(nsub.sum())) - np.repeat(starts, nsub)
    sub_lengths = np.clip(
        np.repeat(ivf_lengths, nsub) - within * balance_cap, 0, balance_cap
    ).astype(np.int32)
    sub_offsets = (
        np.repeat(np.asarray(orig_offsets), nsub) + within * balance_cap
    ).astype(np.int32)
    return sub_lengths, sub_offsets, split_origin, int(nsub.max())


def split_mass_fraction(ivf_lengths: np.ndarray, balance_cap: int) -> float:
    """Fraction of PROBEABLE entries (post-truncation) living in cells that
    balance_cells() will split. This is the exposure term the probe-dup
    compensation scales with: duplicates can only crowd distinct cells out
    of the top-``nprobe`` for queries whose best cells are split ones."""
    ivf_lengths = np.asarray(ivf_lengths, np.int64)
    probeable = np.minimum(ivf_lengths, MAX_CELL_DUP * balance_cap)
    total = int(probeable.sum())
    if not total:
        return 0.0
    return float(probeable[ivf_lengths > balance_cap].sum() / total)


def probe_compensation(dup_max: int, split_mass: float,
                       *, saturate: float = 0.05) -> int:
    """Extra probe slots a searcher adds so balanced-IVF duplicates of split
    cells don't crowd distinct cells out of the top-``nprobe``.

    The worst case needs ``dup_max - 1`` extra slots (a query whose best
    cell split ``dup_max``-way), but charging EVERY query for it is wrong
    when little splits. Measured on v5e at 141k with 4x-finer partitions
    (split cells = 1.2% of probeable mass, mostly 2-way): recall@10 is flat
    across nprobe 2..5 (score-recall 0.594/0.613/0.637/0.625, within noise)
    while quality-first QPS falls 36.5 -> 28.7 — the old fixed
    ``dup_max - 1`` rule paid 21% QPS for nothing. Scale the compensation
    by the split-cell mass fraction, saturating at ``saturate``: topical
    queries concentrate on exactly the oversized cells, so >=5% of the
    corpus in split cells warrants the full worst-case compensation (the
    heavy-split regimes every committed recall number was measured in keep
    their exact probe count; the 1.2% geometry gets 1 extra probe — its
    measured recall knee).

    Second-geometry calibration (round 5, SCALE.md): at 141k TRAINED
    (dup_max=4, split_mass=0.265) the measured knee is ALSO extra=1
    (score@10 1.000 from extra=1 on; @100 0.992 vs 0.994 at extra=3) while
    this formula charges the full extra=3 (~11% QPS). The full compensation
    buys only depth tail there — i.e. above the knee the formula is a
    depth@100 knob, not a recall@10 one. The default stays recall-maximal
    (quality-first is the audited lossless point); per-corpus,
    ``config.probe_comp_saturation`` (or the autotuner, which sweeps real
    operating points) recovers the QPS."""
    if dup_max <= 1 or split_mass <= 0.0:
        return 0
    return min(dup_max - 1,
               max(0, round((dup_max - 1) * min(1.0, split_mass / saturate))))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(buf: jax.Array, rows: jax.Array, offset: jax.Array) -> jax.Array:
    """Donated in-place row write into a preallocated device buffer (no
    concatenation transient; compiles once per chunk shape)."""
    start = (offset,) + (jnp.int32(0),) * (rows.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, rows, start)


def _stream_chunks_to_device(index_path: str, N: int, nbytes: int,
                             *, pad_rows: int, prefetch: int = 4):
    """Upload codes/residual chunks mmap -> HBM without ever holding the
    packed index in host RAM (buffers are preallocated with ``pad_rows``
    zeroed tail rows at N — the stage-2 per-candidate ``dynamic_slice``
    reads a fixed ``max_doclen`` window from each passage's offset, so the
    last passage's window must stay in bounds). The residual buffer is
    FLAT 1-D word-typed ((N+pad_rows)*nwords): see
    :class:`DeviceIndex.residuals`.

    Uploads are PIPELINED: ``prefetch`` worker threads stage chunks (disk
    page-in + contiguous copy) and issue their ``device_put`` concurrently,
    while the main thread drains completed transfers into the donated
    buffers in chunk order. The serial path paid disk + host-copy + wire
    latency per chunk back to back (the round-3 1M load: 227.7s, slower
    than the single-copy path it replaced); overlapping them bounds the
    load by the slowest single resource. Host RSS holds at most
    ``prefetch`` staged chunks; device transients at most ``prefetch + 1``
    chunks beyond the final buffers."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from colbert_tpu.storage import format as fmt

    wdtype = np.uint32 if nbytes % 4 == 0 else np.uint8
    nwords = nbytes // wdtype().itemsize
    codes_buf = jnp.zeros((N + pad_rows,), jnp.uint32)
    res_buf = jnp.zeros(((N + pad_rows) * nwords,), wdtype)
    nch = fmt.num_chunks(index_path)

    def drop_pages(arr) -> None:
        # release the chunk's resident mmap pages once it is staged: the
        # file is never read again, and without this the load's peak RSS
        # grows by the whole on-disk index (clean page-cache pages held
        # mapped) even though the working set is one chunk
        try:
            import mmap as mmap_mod

            m = arr
            while not isinstance(m, np.memmap) and getattr(m, "base", None) is not None:
                m = m.base
            if isinstance(m, np.memmap):
                m._mmap.madvise(mmap_mod.MADV_DONTNEED)
        except Exception:
            pass

    def put(i: int):
        ch = fmt.load_chunk(index_path, i, mmap=True)
        # a REAL staging copy (ascontiguousarray would hand back the memmap
        # itself): the async transfer must never touch the mmap after the
        # pages are dropped below
        c_host = np.array(ch["codes"], dtype=np.uint32, copy=True)
        # ship residual rows pre-flattened as little-endian words (a
        # C-contiguous reshape + view, no copy): the device buffer is 1-D
        r_host = (
            np.array(ch["residuals"], dtype=np.uint8, copy=True)
            .reshape(-1).view(wdtype)
        )
        c = jax.device_put(c_host)
        r = jax.device_put(r_host)
        drop_pages(ch["codes"])
        drop_pages(ch["residuals"])
        return c, r

    off = 0
    n_done = 0
    drain_every = max(2 * prefetch, 8)
    with ThreadPoolExecutor(max_workers=max(1, prefetch)) as ex:
        window: deque = deque()
        next_i = 0
        while next_i < min(prefetch, nch):
            window.append(ex.submit(put, next_i))
            next_i += 1
        while window:
            c, r = window.popleft().result()
            codes_buf = _write_rows(codes_buf, c, jnp.int32(off))
            # uint32: word offsets can pass int32 range near HBM capacity
            res_buf = _write_rows(res_buf, r, jnp.uint32(off * nwords))
            off += c.shape[0]
            n_done += 1
            if n_done % drain_every == 0:
                # async device_put pins each staged host buffer until its
                # wire transfer lands; a periodic 4-byte readback drains the
                # queue so peak RSS holds at O(drain_every) chunks instead
                # of O(index) when the wire lags dispatch
                float(codes_buf[0])
            if next_i < nch:
                window.append(ex.submit(put, next_i))
                next_i += 1
    if off != N:
        raise ValueError(
            f"chunks under {index_path} hold {off} embeddings, doclens say {N}"
        )
    return codes_buf, res_buf


@dataclass
class DeviceIndex:
    """All index artifacts as device arrays, plus the jitted search program."""

    MAX_CELL_DUP = MAX_CELL_DUP  # sub-cells per oversized cell (see build())

    centroids: jax.Array      # (k, dim) f32 — codec table (codes index this)
    probe_centroids: jax.Array  # (k', dim) f32 — probing table (balanced IVF
                                # duplicates oversized cells' rows; k' >= k)
    codes: jax.Array          # (N+max_doclen,) uint32 — zeroed tail rows keep
                              # every passage's fixed-width dynamic_slice
                              # window in bounds (stage-2 reads are contiguous
                              # per-candidate slices, not element gathers)
    residuals: jax.Array      # ((N+max_doclen)*nwords,) FLAT little-endian
                              # words: uint32 lanes when nbytes % 4 == 0
                              # (nwords = nbytes/4), else uint8 bytes. 1-D so
                              # stage-2 reads each candidate's packed rows as
                              # ONE contiguous dynamic_slice (a 2-D u8 slice
                              # makes XLA re-tile the whole operand — OOM at
                              # 1M; element-row gathers cost ~10.5M gathered
                              # rows per B=64 batch, the round-4 stage-2
                              # budget's dominant term). uint32 lanes keep
                              # per-candidate word offsets (eid*nwords)
                              # inside uint32 range past HBM capacity.
    ivf: jax.Array            # (N+IVF_PAD,) int32 PIDS grouped by centroid — the
                              # on-disk IVF stores eids; the device copy maps
                              # them to pids at build time so stage-1 does ONE
                              # random gather per entry instead of two
                              # (ivf[idx] then emb2pid[eid]; TPU scalar
                              # gathers are the stage-1 cost)
    ivf_offsets: jax.Array    # (k,) int32
    ivf_lengths: jax.Array    # (k,) int32
    doclens: jax.Array        # (P+1,) int32 — sentinel pid has doclen 0
    emb_offsets: jax.Array    # (P+1,) int32 — sentinel pid points at sentinel token
    bucket_weights: jax.Array # (2^nbits,) f32
    n_passages: int
    nbits: int
    max_doclen: int           # padded per-passage token capacity (static)
    # largest number of probe-table duplicates of one cell (1 = no split);
    # searchers add probe_compensation(probe_dup_max, probe_split_mass)
    # probes so duplicates don't crowd out distinct cells
    probe_dup_max: int = 1
    # fraction of probeable entries in split cells (scales the compensation)
    probe_split_mass: float = 0.0
    # telemetry: total candidates dropped beyond the stage-1 selection width
    # (the refine's 4x window or ncandidates; score-ordered, so the dropped
    # ones are the weakest — but non-zero overflow still means recall may
    # differ from exhaustive probing)
    overflow_candidates: int = field(default=0, compare=False)

    @classmethod
    def build(
        cls,
        *,
        centroids: np.ndarray,
        codes: np.ndarray | None = None,
        residuals: np.ndarray | None = None,
        ivf: np.ndarray,
        ivf_lengths: np.ndarray,
        doclens: np.ndarray,
        bucket_weights: np.ndarray,
        nbits: int,
        balance_cap: int | None = None,
        stream_from: str | None = None,
    ) -> "DeviceIndex":
        """``balance_cap`` splits IVF cells larger than the cap into at most
        ``MAX_CELL_DUP`` sub-cells whose probe centroids are duplicates of
        the original (identical probe scores, so ``top_k`` picks a big
        cell's sub-cells together): the static per-probe entry budget
        shrinks to the cap while oversized cells stay probeable up to
        ``MAX_CELL_DUP * cap`` entries (truncation beyond that is counted
        and warned). Codec centroids (what codes decompress against) are
        untouched. None = no splitting.

        ``codes``/``residuals`` may arrive pre-padded with the zeroed tail
        rows the sliced stage-2 needs (``len == doclens.sum() + max_doclen``
        where ``max_doclen`` is the doclens max rounded up to 32, as produced
        by ``format.load_all_*(extra_rows=...)``): they are then used in
        place — host RSS stays at ONE copy of the index instead of the
        concat+append double it used to pay (~2x index size transient at MS
        MARCO scale). Any other length >= ``doclens.sum()`` is re-padded
        through a host copy.

        With ``stream_from`` (an index dir) instead of host arrays, chunks
        are uploaded straight from their mmaps into preallocated device
        buffers via donated in-place updates: host RSS never materializes
        the packed index at all (only one chunk's pages at a time)."""
        doclens = np.asarray(doclens, np.int64)
        N = int(doclens.sum())
        P = len(doclens)
        max_doclen = int(doclens.max()) if P else 1
        max_doclen = max(32, -(-max_doclen // 32) * 32)
        if stream_from is None:
            if len(codes) < N or len(residuals) != len(codes):
                raise ValueError(
                    f"codes/residuals rows ({len(codes)}/{len(residuals)}) must "
                    f"be >= doclens.sum()={N} and equal"
                )
            nbytes = residuals.shape[1]
        else:
            nbytes = centroids.shape[1] // 8 * nbits
        sentinel_eid = N
        sentinel_pid = P

        centroids = np.asarray(centroids, np.float32)
        ivf = np.asarray(ivf)
        ivf_lengths = np.asarray(ivf_lengths, np.int64)
        orig_offsets = np.concatenate([[0], np.cumsum(ivf_lengths)])[:-1]
        probe_dup_max = 1
        probe_split_mass = 0.0
        if balance_cap is not None and len(ivf_lengths) and (
            int(ivf_lengths.max()) > balance_cap
        ):
            probe_split_mass = split_mass_fraction(ivf_lengths, balance_cap)
            # duplication is bounded: each probe slot a duplicate wins is a
            # slot another cell loses, so searchers compensate nprobe by
            # (probe_dup_max - 1); unbounded duplication would push that
            # compensation — and the per-query entry budget — back up.
            # Entries beyond MAX_CELL_DUP * cap of a mega-cell are truncated
            # (the pre-balancing behavior for the whole cell).
            sub_lengths, sub_offsets, split_origin, probe_dup_max = (
                balance_cells(ivf_lengths, orig_offsets, balance_cap)
            )
            probe_centroids = centroids[split_origin]
            ivf_lengths = sub_lengths
            orig_offsets = sub_offsets
        else:
            probe_centroids = centroids

        wdtype = np.uint32 if nbytes % 4 == 0 else np.uint8
        if stream_from is not None:
            codes_dev, res_dev = _stream_chunks_to_device(
                stream_from, N, nbytes, pad_rows=max_doclen
            )
        elif len(codes) == N + max_doclen:  # pre-padded by the loader (zeroed)
            codes_dev = jnp.asarray(np.ascontiguousarray(codes, dtype=np.uint32))
            res_dev = jnp.asarray(
                np.ascontiguousarray(residuals, dtype=np.uint8)
                .reshape(-1).view(wdtype)
            )
        else:
            codes_p = np.zeros(N + max_doclen, np.uint32)
            codes_p[:N] = codes[:N]
            res_p = np.zeros((N + max_doclen, nbytes), np.uint8)
            res_p[:N] = residuals[:N]
            codes_dev = jnp.asarray(codes_p)
            res_dev = jnp.asarray(res_p.reshape(-1).view(wdtype))

        # emb2pid with the sentinel entry filled in place (no concat copy —
        # at MS MARCO scale these transients are GBs of peak RSS)
        emb2pid = np.empty(N + 1, np.int32)
        emb2pid[:N] = np.repeat(np.arange(P, dtype=np.int32), doclens)
        emb2pid[N] = sentinel_pid

        offsets = np.zeros(P + 1, np.int32)
        if P:
            offsets[:P] = np.concatenate([[0], np.cumsum(doclens[:-1])])
        offsets[P] = sentinel_eid  # sentinel pid reads the sentinel token row
        dl_p = np.concatenate([doclens.astype(np.int32), np.zeros(1, np.int32)])

        ivf_offsets = orig_offsets.astype(np.int32)
        # pad the ivf tail (IVF_PAD entries) so every probed cell's fixed
        # cell_cap-wide dynamic_slice window stays in bounds, then map
        # eids -> pids ONCE on the host: stage-1 then pays one contiguous
        # slice read per probed cell instead of element gathers (emb2pid
        # never ships to HBM). The map indexes with the on-disk dtype
        # directly (int32 since round 4) — no widening copy.
        ivf_pid = np.full(len(ivf) + IVF_PAD, sentinel_pid, np.int32)
        ivf_pid[: len(ivf)] = emb2pid[ivf]

        return cls(
            centroids=jnp.asarray(centroids, jnp.float32),
            probe_centroids=jnp.asarray(probe_centroids, jnp.float32),
            codes=codes_dev,
            residuals=res_dev,
            ivf=jnp.asarray(ivf_pid),
            ivf_offsets=jnp.asarray(ivf_offsets),
            ivf_lengths=jnp.asarray(ivf_lengths, jnp.int32),
            doclens=jnp.asarray(dl_p),
            emb_offsets=jnp.asarray(offsets),
            bucket_weights=jnp.asarray(bucket_weights, jnp.float32),
            n_passages=P,
            nbits=nbits,
            max_doclen=max_doclen,
            probe_dup_max=probe_dup_max,
            probe_split_mass=probe_split_mass,
        )

    # ------------------------------------------------------------------

    def rebalance(self, ivf_lengths: np.ndarray, balance_cap: int | None) -> None:
        """Recompute the probe-side balanced-IVF tables for a new
        ``balance_cap`` IN PLACE, reusing the HBM-resident
        codes/residuals/IVF entries untouched. The cap only chooses which
        contiguous IVF segments probing covers (sub-cell offsets derive
        from origin offsets — see :meth:`build`), so this is what makes
        ``ivf_balance_cap`` an in-process tunable: the autotuner
        (:mod:`colbert_tpu.evaluation.autotune`) sweeps caps against the
        oracle without re-uploading a byte of the index. SCALE.md's round-4
        1M-trained measurement is why it matters: cap=2048 moved
        score-recall@10 0.906 -> 0.956 at ~18% QPS, the dominant
        corpus-dependent quality lever.

        ``ivf_lengths`` are the ORIGINAL (on-disk) per-cell lengths the
        index was built from — ``self.ivf_lengths`` holds the SPLIT ones.
        """
        ivf_lengths = np.asarray(ivf_lengths, np.int64)
        orig_offsets = np.concatenate([[0], np.cumsum(ivf_lengths)])[:-1]
        if balance_cap is not None and len(ivf_lengths) and (
            int(ivf_lengths.max()) > balance_cap
        ):
            self.probe_split_mass = split_mass_fraction(ivf_lengths, balance_cap)
            sub_lengths, sub_offsets, split_origin, self.probe_dup_max = (
                balance_cells(ivf_lengths, orig_offsets, balance_cap)
            )
            self.probe_centroids = jnp.asarray(
                np.asarray(self.centroids)[split_origin]
            )
            self.ivf_lengths = jnp.asarray(sub_lengths, jnp.int32)
            self.ivf_offsets = jnp.asarray(sub_offsets.astype(np.int32))
        else:
            self.probe_centroids = self.centroids
            self.ivf_lengths = jnp.asarray(ivf_lengths, jnp.int32)
            self.ivf_offsets = jnp.asarray(orig_offsets.astype(np.int32))
            self.probe_dup_max = 1
            self.probe_split_mass = 0.0

    def compensated_nprobe(self, nprobe: int, *, saturate: float = 0.05) -> int:
        """``nprobe`` plus the probe-dup compensation this index's balanced
        IVF warrants (see :func:`probe_compensation`); ``saturate`` is
        ``config.probe_comp_saturation``."""
        return nprobe + probe_compensation(
            self.probe_dup_max, self.probe_split_mass, saturate=saturate
        )

    def _clamp(self, Lq: int, nprobe: int, cell_cap: int,
               max_candidates: int, ncandidates: int, k: int):
        max_candidates = min(max_candidates, Lq * nprobe * cell_cap)
        ncand = min(ncandidates, max_candidates)
        return max_candidates, ncand, min(k, ncand)

    def search(
        self, Q: jax.Array, *, k: int, nprobe: int, ncandidates: int,
        cell_cap: int = 1024, max_candidates: int = 8192,
        centroid_threshold: float | None = None,
        use_pallas: bool = False,
        stage1_refine: bool = True,
        refine_width: int = 4,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One pre-encoded query (Q: (Lq, dim)) -> (pids (k,), scores (k,))."""
        pids, scores = self.search_Q_batch(
            Q[None], k=k, nprobe=nprobe, ncandidates=ncandidates,
            cell_cap=cell_cap, max_candidates=max_candidates,
            centroid_threshold=centroid_threshold, use_pallas=use_pallas,
            stage1_refine=stage1_refine, refine_width=refine_width,
        )
        return pids[0], scores[0]

    def search_Q_batch(
        self, Q: jax.Array, *, k: int, nprobe: int, ncandidates: int,
        cell_cap: int = 1024, max_candidates: int = 8192,
        centroid_threshold: float | None = None,
        use_pallas: bool = False,
        stage1_refine: bool = True,
        refine_width: int = 4,
        force_float_sort: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Pre-encoded queries (B, Lq, dim) -> (pids (B, k), scores (B, k))."""
        B, Lq, _ = Q.shape
        mc, ncand, k_eff = self._clamp(Lq, nprobe, cell_cap, max_candidates,
                                       ncandidates, k)
        pids, scores, overflow = _search_batch(
            Q,
            self.centroids, self.probe_centroids, self.codes, self.residuals,
            self.ivf, self.ivf_offsets, self.ivf_lengths,
            self.doclens, self.emb_offsets, self.bucket_weights,
            sentinel_pid=self.n_passages,
            nbits=self.nbits,
            max_doclen=self.max_doclen,
            k=k_eff, nprobe=nprobe, ncandidates=ncand,
            cell_cap=cell_cap, max_candidates=mc,
            centroid_threshold=centroid_threshold, use_pallas=use_pallas,
            stage1_refine=stage1_refine, refine_width=refine_width,
            force_float_sort=force_float_sort,
        )
        return self._postprocess(
            np.asarray(pids), np.asarray(scores), np.asarray(overflow), k
        )

    def search_tokens_batch(
        self, params, bert_cfg, input_ids: np.ndarray, attention_mask: np.ndarray,
        *, k: int, nprobe: int, ncandidates: int,
        cell_cap: int = 1024, max_candidates: int = 8192,
        centroid_threshold: float | None = None,
        use_pallas: bool = False,
        stage1_refine: bool = True,
        refine_width: int = 4,
        dtype_name: str = "bfloat16",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fully fused serving path: query token ids -> (pids, scores) in ONE
        device program (BERT query encode + retrieval + ranking)."""
        return self.finalize(self.search_tokens_batch_async(
            params, bert_cfg, input_ids, attention_mask,
            k=k, nprobe=nprobe, ncandidates=ncandidates, cell_cap=cell_cap,
            max_candidates=max_candidates,
            centroid_threshold=centroid_threshold, use_pallas=use_pallas,
            stage1_refine=stage1_refine, refine_width=refine_width,
            dtype_name=dtype_name,
        ))

    def search_tokens_batch_async(
        self, params, bert_cfg, input_ids: np.ndarray, attention_mask: np.ndarray,
        *, k: int, nprobe: int, ncandidates: int,
        cell_cap: int = 1024, max_candidates: int = 8192,
        centroid_threshold: float | None = None,
        use_pallas: bool = False,
        stage1_refine: bool = True,
        refine_width: int = 4,
        dtype_name: str = "bfloat16",
    ) -> "PendingSearch":
        """Launch the fused search program WITHOUT blocking on its results.

        JAX dispatch is asynchronous: the returned :class:`PendingSearch`
        holds live device arrays, so the host can tokenize and launch the
        next batch while this one executes — :meth:`finalize` blocks (the
        result D2H) and postprocesses. :class:`Searcher.search_stream`
        builds the pipelined serving loop on this."""
        B, Lq = input_ids.shape
        mc, ncand, k_eff = self._clamp(Lq, nprobe, cell_cap, max_candidates,
                                       ncandidates, k)
        pids, scores, overflow = _search_tokens(
            params, jnp.asarray(input_ids), jnp.asarray(attention_mask),
            self.centroids, self.probe_centroids, self.codes, self.residuals,
            self.ivf, self.ivf_offsets, self.ivf_lengths,
            self.doclens, self.emb_offsets, self.bucket_weights,
            bert_cfg=bert_cfg, dtype_name=dtype_name,
            sentinel_pid=self.n_passages,
            nbits=self.nbits,
            max_doclen=self.max_doclen,
            k=k_eff, nprobe=nprobe, ncandidates=ncand,
            cell_cap=cell_cap, max_candidates=mc,
            centroid_threshold=centroid_threshold, use_pallas=use_pallas,
            stage1_refine=stage1_refine, refine_width=refine_width,
        )
        return PendingSearch(pids=pids, scores=scores, overflow=overflow, k=k)

    def finalize(self, pending: "PendingSearch") -> Tuple[np.ndarray, np.ndarray]:
        """Block on a :meth:`search_tokens_batch_async` launch -> (pids, scores)."""
        return self._postprocess(
            np.asarray(pending.pids), np.asarray(pending.scores),
            np.asarray(pending.overflow), pending.k,
        )

    def _postprocess(self, pids, scores, overflow, k):
        B = pids.shape[0]
        dropped = int(overflow.sum())
        if dropped > 0:
            first = self.overflow_candidates == 0
            self.overflow_candidates += dropped
            # warn once per index; the running counter stays queryable
            logger.log(
                logging.WARNING if first else logging.DEBUG,
                "stage-1 selection overflow: %d candidates dropped beyond "
                "the selection width (lowest stage-1 scores; widen "
                "plaid_stage2_docs/ncandidates — and search_max_candidates, "
                "which caps the refine window — to score them; "
                "total dropped: %d)",
                dropped, self.overflow_candidates,
            )
        out_p = np.full((B, k), -1, np.int64)
        out_s = np.full((B, k), -np.inf, np.float32)
        for b in range(B):
            valid = pids[b] != self.n_passages
            nv = int(valid.sum())
            out_p[b, :nv] = pids[b][valid]
            out_s[b, :nv] = scores[b][valid]
        return out_p, out_s


# ---------------------------------------------------------------------------
# search core (single query; vmapped over the batch — probing excepted)
# ---------------------------------------------------------------------------


def _probe_topk(Q_flat, probe_cents, *, nprobe: int, probe_ncells=None):
    """Probe ALL queries' tokens against the probe table in ONE flat
    (B*Lq, K') matmul + top_k (reference ranking.jl:27-31).

    This runs OUTSIDE the per-query vmap on purpose: measured on v5e at 1M
    geometry (K'=131k, B=64), the identical math under the vmap costs
    470 ms/batch while this flat formulation costs 82 ms — XLA tiles one
    big MXU matmul well but schedules B per-query ones pathologically."""
    cscores = jnp.dot(
        Q_flat, probe_cents.T, preferred_element_type=jnp.float32
    )  # (B*Lq, K')
    if probe_ncells is not None:
        # sharded probe tables are padded to a common K' across shards; pad
        # rows must never win a probe slot (they would tie with whatever
        # cell's centroid fills them and crowd out real cells)
        col = jnp.arange(cscores.shape[1], dtype=jnp.int32)
        cscores = jnp.where(col[None, :] < probe_ncells, cscores, NEG)
    return jax.lax.top_k(cscores, nprobe)  # (B*Lq, nprobe) scores, cells


def _search_core(
    Q,                     # (Lq, dim) f32
    probe_scores, cells,   # (Lq, nprobe) — from _probe_topk, reshaped
    centroids, codes, residuals, ivf, ivf_offsets, ivf_lengths,
    doclens, emb_offsets, bucket_weights,
    *, sentinel_pid: int, nbits: int, max_doclen: int,
    k: int, nprobe: int, ncandidates: int, cell_cap: int, max_candidates: int,
    centroid_threshold: float | None = None,
    use_pallas: bool = False,
    stage1_refine: bool = True,
    refine_width: int = 4,  # refine window = refine_width * ncandidates
    force_float_sort: bool = False,  # testing hook for the >2^26-pid path
    probe_ncells=None,  # traced scalar: valid probe-table rows (sharded pads)
):
    Lq, dim = Q.shape

    # PLAID cell pruning (PAPERS.md PLAID; the reference has no staged
    # pruning at all): probed cells whose centroid score falls below
    # ``centroid_threshold`` generate no candidates. Each query token's
    # best cell is always kept so weak queries still retrieve.
    if centroid_threshold is not None:
        keep_cell = probe_scores >= centroid_threshold       # (Lq, nprobe)
        keep_cell = keep_cell.at[:, 0].set(True)
    else:
        keep_cell = jnp.ones(probe_scores.shape, bool)
    cells = cells.reshape(-1)                                 # (ncells,)
    keep_cell = keep_cell.reshape(-1)
    entry_score = probe_scores.reshape(-1)                    # (ncells,)

    # --- 2. padded IVF read (reference ranking.jl:7-21) ---
    # the device IVF holds PIDS (mapped from eids at build): one contiguous
    # read per probed cell, not element gathers. Cells are contiguous runs,
    # so a vmapped dynamic_slice (-> XLA gather with slice_sizes=cell_cap)
    # reads each probed cell as ONE contiguous HBM burst — measured on v5e
    # at 1M geometry: 256 ms -> 81 ms per 64-query batch vs the clamped
    # element-gather formulation. Cell offsets never exceed the entry count
    # (balance_cells never emits zero-length sub-cells past it), so the
    # IVF_PAD tail pad (build()) keeps every window in bounds for
    # cell_cap <= IVF_PAD; larger caps fall back to element gathers.
    base = ivf_offsets[cells]                                   # (ncells,)
    lens = jnp.where(keep_cell, ivf_lengths[cells], 0)
    ar = jnp.arange(cell_cap, dtype=jnp.int32)
    valid = ar[None, :] < lens[:, None]
    if cell_cap <= IVF_PAD:
        rows = jax.vmap(
            lambda b: jax.lax.dynamic_slice(ivf, (b,), (cell_cap,))
        )(base)                                                 # (ncells, cell_cap)
    else:
        idx = base[:, None] + jnp.minimum(
            ar[None, :], jnp.maximum(lens[:, None] - 1, 0)
        )
        rows = ivf[idx]
    pids_e = jnp.where(valid, rows, sentinel_pid)               # (ncells, cell_cap)

    # --- 3+4. on-device pid dedup + stage-1 ranking, gather-free ---
    # Every IVF entry already carries its originating cell's centroid score
    # for its probing query token, so the PLAID stage-1 approximation can be
    # built WITHOUT gathering candidate token codes (the gather was the
    # serving bottleneck: TPU scalar gathers run ~100x below HBM peak).
    # Per candidate: sum over query tokens of the max probed-entry score,
    # with unprobed tokens imputed at their nprobe-th probe score — an
    # admissible upper bound (any unprobed cell scores below the nprobe-th),
    # the WARP/XTR missing-token imputation. The imputation constant is
    # candidate-independent, so ranking only needs the non-negative
    # adjusted contributions (score − impute[q]).
    flat_pids = pids_e.reshape(-1)                              # (E,)
    if probe_ncells is None:
        impute = probe_scores[:, nprobe - 1]                     # (Lq,)
    else:
        # never impute from a masked pad column: when this shard has fewer
        # valid cells than nprobe, every real cell is probed and the worst
        # REAL probe score is the (still admissible) imputation bound
        imp_col = jnp.minimum(jnp.int32(nprobe), probe_ncells) - 1
        impute = jnp.take_along_axis(
            probe_scores, jnp.full((Lq, 1), imp_col, jnp.int32), axis=1
        )[:, 0]
    q_of = jax.lax.broadcasted_iota(jnp.int32, (Lq, nprobe), 0).reshape(-1)
    entry_adj = entry_score - impute[q_of]                       # ≥ 0
    flat_adj = jnp.broadcast_to(entry_adj[:, None], valid.shape).reshape(-1)
    flat_adj = jnp.where(valid.reshape(-1), flat_adj, NEG)
    flat_q = jnp.broadcast_to(q_of[:, None], valid.shape).reshape(-1)

    # sort entries by (pid, q, score DESC): ONE int32 composite primary key
    # (valid for corpora up to 2^31 / next_pow2(Lq) passages — 67M at
    # Lq=32; beyond that, a three-key lexicographic sort) with the NEGATED
    # score as the secondary key, so each (pid, q) run's HEAD carries the
    # run max. That kills the segment_max scatter the previous formulation
    # paid after the sort (measured on v5e at 1M geometry: the scatter-based
    # stage-1 cost 422 ms/batch, this one 182 ms). ``lax.sort`` with carried
    # keys beats argsort + gathers (+23% QPS, round 3); no stability is
    # needed — entries tied on (pid, q, score) are interchangeable.
    qbits = max(1, (Lq - 1).bit_length())
    neg_adj = -flat_adj  # ascending == score descending; invalid -> +1e30, last
    if sentinel_pid < (1 << (31 - qbits)) and not force_float_sort:
        key = (flat_pids.astype(jnp.int32) << qbits) | flat_q
        key_sorted, na2 = jax.lax.sort((key, neg_adj), num_keys=2)
        p2 = key_sorted >> qbits
        q2 = key_sorted & ((1 << qbits) - 1)
        changed = jnp.concatenate(
            [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]]
        )
    else:
        p2, q2, na2 = jax.lax.sort(
            (flat_pids, flat_q, neg_adj), num_keys=3
        )
        changed = jnp.concatenate(
            [jnp.ones((1,), bool), (p2[1:] != p2[:-1]) | (q2[1:] != q2[:-1])]
        )
    a2 = -na2

    first_p = jnp.concatenate([jnp.ones((1,), bool), p2[1:] != p2[:-1]])
    real = p2 != sentinel_pid
    first_pq = changed & real
    first = first_p & real
    n_unique = jnp.sum(first)
    # overflow counts candidates beyond the width ACTUALLY selected out of
    # stage-1 (the refine's widened window, or ncandidates) — not
    # max_candidates, which nothing truncates at
    if stage1_refine and ncandidates < max_candidates:
        sel_width = min(refine_width * ncandidates, max_candidates)
    else:
        sel_width = ncandidates
    overflow = jnp.maximum(0, n_unique - sel_width)

    # per-pid stage-1 score = per-pid-run sum of per-(pid, q) maxima, which
    # after the score-descending sort are exactly the (pid, q) run heads.
    # Ranking uses the MIDPOINT of the probed bounds: the upper bound
    # imputes every unprobed query token at its nprobe-th probe score
    # (candidate-independent constant => contribution s - impute_q), the
    # lower bound imputes 0 (contribution s). The midpoint tracks PLAID's
    # full centroid stage-1 better than either bound and keeps the
    # hit-count signal that the pure upper bound loses at nprobe=1.
    # Per-pid sums come from a cumsum DIFFERENCE between run boundaries
    # instead of a segment_sum scatter (TPU scatters are the cost; the one
    # remaining gather, csum[run_end], is unavoidable but 1-per-entry).
    E = p2.shape[0]
    # unclamped: contribution (s - i_q) + i_q/2 = s - i_q/2, the midpoint,
    # for negative nprobe-th scores too (clamping only one side would
    # inflate hits on negative-impute query tokens)
    half_imp = impute[q2] * 0.5
    contrib = jnp.where(first_pq, jnp.maximum(a2, 0.0) + half_imp, 0.0)
    csum = jnp.cumsum(contrib)
    csum_prev = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])
    idx = jnp.arange(E, dtype=jnp.int32)
    # next pid-run head strictly after i, via reverse cummin (E = none):
    # run_end(head i) = next_head - 1, or E-1 for the last run
    headpos = jnp.where(first_p, idx, E)
    nxt = jax.lax.cummin(headpos[::-1])[::-1]      # head at-or-after i
    nxt2 = jnp.concatenate([nxt[1:], jnp.full((1,), E, jnp.int32)])
    run_end = nxt2 - 1                              # in [i, E-1] at heads
    stage1 = jnp.where(first, csum[run_end] - csum_prev, NEG)   # (E,)

    def tok_meta(pids_sel):
        # stage-2 reads each candidate's token rows as ONE contiguous
        # (max_doclen,) dynamic_slice from its embedding offset (codes and
        # residuals carry max_doclen zeroed tail rows, build()) — all a
        # consumer needs is (offset, doclen)
        return emb_offsets[pids_sel], doclens[pids_sel]

    if stage1_refine and ncandidates < max_candidates:
        # hybrid funnel: the probed bound cannot separate near-duplicate
        # candidates (same cells -> tied scores), so take a (up to)
        # refine_width-x cut by the cheap bound, then rank those by the FULL
        # centroid interaction (token-code reads — expensive, and ~linear in
        # this width: the refine gathers width * max_doclen centroid rows)
        # before the stage-2 budget. config.refine_width_factor is the dial.
        width = min(refine_width * ncandidates, max_candidates)
        w_vals, w_idx = jax.lax.top_k(stage1, width)
        w_pids = jnp.where(w_vals > NEG / 2, p2[w_idx], sentinel_pid)
        w_off, w_dl = tok_meta(w_pids)
        # the refine scores tokens by their CODEC centroid ids
        approx = _approx_maxsim(
            Q, centroids, codes, w_off, w_dl, max_doclen=max_doclen
        )
        approx = jnp.where(w_pids == sentinel_pid, NEG, approx)
        _, keep_rows = jax.lax.top_k(approx, ncandidates)
        fin_pids = w_pids[keep_rows]
        fin_off = w_off[keep_rows]
        fin_dl = w_dl[keep_rows]
    else:
        # exact top-ncandidates (cheaper than a full argsort of E entries)
        top_vals, top_idx = jax.lax.top_k(stage1, ncandidates)
        fin_pids = jnp.where(top_vals > NEG / 2, p2[top_idx], sentinel_pid)
        fin_off, fin_dl = tok_meta(fin_pids)

    # --- 5. stage-2: chunked fused decompress + MaxSim on survivors ---
    scores = _stage2_scores(
        Q, codes, residuals, centroids, bucket_weights,
        fin_off, fin_dl, max_doclen=max_doclen, nbits=nbits,
        use_pallas=use_pallas,
    )
    scores = jnp.where(fin_pids == sentinel_pid, NEG, scores)

    # --- 6. final top-k ---
    top_scores, top_rows = jax.lax.top_k(scores, k)
    return fin_pids[top_rows], top_scores, overflow


def _slice_rows(table, offs, Ld: int):
    """Read a contiguous ``Ld``-element window per offset from a 1-D table:
    vmapped dynamic_slice -> XLA gather with ``slice_sizes=Ld`` ->
    contiguous HBM bursts. Candidate token rows ARE contiguous runs
    (off + [0..doclen)), but the element-gather formulation hid that from
    XLA — TPU scalar gathers run ~100x below HBM peak. Measured on v5e at
    1M geometry (B=64, width 4096): the refine dropped 1152 -> 540 ms/batch
    on this change alone. Requires ``table`` to carry >= Ld zeroed tail
    rows (build() pads codes/residuals by max_doclen; offsets never exceed
    N). 1-D ONLY: a 2-D dynamic_slice over the u8 residuals makes XLA
    re-tile the whole operand into (8,128)(4,1) layout — a 4x-padded copy
    of the full array (13 GB -> hbm OOM at 1M, measured); residual rows
    stay on the row-gather formulation instead."""
    return jax.vmap(
        lambda b: jax.lax.dynamic_slice(table, (b,), (Ld,))
    )(offs)


def _approx_maxsim(Q, centroids, codes, offs, dls, *, max_doclen: int,
                   chunk: int = 256):
    """Full centroid-interaction approximation: sum_q max_t <q, cent[code(t)]>
    over valid tokens, chunked.

    Token codes are read as contiguous per-candidate slices (see
    :func:`_slice_rows`), then scored as a SHARED-table row gather + MXU
    matmul: gather each candidate token's centroid row (bf16) from the
    replicated codec table, then one (chunk·Ld, dim) x (dim, Lq) matmul per
    chunk. A per-query (Lq, k) score-table gather would carry the vmap batch
    dim, and XLA lowers a batched-operand gather ~20x slower than the same
    gather from a shared table (measured on v5e: refine 2.2 s -> ~0.2 s per
    B=64 batch at 141k). Bf16 rows round the approximation by ~1e-2
    relative — it is a pruning score, and the 4x selection window absorbs
    that noise."""
    MC = offs.shape[0]
    Lq, dim = Q.shape
    Ld = max_doclen
    cent16 = centroids.astype(jnp.bfloat16)
    q16 = Q.astype(jnp.bfloat16)
    nchunks = max(1, -(-MC // chunk))
    padded = nchunks * chunk
    off_p = jnp.pad(offs, (0, padded - MC)).reshape(nchunks, chunk)
    dl_p = jnp.pad(dls, (0, padded - MC)).reshape(nchunks, chunk)
    arl = jnp.arange(Ld, dtype=jnp.int32)

    def one(args):
        off, dl = args
        cd = _slice_rows(codes, off, Ld)                  # (chunk, Ld)
        rows = cent16[cd.reshape(chunk * Ld).astype(jnp.int32)]
        s = jnp.dot(rows, q16.T, preferred_element_type=jnp.float32)
        s = s.reshape(chunk, Ld, Lq)
        v = arl[None, :] < dl[:, None]                    # (chunk, Ld)
        s = jnp.where(v[:, :, None], s, NEG)
        per_q = jnp.max(s, axis=1)                        # (chunk, Lq)
        per_q = jnp.where((dl > 0)[:, None], per_q, 0.0)
        return jnp.sum(per_q, axis=-1)                    # (chunk,)

    out = jax.lax.map(one, (off_p, dl_p))
    return out.reshape(padded)[:MC]


def _stage2_scores(
    Q, codes, residuals, centroids, bucket_weights, offs, dls,
    *, max_doclen: int, nbits: int, chunk: int = 128, use_pallas: bool = False,
):
    """Fused decompress+MaxSim, chunked over candidates so the fp32
    embeddings of only ``chunk`` passages are ever live. Candidate token
    codes AND residuals are read as contiguous per-candidate slices
    (:func:`_slice_rows`): ``residuals`` is the FLAT word-typed device
    array (see :class:`DeviceIndex.residuals`), so each candidate's packed
    rows are one ``Ld*nwords``-wide contiguous burst from ``off*nwords``
    instead of ``Ld`` element-row gathers — TPU gathers are row-count-bound
    (~10.5M gathered residual rows per B=64 batch at the 1M geometry were
    the stage-2 budget's dominant term).

    ``use_pallas`` routes each chunk through the pallas kernel
    (:mod:`colbert_tpu.ops.fused_maxsim`): bit-unpack + bucket decode +
    centroid-add + renorm + dot + token-max on VMEM tiles, never writing the
    decompressed fp32 embeddings to HBM. Measured on v5e (batched serving
    program, ncand=2048): within +-10%% of the XLA path at B in {1, 32, 64}
    but 18x faster at B=8, where XLA picks a pathological schedule — the
    kernel's flat cost profile across batch buckets is why it is the
    default. Exact to ~1e-6 where XLA's fp32 einsum carries bf16-pass error.
    """
    NC = offs.shape[0]
    Lq, dim = Q.shape
    Ld = max_doclen
    # residuals is flat word-typed; offsets ride uint32 so eid*nwords stays
    # in range past what one chip's HBM can hold (int32 would overflow at
    # ~260M tokens x 8 words)
    nwords = dim // 8 * nbits // residuals.dtype.itemsize
    nchunks = max(1, -(-NC // chunk))
    padded = nchunks * chunk
    off_p = jnp.pad(offs, (0, padded - NC)).reshape(nchunks, chunk)
    dl_p = jnp.pad(dls, (0, padded - NC)).reshape(nchunks, chunk)
    arl = jnp.arange(Ld, dtype=jnp.int32)

    def res_words(off):
        roff = off.astype(jnp.uint32) * jnp.uint32(nwords)
        return _slice_rows(residuals, roff, Ld * nwords)  # (chunk, Ld*nwords)

    if use_pallas:
        from colbert_tpu.ops.fused_maxsim import stage2_maxsim_pallas

        Lq_pad = -(-Lq // 8) * 8
        Qp = jnp.pad(Q.astype(jnp.float32), ((0, Lq_pad - Lq), (0, 0)))
        ldb = 8 if Ld % 8 == 0 else Ld

        def one_pl(args):
            off, dl = args
            cd = _slice_rows(codes, off, Ld)              # (chunk, Ld)
            pk = res_words(off).reshape(chunk, Ld, nwords)
            v = arl[None, :] < dl[:, None]
            cent_rows = centroids[
                cd.reshape(chunk * Ld).astype(jnp.int32)
            ].reshape(chunk, Ld, -1)
            per_q = stage2_maxsim_pallas(
                Qp, cent_rows, pk, v, bucket_weights, nbits=nbits,
                bc=chunk, ldb=ldb,
            )[:Lq]                                   # (Lq, chunk)
            per_q = jnp.where((dl > 0)[None, :], per_q, 0.0)
            return jnp.sum(per_q, axis=0)            # (chunk,)

        out = jax.lax.map(one_pl, (off_p, dl_p))
        return out.reshape(padded)[:NC]

    def one(args):
        off, dl = args
        cd = _slice_rows(codes, off, Ld)                  # (chunk, Ld)
        rs = res_words(off).reshape(chunk * Ld, nwords)
        v = arl[None, :] < dl[:, None]
        embs = codec_ops.decompress(
            cd.reshape(-1), rs, centroids,
            bucket_weights, nbits=nbits,
        ).reshape(chunk, Ld, -1)
        s = jnp.einsum("qd,pld->pql", Q, embs, preferred_element_type=jnp.float32)
        s = jnp.where(v[:, None, :], s, NEG)
        per_q = jnp.max(s, axis=-1)              # (chunk, Lq)
        per_q = jnp.where((dl > 0)[:, None], per_q, 0.0)
        return jnp.sum(per_q, axis=-1)           # (chunk,)

    out = jax.lax.map(one, (off_p, dl_p))
    return out.reshape(padded)[:NC]


_STATIC = (
    "sentinel_pid", "nbits", "max_doclen", "k", "nprobe", "ncandidates",
    "cell_cap", "max_candidates", "centroid_threshold", "use_pallas",
    "stage1_refine", "refine_width", "force_float_sort",
)


def _probe_then_search(
    Q, centroids, probe_cents, codes, residuals, ivf, ivf_offsets,
    ivf_lengths, doclens, emb_offsets, bucket_weights, **static,
):
    """Flat batched probe (see :func:`_probe_topk`), then the per-query
    search core vmapped with the probed cells as batched inputs."""
    B, Lq, dim = Q.shape
    nprobe = static["nprobe"]
    ps, cl = _probe_topk(Q.reshape(B * Lq, dim), probe_cents, nprobe=nprobe)
    ps = ps.reshape(B, Lq, nprobe)
    cl = cl.reshape(B, Lq, nprobe)

    def one(q, p, c):
        return _search_core(
            q, p, c, centroids, codes, residuals, ivf, ivf_offsets,
            ivf_lengths, doclens, emb_offsets, bucket_weights,
            **static,
        )

    return jax.vmap(one)(Q, ps, cl)


@functools.partial(jax.jit, static_argnames=_STATIC)
def _search_batch(
    Q, centroids, probe_cents, codes, residuals, ivf, ivf_offsets, ivf_lengths,
    doclens, emb_offsets, bucket_weights, **static,
):
    return _probe_then_search(
        Q, centroids, probe_cents, codes, residuals, ivf, ivf_offsets,
        ivf_lengths, doclens, emb_offsets, bucket_weights, **static,
    )


@functools.partial(jax.jit, static_argnames=_STATIC + ("bert_cfg", "dtype_name"))
def _search_tokens(
    params, input_ids, attention_mask,
    centroids, probe_cents, codes, residuals, ivf, ivf_offsets, ivf_lengths,
    doclens, emb_offsets, bucket_weights,
    *, bert_cfg, dtype_name, **static,
):
    from colbert_tpu.models.colbert import _forward_normalized

    keep = jnp.ones_like(attention_mask, dtype=bool)
    Q = _forward_normalized(
        params, input_ids, attention_mask, keep, cfg=bert_cfg,
        dtype_name=dtype_name,
    )
    return _probe_then_search(
        Q, centroids, probe_cents, codes, residuals, ivf, ivf_offsets,
        ivf_lengths, doclens, emb_offsets, bucket_weights, **static,
    )
