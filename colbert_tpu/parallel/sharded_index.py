"""Index sharded across a device mesh: pod-scale serving.

The reference loads the whole index into one host's RAM and serves one query
at a time (searching.jl:18-80, SURVEY §3.3); here the corpus is partitioned
into per-device shards — each shard a self-contained mini index (codes,
residuals, local IVF, doclens) resident in its device's HBM — and a query
batch is ONE ``shard_map`` program: every device runs the same single-program
search pipeline (:mod:`colbert_tpu.retrieval.device_index`) over its shard
and emits its local top-k; the cross-shard merge is a tiny host-side sort of
``n_dev * k`` (pid, score) pairs per query.

Centroids and bucket weights are replicated (they are small); candidate
generation is shard-local because each shard has its own IVF over its own
embeddings. Scores are exact MaxSim over whatever each shard holds, so the
merged global top-k equals the single-device result.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from colbert_tpu.retrieval.device_index import IVF_PAD, _probe_topk, _search_core

__all__ = ["ShardedDeviceIndex", "PendingShardSearch"]


@dataclass
class PendingShardSearch:
    """An in-flight sharded search program's live device arrays (see
    :meth:`ShardedDeviceIndex.search_Q_batch_async`);
    ``ShardedDeviceIndex.finalize`` blocks on them and runs the host merge."""

    local_pids: jax.Array    # (D, B, k_local)
    local_scores: jax.Array  # (D, B, k_local)
    k: int


def _pad_to(arr: np.ndarray, n: int, fill) -> np.ndarray:
    if arr.shape[0] >= n:
        return arr[:n]
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


@dataclass
class ShardedDeviceIndex:
    mesh: Mesh
    centroids: jax.Array       # (k, dim) replicated — codec table
    probe_cents: jax.Array     # (D, K', dim) sharded — per-shard probe table
                               # (balanced IVF duplicates; padded across shards)
    bucket_weights: jax.Array  # (2^nbits,) replicated
    codes: jax.Array           # (D, Ns+max_doclen) sharded on axis 0 (zeroed
                               # tail rows keep stage-2's per-candidate
                               # dynamic_slice windows in bounds)
    residuals: jax.Array       # (D, (Ns+max_doclen)*nwords) FLAT LE words
                               # per shard (uint32 lanes when nbytes % 4 == 0
                               # else uint8) — see DeviceIndex.residuals
    ivf: jax.Array             # (D, Ns+IVF_PAD) local PIDS grouped by cell
                               # (eids mapped at build, like DeviceIndex)
    ivf_offsets: jax.Array     # (D, k)
    ivf_lengths: jax.Array     # (D, k)
    doclens: jax.Array         # (D, Ps+1)
    emb_offsets: jax.Array     # (D, Ps+1)
    n_cells: jax.Array         # (D, 1) int32: valid probe-table rows per shard
    pid_base: np.ndarray       # (D,) host: global pid offset per shard
    shard_passages: int        # Ps (padded local passage capacity)
    n_passages: int
    nbits: int
    max_doclen: int
    min_ncells: int = 1        # smallest per-shard valid probe-table size
    probe_dup_max: int = 1     # see DeviceIndex.probe_dup_max
    probe_split_mass: float = 0.0  # worst shard's split-cell mass fraction

    @classmethod
    def build(
        cls,
        mesh: Mesh,
        *,
        centroids: np.ndarray,
        doclens: np.ndarray,
        bucket_weights: np.ndarray,
        nbits: int,
        codes: np.ndarray | None = None,
        residuals: np.ndarray | None = None,
        stream_from: str | None = None,
        balance_cap: int | None = None,
        deleted_pids: np.ndarray | None = None,
    ) -> "ShardedDeviceIndex":
        """Partition passages contiguously into ``mesh.shape['data']`` shards
        and build each shard's local IVF from its codes slice.
        ``balance_cap`` splits oversized local cells per shard (see
        :func:`colbert_tpu.retrieval.device_index.balance_cells`).
        ``deleted_pids`` (IndexUpdater tombstones) are excluded from every
        shard's local IVF, so their embeddings can never become candidates.

        Multi-controller aware (``parallel.launch``): each process builds
        and uploads ONLY the shards whose devices it addresses, reading just
        those rows from disk when ``stream_from`` (an index dir) is given
        instead of in-memory ``codes``/``residuals`` — on a pod, no host
        ever materializes (or even pages in) another host's shard."""
        from colbert_tpu.indexing.updater import build_ivf_excluding
        from colbert_tpu.parallel import launch
        from colbert_tpu.retrieval.device_index import (
            balance_cells,
            split_mass_fraction,
        )
        from colbert_tpu.storage import format as fmt

        if (codes is None) != (residuals is None):
            raise ValueError("codes and residuals must be passed together")
        if (codes is None) == (stream_from is None):
            raise ValueError("pass exactly one of codes/residuals or stream_from")
        ndev = mesh.shape["data"]
        multihost = jax.process_count() > 1
        P_total = len(doclens)
        k = centroids.shape[0]
        nbytes = (
            residuals.shape[1] if residuals is not None
            else centroids.shape[1] // 8 * nbits
        )
        emb_offsets_global = np.concatenate([[0], np.cumsum(doclens)]).astype(np.int64)

        # contiguous passage ranges with ~equal embedding counts; all
        # paddings below derive from doclens (metadata every process has),
        # so shapes agree across hosts without communication
        total_embs = int(doclens.sum())
        targets = [(s + 1) * total_embs / ndev for s in range(ndev)]
        bounds = [0]
        for tgt in targets[:-1]:
            bounds.append(int(np.searchsorted(emb_offsets_global, tgt)))
        bounds.append(P_total)
        pid_base = np.asarray(bounds[:-1], np.int64)
        Ps_max = max(1, max(bounds[s + 1] - bounds[s] for s in range(ndev)))
        Ns_max = max(1, max(
            int(emb_offsets_global[bounds[s + 1]] - emb_offsets_global[bounds[s]])
            for s in range(ndev)
        ))

        deleted_pids = (
            np.asarray(deleted_pids, np.int64)
            if deleted_pids is not None else np.zeros((0,), np.int64)
        )
        owned = launch.owned_data_shards(mesh) if multihost else list(range(ndev))
        centroids = np.asarray(centroids, np.float32)

        # pass 1 — per owned shard: slice rows, local IVF, balanced split,
        # then pad + upload the BIG per-shard arrays (codes / residuals /
        # IVF / doclens / offsets — their padded shapes derive from doclens
        # metadata alone) immediately and FREE the host rows before the
        # next shard: peak host RSS stays ~one shard, not the whole index
        # (launch.ShardStackBuilder). Only the tiny probe tables, whose
        # padded width K_max needs the host-level agreement below, are
        # retained between passes.
        # Pad rows of the probe table are UNSELECTABLE: each shard carries
        # its valid-cell count and the search masks pad columns to -inf
        # before top_k (a pad duplicating any real cell would tie with it
        # and crowd distinct cells out of the probe slots).
        max_doclen = int(doclens.max()) if P_total else 1
        max_doclen = max(32, -(-max_doclen // 32) * 32)
        # tail pads mirror DeviceIndex.build: max_doclen zeroed rows on
        # codes/residuals (stage-2 per-candidate dynamic_slice windows)
        # and IVF_PAD sentinel entries on the IVF (per-cell slice reads)
        wdtype = np.uint32 if nbytes % 4 == 0 else np.uint8
        nwords = nbytes // wdtype().itemsize
        big = {
            "codes": launch.ShardStackBuilder(
                mesh, (Ns_max + max_doclen,), np.uint32),
            # flat word-typed per shard (DeviceIndex.residuals layout):
            # stage-2 reads each candidate's packed rows as ONE contiguous
            # dynamic_slice burst
            "residuals": launch.ShardStackBuilder(
                mesh, ((Ns_max + max_doclen) * nwords,), wdtype),
            "ivf": launch.ShardStackBuilder(
                mesh, (Ns_max + IVF_PAD,), np.int32),
            "doclens": launch.ShardStackBuilder(
                mesh, (Ps_max + 1,), np.int32),
            "emb_offsets": launch.ShardStackBuilder(
                mesh, (Ps_max + 1,), np.int32),
        }
        probe_tables: dict[int, tuple] = {}
        K_per_shard = np.zeros(ndev, np.int64)
        dup_per_shard = np.ones(ndev, np.int64)
        split_mass_per_shard = np.zeros(ndev, np.float64)
        for s in owned:
            p0, p1 = bounds[s], bounds[s + 1]
            e0, e1 = int(emb_offsets_global[p0]), int(emb_offsets_global[p1])
            dl = doclens[p0:p1].astype(np.int32)
            if stream_from is not None:
                local_codes, local_res = fmt.read_embedding_rows(
                    stream_from, e0, e1
                )
            else:
                local_codes = codes[e0:e1].astype(np.uint32)
                local_res = residuals[e0:e1]
            # exclude tombstoned pids from the local IVF: their rows sort
            # into a virtual overflow cell past the last partition that no
            # probe-table row addresses (native counting sort w/ numpy
            # fallback)
            local_del = deleted_pids[(deleted_pids >= p0) & (deleted_pids < p1)]
            local_del_eids = np.concatenate([
                np.arange(emb_offsets_global[p] - e0,
                          emb_offsets_global[p] - e0 + doclens[p])
                for p in local_del
            ] or [np.zeros(0, np.int64)]).astype(np.int64)
            ivf_local, ivf_len = build_ivf_excluding(
                local_codes, k, local_del_eids
            )
            offs0 = np.concatenate([[0], np.cumsum(ivf_len)])[:-1]
            if balance_cap is not None and len(ivf_len) and (
                int(ivf_len.max()) > balance_cap
            ):
                sl, so, origin, dup = balance_cells(ivf_len, offs0, balance_cap)
                dup_per_shard[s] = dup
                split_mass_per_shard[s] = split_mass_fraction(
                    ivf_len, balance_cap
                )
            else:
                sl = np.asarray(ivf_len, np.int32)
                so = offs0.astype(np.int32)
                origin = np.arange(len(ivf_len), dtype=np.int32)
            probe_tables[s] = (sl, so, origin)
            K_per_shard[s] = len(sl)

            # pad + upload this shard's big arrays now, then drop the rows
            Ns, Ps = len(local_codes), len(dl)
            sent_eid, sent_pid = Ns_max, Ps_max
            codes_p = np.zeros(Ns_max + max_doclen, np.uint32)
            codes_p[:Ns] = local_codes
            big["codes"].add(s, codes_p)
            del codes_p, local_codes
            res_p = np.zeros((Ns_max + max_doclen, nbytes), np.uint8)
            res_p[:Ns] = local_res
            big["residuals"].add(s, res_p.reshape(-1).view(wdtype))
            del res_p, local_res
            e2p = np.full(Ns_max + 1, sent_pid, np.int32)
            e2p[:Ns] = np.repeat(np.arange(Ps, dtype=np.int32), dl)
            # local IVF carries PIDS (one stage-1 read, not two)
            ivf_p = np.full(Ns_max + IVF_PAD, sent_eid, np.int32)
            ivf_p[:Ns] = ivf_local
            big["ivf"].add(s, e2p[ivf_p])
            del ivf_p, ivf_local, e2p
            offs = np.full(Ps_max + 1, sent_eid, np.int32)
            offs[:Ps] = np.concatenate([[0], np.cumsum(dl[:-1])]) if Ps else 0
            big["emb_offsets"].add(s, offs)
            dl_p = np.zeros(Ps_max + 1, np.int32)
            dl_p[:Ps] = dl
            big["doclens"].add(s, dl_p)

        # probe-table width / dup bound must agree across hosts; a tiny
        # host-level all-gather settles them (a shard replicated over the
        # model axis may be built by several processes — deterministically
        # identically, so max() is exact)
        if multihost:
            from jax.experimental import multihost_utils

            K_per_shard = multihost_utils.process_allgather(
                K_per_shard
            ).reshape(-1, ndev).max(axis=0)
            dup_per_shard = multihost_utils.process_allgather(
                dup_per_shard
            ).reshape(-1, ndev).max(axis=0)
            split_mass_per_shard = multihost_utils.process_allgather(
                split_mass_per_shard
            ).reshape(-1, ndev).max(axis=0)
        K_max = int(max(k, K_per_shard.max()))
        probe_dup_max = int(dup_per_shard.max())
        probe_split_mass = float(split_mass_per_shard.max())
        min_ncells = int(K_per_shard.min())

        # pass 2 — pad the retained probe tables to the agreed width and
        # upload them
        small = {
            "ivf_offsets": launch.ShardStackBuilder(mesh, (K_max,), np.int32),
            "ivf_lengths": launch.ShardStackBuilder(mesh, (K_max,), np.int32),
            "probe_cents": launch.ShardStackBuilder(
                mesh, (K_max, centroids.shape[1]), np.float32),
            "n_cells": launch.ShardStackBuilder(mesh, (1,), np.int32),
        }
        for s, (sl, so, origin) in probe_tables.items():
            small["ivf_offsets"].add(s, _pad_to(so, K_max, 0))
            small["ivf_lengths"].add(s, _pad_to(sl, K_max, 0))
            small["probe_cents"].add(s, centroids[_pad_to(origin, K_max, 0)])
            small["n_cells"].add(s, np.asarray([len(sl)], np.int32))
        stacked = {name: b.build() for name, b in {**big, **small}.items()}

        return cls(
            mesh=mesh,
            centroids=launch.put_replicated(centroids, mesh),
            bucket_weights=launch.put_replicated(
                np.asarray(bucket_weights, np.float32), mesh
            ),
            pid_base=pid_base,
            shard_passages=Ps_max,
            n_passages=P_total,
            nbits=nbits,
            max_doclen=max_doclen,
            min_ncells=min_ncells,
            probe_dup_max=probe_dup_max,
            probe_split_mass=probe_split_mass,
            **stacked,
        )

    # ------------------------------------------------------------------

    def compensated_nprobe(self, nprobe: int, *, saturate: float = 0.05) -> int:
        """See :meth:`DeviceIndex.compensated_nprobe`."""
        from colbert_tpu.retrieval.device_index import probe_compensation

        return nprobe + probe_compensation(
            self.probe_dup_max, self.probe_split_mass, saturate=saturate
        )

    def search_Q_batch(
        self, Q: jax.Array, *, k: int, nprobe: int, ncandidates: int,
        cell_cap: int = 1024, max_candidates: int = 8192,
        centroid_threshold: float | None = None,
        stage1_refine: bool = True,
        refine_width: int = 4,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Queries (B, Lq, dim) -> (pids (B, k), scores (B, k)), exact merge
        of per-shard top-k results."""
        return self.finalize(self.search_Q_batch_async(
            Q, k=k, nprobe=nprobe, ncandidates=ncandidates,
            cell_cap=cell_cap, max_candidates=max_candidates,
            centroid_threshold=centroid_threshold,
            stage1_refine=stage1_refine, refine_width=refine_width,
        ))

    def search_Q_batch_async(
        self, Q: jax.Array, *, k: int, nprobe: int, ncandidates: int,
        cell_cap: int = 1024, max_candidates: int = 8192,
        centroid_threshold: float | None = None,
        stage1_refine: bool = True,
        refine_width: int = 4,
    ) -> PendingShardSearch:
        """Dispatch the sharded search WITHOUT blocking -> handle for
        :meth:`finalize`. JAX dispatch is asynchronous, so serving can keep
        the next batch's program in flight while this one executes
        (``Searcher.launch_search``/``search_stream`` pipeline through
        this, exactly like the single-device backend)."""
        B, Lq, _ = Q.shape
        ndev = self.mesh.shape["data"]
        max_candidates = min(max_candidates, Lq * nprobe * cell_cap)
        ncand = min(ncandidates, max_candidates)
        k_local = min(k, ncand)

        fn = _sharded_search_fn(
            self.mesh, sentinel_pid=self.shard_passages, nbits=self.nbits,
            max_doclen=self.max_doclen, k=k_local, nprobe=nprobe,
            ncandidates=ncand, cell_cap=cell_cap, max_candidates=max_candidates,
            centroid_threshold=centroid_threshold, stage1_refine=stage1_refine,
            refine_width=refine_width,
        )
        from colbert_tpu.parallel import launch

        # keep Q on device: np.asarray here would pull an already-uploaded
        # query batch back over the tunnel (~100ms D2H) every warm batch;
        # put_replicated's single-process path device_puts a jax.Array
        # directly (device-to-device)
        local_pids, local_scores, _overflow = fn(
            launch.put_replicated(jnp.asarray(Q, jnp.float32), self.mesh),
            self.centroids, self.probe_cents, self.codes, self.residuals,
            self.ivf, self.ivf_offsets, self.ivf_lengths,
            self.doclens, self.emb_offsets, self.bucket_weights, self.n_cells,
        )
        return PendingShardSearch(local_pids, local_scores, k)

    def finalize(
        self, pending: PendingShardSearch
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Block on a :meth:`search_Q_batch_async` launch -> (pids, scores).

        Host merge of the all_gathered (D, B, k_local) tables -> global
        pids, top-k per query. The in-program all_gather makes the outputs
        fully replicated, so every pod host computes the same merge."""
        return merge_shard_topk(
            np.asarray(pending.local_pids), np.asarray(pending.local_scores),
            self.pid_base, self.shard_passages, pending.k)


def merge_shard_topk(
    lp: np.ndarray, ls: np.ndarray, pid_base: np.ndarray,
    sentinel_pid: int, k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge per-shard (D, B, k_local) top-k tables into global (B, k):
    shard-local pids -> global via ``pid_base``, sentinel rows masked,
    numpy sort of the D*k_local pairs per query. Factored out so the
    sharded bench times THIS code, not a proxy."""
    D, B2, kl = lp.shape
    valid = lp != sentinel_pid
    gp = lp.astype(np.int64) + np.asarray(pid_base)[:, None, None]
    gp = np.where(valid, gp, -1)
    ls = np.where(valid, ls, -np.inf)
    flat_p = gp.transpose(1, 0, 2).reshape(B2, D * kl)
    flat_s = ls.transpose(1, 0, 2).reshape(B2, D * kl)
    order = np.argsort(-flat_s, axis=1)[:, :k]
    out_p = np.take_along_axis(flat_p, order, 1)
    out_s = np.take_along_axis(flat_s, order, 1).astype(np.float32)
    out_p[~np.isfinite(out_s)] = -1
    return out_p, out_s


def _sharded_search_fn(mesh, **static):
    """Cached per (mesh, static search geometry): the jitted shard_map search
    program compiles ONCE per geometry — rebuilding it per call would retrace
    and recompile the whole sharded pipeline every batch (serving-fatal)."""
    return _sharded_search_fn_cached(mesh, tuple(sorted(static.items())))


@functools.lru_cache(maxsize=32)
def _sharded_search_fn_cached(mesh, static_items):
    static = dict(static_items)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),              # Q replicated
            P(),              # centroids (codec table)
            P("data"),        # probe_cents (per-shard probe table)
            P("data"), P("data"), P("data"), P("data"), P("data"),
            P("data"), P("data"),
            P(),              # bucket_weights
            P("data"),        # n_cells (valid probe rows per shard)
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def search(Q, centroids, probe_cents, codes, residuals, ivf,
               ivf_offsets, ivf_lengths, doclens, emb_offsets,
               bucket_weights, n_cells):
        # local shard arrays arrive with a leading length-1 device axis.
        # Probe ALL queries flat against this shard's probe table first
        # (one big MXU matmul — see device_index._probe_topk), then vmap
        # the per-query core with the probed cells as batched inputs.
        B, Lq, dim = Q.shape
        nprobe = static["nprobe"]
        ps, cl = _probe_topk(
            Q.reshape(B * Lq, dim), probe_cents[0], nprobe=nprobe,
            probe_ncells=n_cells[0, 0],
        )
        ps = ps.reshape(B, Lq, nprobe)
        cl = cl.reshape(B, Lq, nprobe)

        def one(q, p, c):
            return _search_core(
                q, p, c, centroids, codes[0], residuals[0], ivf[0],
                ivf_offsets[0], ivf_lengths[0], doclens[0],
                emb_offsets[0], bucket_weights, probe_ncells=n_cells[0, 0],
                **static,
            )

        pids, scores, overflow = jax.vmap(one)(Q, ps, cl)   # (B, k)
        # all_gather the tiny per-shard top-k tables (D*B*k ids+scores —
        # bytes, rides ICI/DCN): outputs land fully replicated, so the host
        # merge needs no cross-process transfer and every pod host returns
        # identical results
        return (
            jax.lax.all_gather(pids, "data"),      # (D, B, k)
            jax.lax.all_gather(scores, "data"),
            jax.lax.all_gather(overflow, "data"),
        )

    return jax.jit(search)
