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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colbert_tpu.retrieval.device_index import _search_core

__all__ = ["ShardedDeviceIndex"]


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
    codes: jax.Array           # (D, Ns+1) sharded on axis 0
    residuals: jax.Array       # (D, Ns+1, nbytes)
    ivf: jax.Array             # (D, Ns+1) local PIDS grouped by cell (eids
                               # mapped at build, like DeviceIndex)
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

    @classmethod
    def build(
        cls,
        mesh: Mesh,
        *,
        centroids: np.ndarray,
        codes: np.ndarray,
        residuals: np.ndarray,
        doclens: np.ndarray,
        bucket_weights: np.ndarray,
        nbits: int,
        balance_cap: int | None = None,
        deleted_pids: np.ndarray | None = None,
    ) -> "ShardedDeviceIndex":
        """Partition passages contiguously into ``mesh.shape['data']`` shards
        and build each shard's local IVF from its codes slice.
        ``balance_cap`` splits oversized local cells per shard (see
        :func:`colbert_tpu.retrieval.device_index.balance_cells`).
        ``deleted_pids`` (IndexUpdater tombstones) are excluded from every
        shard's local IVF, so their embeddings can never become candidates."""
        ndev = mesh.shape["data"]
        P_total = len(doclens)
        k = centroids.shape[0]
        nbytes = residuals.shape[1]
        emb_offsets_global = np.concatenate([[0], np.cumsum(doclens)]).astype(np.int64)

        # contiguous passage ranges with ~equal embedding counts
        total_embs = int(doclens.sum())
        targets = [(s + 1) * total_embs / ndev for s in range(ndev)]
        bounds = [0]
        for tgt in targets[:-1]:
            bounds.append(int(np.searchsorted(emb_offsets_global, tgt)))
        bounds.append(P_total)
        pid_base = np.asarray(bounds[:-1], np.int64)

        deleted_pids = (
            np.asarray(deleted_pids, np.int64)
            if deleted_pids is not None else np.zeros((0,), np.int64)
        )
        shards = []
        Ps_max, Ns_max = 1, 1
        for s in range(ndev):
            p0, p1 = bounds[s], bounds[s + 1]
            e0, e1 = emb_offsets_global[p0], emb_offsets_global[p1]
            dl = doclens[p0:p1].astype(np.int32)
            local_codes = codes[e0:e1].astype(np.uint32)
            local_res = residuals[e0:e1]
            # exclude tombstoned pids from the local IVF: their rows sort
            # into a virtual overflow cell past the last partition that no
            # probe-table row addresses (updater.build_ivf_excluding — the
            # native counting sort with numpy fallback)
            from colbert_tpu.indexing.updater import build_ivf_excluding

            local_del = deleted_pids[(deleted_pids >= p0) & (deleted_pids < p1)]
            local_del_eids = np.concatenate([
                np.arange(emb_offsets_global[p] - e0,
                          emb_offsets_global[p] - e0 + doclens[p])
                for p in local_del
            ] or [np.zeros(0, np.int64)]).astype(np.int64)
            ivf_local, ivf_len = build_ivf_excluding(
                local_codes, k, local_del_eids
            )
            shards.append((dl, local_codes, local_res, ivf_local, ivf_len))
            Ps_max = max(Ps_max, len(dl))
            Ns_max = max(Ns_max, len(local_codes))

        # pad every shard to (Ps_max, Ns_max) and add sentinels (see
        # DeviceIndex.build for the sentinel scheme)
        from colbert_tpu.retrieval.device_index import balance_cells

        centroids = np.asarray(centroids, np.float32)
        # per-shard balanced split (lengths/offsets/origin); pad the probe
        # tables to a common K' across shards. Pad rows are UNSELECTABLE:
        # each shard carries its valid-cell count and the search masks pad
        # columns to -inf before top_k (a pad duplicating any real cell would
        # tie with it and crowd distinct cells out of the probe slots).
        splits = []
        probe_dup_max = 1
        K_max = k
        for _, _, _, _, ivf_len in shards:
            offs0 = np.concatenate([[0], np.cumsum(ivf_len)])[:-1]
            if balance_cap is not None and len(ivf_len) and (
                int(ivf_len.max()) > balance_cap
            ):
                sl, so, origin, dup = balance_cells(ivf_len, offs0, balance_cap)
                probe_dup_max = max(probe_dup_max, dup)
            else:
                sl = np.asarray(ivf_len, np.int32)
                so = offs0.astype(np.int32)
                origin = np.arange(len(ivf_len), dtype=np.int32)
            splits.append((sl, so, origin))
            K_max = max(K_max, len(sl))

        A = {
            "codes": [], "residuals": [], "ivf": [], "ivf_offsets": [],
            "ivf_lengths": [], "doclens": [], "emb_offsets": [],
            "probe_cents": [], "n_cells": [],
        }
        min_ncells = K_max
        for (dl, lc, lr, ivf_local, ivf_len), (sl, so, origin) in zip(shards, splits):
            Ns, Ps = len(lc), len(dl)
            sent_eid, sent_pid = Ns_max, Ps_max
            codes_p = np.zeros(Ns_max + 1, np.uint32)
            codes_p[:Ns] = lc
            res_p = np.zeros((Ns_max + 1, nbytes), np.uint8)
            res_p[:Ns] = lr
            e2p = np.full(Ns_max + 1, sent_pid, np.int32)
            e2p[:Ns] = np.repeat(np.arange(Ps, dtype=np.int32), dl)
            # local IVF carries PIDS (one stage-1 gather, not two)
            ivf_p = np.full(Ns_max + 1, sent_eid, np.int32)
            ivf_p[:Ns] = ivf_local
            ivf_p = e2p[ivf_p]
            offs = np.full(Ps_max + 1, sent_eid, np.int32)
            offs[:Ps] = np.concatenate([[0], np.cumsum(dl[:-1])]) if Ps else 0
            dl_p = np.zeros(Ps_max + 1, np.int32)
            dl_p[:Ps] = dl
            A["codes"].append(codes_p)
            A["residuals"].append(res_p)
            A["ivf"].append(ivf_p)
            A["ivf_offsets"].append(_pad_to(so, K_max, 0))
            A["ivf_lengths"].append(_pad_to(sl, K_max, 0))
            A["probe_cents"].append(
                centroids[_pad_to(origin, K_max, 0)]
            )
            A["n_cells"].append(np.asarray([len(sl)], np.int32))
            min_ncells = min(min_ncells, len(sl))
            A["doclens"].append(dl_p)
            A["emb_offsets"].append(offs)

        dsh = lambda: NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        stacked = {
            name: jax.device_put(np.stack(vals), dsh()) for name, vals in A.items()
        }
        max_doclen = int(doclens.max()) if P_total else 1
        max_doclen = max(32, -(-max_doclen // 32) * 32)

        return cls(
            mesh=mesh,
            centroids=jax.device_put(centroids, repl),
            bucket_weights=jax.device_put(np.asarray(bucket_weights, np.float32), repl),
            pid_base=pid_base,
            shard_passages=Ps_max,
            n_passages=P_total,
            nbits=nbits,
            max_doclen=max_doclen,
            min_ncells=min_ncells,
            probe_dup_max=probe_dup_max,
            **stacked,
        )

    # ------------------------------------------------------------------

    def search_Q_batch(
        self, Q: jax.Array, *, k: int, nprobe: int, ncandidates: int,
        cell_cap: int = 1024, max_candidates: int = 8192,
        centroid_threshold: float | None = None,
        stage1_refine: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Queries (B, Lq, dim) -> (pids (B, k), scores (B, k)), exact merge
        of per-shard top-k results."""
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
        )
        repl = NamedSharding(self.mesh, P())
        local_pids, local_scores, _overflow = fn(
            jax.device_put(Q, repl),
            self.centroids, self.probe_cents, self.codes, self.residuals,
            self.ivf, self.ivf_offsets, self.ivf_lengths,
            self.doclens, self.emb_offsets, self.bucket_weights, self.n_cells,
        )
        # host merge: (D, B, k_local) -> global pids, top-k per query
        lp = np.asarray(local_pids)     # (D, B, kl)
        ls = np.asarray(local_scores)
        D, B2, kl = lp.shape
        valid = lp != self.shard_passages
        gp = lp.astype(np.int64) + self.pid_base[:, None, None]
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
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )
    def search(Q, centroids, probe_cents, codes, residuals, ivf,
               ivf_offsets, ivf_lengths, doclens, emb_offsets,
               bucket_weights, n_cells):
        # local shard arrays arrive with a leading length-1 device axis
        def one(q):
            return _search_core(
                q, centroids, probe_cents[0], codes[0], residuals[0], ivf[0],
                ivf_offsets[0], ivf_lengths[0], doclens[0],
                emb_offsets[0], bucket_weights, probe_ncells=n_cells[0, 0],
                **static,
            )

        pids, scores, overflow = jax.vmap(one)(Q)   # (B, k)
        return pids[None], scores[None], overflow[None]  # re-add device axis

    return jax.jit(search)
