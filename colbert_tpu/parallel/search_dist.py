"""Sharded search: candidate scoring split over the mesh + top-k merge.

SURVEY §2 replacement table: the reference's single-query, single-device
``maxsim`` (ranking.jl:69-87) becomes device-local candidate scoring over the
``data`` axis with an on-device per-shard ``lax.top_k`` and a cross-shard
merge — the collective is one small ``all_gather`` of (k, score) pairs, not
the candidate embeddings.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colbert_tpu.ops import codec as codec_ops
from colbert_tpu.ops.maxsim import maxsim_scores

__all__ = ["score_full_sharded_topk"]


@functools.lru_cache(maxsize=32)
def _scorer(mesh: Mesh, nbits: int, k: int, pid_chunk: int):
    """Cached per geometry so repeated calls reuse the compiled program."""
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P(), P()),
        out_specs=(P(None, "data"), P(None, "data")),
        check_vma=False,
    )
    def score(Q, codes_g, residuals_g, dmask, centroids, bucket_weights):
        Pl, Ld = codes_g.shape
        embs = codec_ops.decompress(
            codes_g.reshape(Pl * Ld),
            residuals_g.reshape(Pl * Ld, -1),
            centroids,
            bucket_weights,
            nbits=nbits,
        )
        scores = maxsim_scores(
            Q, embs.reshape(Pl, Ld, -1), dmask, pid_chunk=pid_chunk
        )  # (B, P_local)
        top, idx = jax.lax.top_k(scores, k)  # device-local top-k
        # local candidate row -> global row offset
        shard = jax.lax.axis_index("data")
        gidx = idx + shard * Pl
        return top, gidx

    return jax.jit(score)


def score_full_sharded_topk(
    Q: jax.Array,             # (B, Lq, dim)
    codes_g: np.ndarray,      # (P, Ld) uint32, P divisible by data-axis size
    residuals_g: np.ndarray,  # (P, Ld, nbytes) uint8
    dmask: np.ndarray,        # (P, Ld) bool
    centroids: jax.Array,
    bucket_weights: jax.Array,
    mesh: Mesh,
    *,
    nbits: int,
    k: int,
    pid_chunk: int = 128,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (scores (B, k), candidate-row indices (B, k)) after cross-shard merge."""
    ndev = mesh.shape["data"]
    if codes_g.shape[0] % ndev:
        raise ValueError("candidate rows must divide the data axis; pad first")
    k_local = min(k, codes_g.shape[0] // ndev)
    dsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    top, gidx = _scorer(mesh, nbits, k_local, pid_chunk)(
        jax.device_put(Q, repl),
        jax.device_put(np.asarray(codes_g), dsh),
        jax.device_put(np.asarray(residuals_g), dsh),
        jax.device_put(np.asarray(dmask), dsh),
        jax.device_put(centroids, repl),
        jax.device_put(bucket_weights, repl),
    )
    # host-side final merge of ndev * k_local partial winners
    top = np.asarray(top)    # (B, ndev * k_local)
    gidx = np.asarray(gidx)
    order = np.argsort(-top, axis=1)[:, :k]
    return np.take_along_axis(top, order, 1), np.take_along_axis(gidx, order, 1)
