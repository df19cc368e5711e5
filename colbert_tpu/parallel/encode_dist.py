"""Data-parallel encoding: the batch axis sharded over the mesh.

SURVEY §2 replacement table: the reference's serial chunk loop
(collection_indexer.jl:277-296) becomes a pjit-style sharded forward —
params replicated, the token batch split over the ``data`` axis; XLA inserts
no collectives in the forward (embarrassingly parallel), so throughput
scales linearly over ICI-connected chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colbert_tpu.models.bert import BertConfig
from colbert_tpu.models.colbert import ColBERTParams, encode_batch

__all__ = ["shard_params", "encode_batch_dp", "pad_batch_to_mesh"]


def shard_params(params: ColBERTParams, mesh: Mesh) -> ColBERTParams:
    """Replicate encoder params over the mesh (model axis reserved for TP)."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), params)


def pad_batch_to_mesh(arrs: list[np.ndarray], ndev: int) -> tuple[list[np.ndarray], int]:
    """Pad the leading batch dim to a multiple of ``ndev`` (zero rows)."""
    n = arrs[0].shape[0]
    padded = -(-n // ndev) * ndev
    if padded == n:
        return arrs, n
    out = []
    for a in arrs:
        pad = [(0, padded - n)] + [(0, 0)] * (a.ndim - 1)
        out.append(np.pad(a, pad))
    return out, n


def encode_batch_dp(
    params: ColBERTParams,
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    keep_mask: np.ndarray,
    mesh: Mesh,
    *,
    cfg: BertConfig,
    dtype_name: str = "bfloat16",
) -> np.ndarray:
    """Sharded doc/query forward -> normalized fp32 embeddings (B, L, dim).

    The batch is padded to the data-axis size; padded rows have all-False
    keep masks so their embeddings are zero.
    """
    ndev = mesh.shape["data"]
    (ids_p, am_p, km_p), n = pad_batch_to_mesh(
        [np.asarray(input_ids), np.asarray(attention_mask), np.asarray(keep_mask)], ndev
    )
    dsh = NamedSharding(mesh, P("data"))
    ids_d = jax.device_put(ids_p, dsh)
    am_d = jax.device_put(am_p, dsh)
    km_d = jax.device_put(km_p, dsh)
    out = encode_batch(params, ids_d, am_d, km_d, cfg=cfg, dtype_name=dtype_name)
    return np.asarray(out)[:n]
