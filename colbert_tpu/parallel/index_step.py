"""The full index-build inner step as ONE jitted multi-device program.

This is the framework's 'training step': encode a sharded token batch with
the replicated encoder, flatten to token embeddings, update the k-means
centroids from them (psum'd Lloyd statistics over the data axis), and
compress the embeddings against the current centroids. One compile, three
collectives-worth of communication (two psums + nothing for the forward).

Used by the multi-chip dry-run (``__graft_entry__.dryrun_multichip``) and as
the template for pod-scale index builds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from colbert_tpu.models.bert import BertConfig, bert_encode
from colbert_tpu.ops import codec as codec_ops
from colbert_tpu.ops import kmeans as kmeans_ops

__all__ = ["make_index_train_step"]


def make_index_train_step(
    mesh: Mesh, cfg: BertConfig, *, nbits: int, num_partitions: int,
    dtype_name: str = "bfloat16",
):
    """Build the jitted sharded step.

    Signature of the returned fn:
      (params, input_ids (B,L), attention_mask, keep_mask,
       centroids (k,dim), bucket_cutoffs) ->
      (codes (B*L,) sharded, residuals (B*L, nbytes) sharded,
       new_centroids (k,dim) replicated, shift scalar)
    ``B`` must divide the data-axis size.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P(), P()),
        out_specs=(P("data"), P("data"), P(), P()),
        check_vma=False,
    )
    def step(params, ids, mask, keep, centroids, cutoffs):
        hidden = bert_encode(params["bert"], ids, mask, cfg=cfg, dtype_name=dtype_name)
        emb = jnp.dot(hidden.astype(jnp.float32), params["linear"]["kernel"])
        if "bias" in params["linear"]:
            emb = emb + params["linear"]["bias"]
        emb = emb * keep[..., None]
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        Bl, L, dim = emb.shape
        flat = emb.reshape(Bl * L, dim)
        w = keep.reshape(Bl * L).astype(jnp.float32)

        # codec training statistics (Lloyd) with cross-device psum
        sums, counts = kmeans_ops.lloyd_stats(
            flat, centroids, k=num_partitions, bsize=max(128, Bl * L), weights=w
        )
        sums = jax.lax.psum(sums, "data")
        counts = jax.lax.psum(counts, "data")
        new_centroids = kmeans_ops.centroids_from_stats(sums, counts, centroids)
        shift = jnp.max(jnp.abs(new_centroids - centroids.astype(jnp.float32)))

        # compression against current centroids
        codes = codec_ops.compress_into_codes(flat, centroids, bsize=max(128, Bl * L))
        residuals = codec_ops.compress_residuals(
            flat, centroids[codes.astype(jnp.int32)], cutoffs, nbits=nbits
        )
        return codes, residuals, new_centroids, shift

    return jax.jit(step)
