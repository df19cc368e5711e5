"""ColBERT encoder: BERT + linear projection head + embedding post-processing.

Reference semantics (src/modelling/checkpoint.jl):
  - ``doc()`` = ``linear(bert(ids, mask))`` -> per-token ``dim`` embeddings
    (checkpoint.jl:21-25),
  - doc pipeline: zero skiplist-token embeddings (punctuation + pad),
    L2-normalize, doclens = attended-token counts (checkpoint.jl:27-52),
  - query pipeline: zero pad embeddings, L2-normalize, keep the fixed
    ``(query_maxlen, dim)`` shape (checkpoint.jl:54-71).

TPU-first deviations: the forward is one jitted program (no per-batch GPU->CPU
staging, the reference's measured bottleneck — SURVEY §3.5); outputs stay
fixed-shape ``(B, L, dim)`` + a keep-mask, and flattening/compaction happens
host-side in numpy (XLA static shapes).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.models.bert import BertConfig, BertParams, bert_encode, init_bert_params

__all__ = [
    "ColBERTParams",
    "init_colbert_params",
    "encode_batch",
    "encode_compact_batch",
    "encode_compress_batch",
    "encode_compress_compact_batch",
    "compact_doc_embeddings",
]

ColBERTParams = Dict[str, Any]  # {"bert": BertParams, "linear": {"kernel", "bias"?}}


def init_colbert_params(
    key: jax.Array, cfg: BertConfig, dim: int = 128, *, linear_bias: bool = False
) -> ColBERTParams:
    """Random ColBERT params (BERT + hidden->dim head) for tests/benchmarks."""
    kb, kl = jax.random.split(key)
    linear = {"kernel": 0.02 * jax.random.normal(kl, (cfg.hidden_size, dim), jnp.float32)}
    if linear_bias:
        linear["bias"] = jnp.zeros((dim,), jnp.float32)
    return {"bert": init_bert_params(kb, cfg), "linear": linear}


def _forward_normalized(
    params: ColBERTParams,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    keep_mask: jax.Array,
    *,
    cfg: BertConfig,
    dtype_name: str,
    use_flash: bool = False,
    remat: bool = False,
) -> jax.Array:
    hidden = bert_encode(
        params["bert"], input_ids, attention_mask, cfg=cfg, dtype_name=dtype_name,
        use_flash=use_flash, remat=remat,
    )
    lin = params["linear"]
    # project in the activation dtype (MXU-friendly), accumulate fp32
    emb = jnp.dot(
        hidden, lin["kernel"].astype(hidden.dtype),
        preferred_element_type=jnp.float32,
    )
    if "bias" in lin:
        emb = emb + lin["bias"]
    emb = emb * keep_mask[..., None]
    # clamp INSIDE the sqrt: masked positions are exactly zero, and
    # sqrt'(0)=inf would turn their (otherwise unused) cotangents into NaN
    # grads under jax.grad (training); max(norm, eps) outside would not
    # stop the 0*inf. Forward-identical for nonzero rows.
    sq = jnp.sum(emb * emb, axis=-1, keepdims=True)
    return emb / jnp.sqrt(jnp.maximum(sq, 1e-24))


@partial(jax.jit, static_argnames=("cfg", "dtype_name", "use_flash",
                                   "out_dtype_name", "remat"))
def encode_batch(
    params: ColBERTParams,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    keep_mask: jax.Array,
    *,
    cfg: BertConfig,
    dtype_name: str = "bfloat16",
    use_flash: bool = False,
    out_dtype_name: str = "float32",
    remat: bool = False,
) -> jax.Array:
    """Shared doc/query forward -> normalized embeddings ``(B, L, dim)``.

    ``keep_mask`` selects which token positions survive: for docs it is
    ``attention_mask & ~skiplist(ids)`` (punctuation/pad removal,
    reference: embedding_utils.jl:172-193); for queries it covers all
    positions except pads-that-weren't-MASK-augmented (in practice: all).
    Positions outside ``keep_mask`` are zeroed *before* normalization, so
    kept embeddings are unit-norm and dropped ones are exactly zero.

    Normalization always runs in fp32; ``out_dtype_name`` converts the
    result inside the same program (the D2H transfer is the bottleneck of
    ``encode_passages`` on a tunneled chip): float dtypes are a plain cast,
    ``"int8"`` emits ``round(x * 127)`` — embeddings are unit-norm so every
    component is in [-1, 1] and the quantization step (1/127) sits at bf16's
    own rounding level while halving bf16's bytes again. Hosts dequantize
    with ``x / 127``.
    """
    emb = _forward_normalized(
        params, input_ids, attention_mask, keep_mask, cfg=cfg, dtype_name=dtype_name,
        use_flash=use_flash, remat=remat,
    )
    if out_dtype_name == "int8":
        return jnp.clip(jnp.round(emb * 127.0), -127, 127).astype(jnp.int8)
    return emb.astype(jnp.dtype(out_dtype_name))


@partial(jax.jit, static_argnames=("cfg", "dtype_name", "nbits", "use_flash"))
def encode_compress_batch(
    params: ColBERTParams,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    keep_mask: jax.Array,
    centroids: jax.Array,
    bucket_cutoffs: jax.Array,
    *,
    cfg: BertConfig,
    dtype_name: str = "bfloat16",
    nbits: int = 2,
    use_flash: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused doc forward + residual compression, one device program.

    -> (codes (B, L) uint32, packed residuals (B, L, dim//8*nbits) uint8).

    TPU-native indexing hot path: the fp32 embeddings never leave the
    device — only the ~14x smaller compressed artifacts do. (The reference
    ships fp32 embeddings to the CPU per batch and compresses there —
    checkpoint.jl:166-188 + residual.jl:586-604.) Masked positions produce
    garbage codes; callers drop them via ``keep_mask``.
    """
    from colbert_tpu.ops import codec as codec_ops

    emb = _forward_normalized(
        params, input_ids, attention_mask, keep_mask, cfg=cfg, dtype_name=dtype_name,
        use_flash=use_flash,
    )
    B, L, dim = emb.shape
    flat = emb.reshape(B * L, dim)
    codes = codec_ops.compress_into_codes(flat, centroids, bsize=1024)
    residuals = codec_ops.compress_residuals(
        flat, centroids[codes.astype(jnp.int32)], bucket_cutoffs, nbits=nbits
    )
    return codes.reshape(B, L), residuals.reshape(B, L, -1)


@partial(jax.jit, static_argnames=("cfg", "dtype_name", "use_flash",
                                   "out_dtype_name"))
def encode_compact_batch(
    params: ColBERTParams,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    keep_mask: jax.Array,
    take_idx: jax.Array,
    *,
    cfg: BertConfig,
    dtype_name: str = "bfloat16",
    use_flash: bool = False,
    out_dtype_name: str = "float32",
) -> jax.Array:
    """``encode_batch`` fused with keep-row compaction -> ``(M, dim)``.

    ``take_idx`` (M,) int32 holds the flat row-major positions of the kept
    tokens in the ``(B·L)`` grid — host-computed from the keep mask before
    dispatch (padding slots duplicate row 0; callers slice to the real
    count). Shipping only kept rows cuts D2H bytes by the pad+skiplist
    fraction — the wire, not the forward, bounds ``encode_passages`` on a
    tunneled chip. The gather is a batched-INDEX lookup into a shared
    operand (the cheap kind — see docs/design.md §5); M is bucketed so the
    program shape set stays closed.
    """
    emb = _forward_normalized(
        params, input_ids, attention_mask, keep_mask, cfg=cfg,
        dtype_name=dtype_name, use_flash=use_flash,
    )
    comp = emb.reshape(-1, emb.shape[-1])[take_idx]
    if out_dtype_name == "int8":
        return jnp.clip(jnp.round(comp * 127.0), -127, 127).astype(jnp.int8)
    return comp.astype(jnp.dtype(out_dtype_name))


@partial(jax.jit, static_argnames=("cfg", "dtype_name", "nbits", "use_flash"))
def encode_compress_compact_batch(
    params: ColBERTParams,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    keep_mask: jax.Array,
    centroids: jax.Array,
    bucket_cutoffs: jax.Array,
    take_idx: jax.Array,
    *,
    cfg: BertConfig,
    dtype_name: str = "bfloat16",
    nbits: int = 2,
    use_flash: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """``encode_compress_batch`` fused with keep-row compaction.

    -> (codes (M,) uint32, packed residuals (M, dim//8·nbits) uint8), kept
    rows only (see :func:`encode_compact_batch` for the ``take_idx``
    contract). Compacting BEFORE compressing also skips the codec work for
    masked rows: the centroid-assignment matmul runs on M rows instead of
    B·L.
    """
    from colbert_tpu.ops import codec as codec_ops

    emb = _forward_normalized(
        params, input_ids, attention_mask, keep_mask, cfg=cfg,
        dtype_name=dtype_name, use_flash=use_flash,
    )
    flat = emb.reshape(-1, emb.shape[-1])[take_idx]
    codes = codec_ops.compress_into_codes(flat, centroids, bsize=1024)
    residuals = codec_ops.compress_residuals(
        flat, centroids[codes.astype(jnp.int32)], bucket_cutoffs, nbits=nbits
    )
    return codes, residuals


def skiplist_keep_mask(ids: np.ndarray, mask: np.ndarray, skiplist: list[int]) -> np.ndarray:
    """Host-side keep-mask: attended positions whose token id is not skipped."""
    if not skiplist:
        return mask.copy()
    return mask & ~np.isin(ids, np.asarray(skiplist, dtype=ids.dtype))


def compact_doc_embeddings(
    emb: np.ndarray, keep: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop masked token positions -> (flat (sum(doclens), dim), doclens (B,)).

    Host-side analogue of the reference's ``_flatten_embeddings`` +
    ``_remove_masked_tokens`` (embedding_utils.jl:195-205); doclens are the
    per-passage surviving-token counts (checkpoint.jl:40-45).
    """
    doclens = keep.sum(axis=1).astype(np.int64)
    flat = emb[keep]
    return np.ascontiguousarray(flat), doclens
