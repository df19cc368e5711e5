"""Residual compression codec — the semantic heart of ColBERTv2 indexing.

TPU-native re-design of the reference codec (reference:
src/indexing/codecs/residual.jl). Same math, same on-disk bit layout, but
vectorized JAX throughout: no per-batch Python loops on the hot path, all
shapes static, everything jit-compatible so XLA can fuse the quantization
arithmetic into the surrounding matmuls.

Layout conventions (row-major, TPU-friendly — the reference is column-major):
  - embeddings: float32/bf16 ``(n, dim)``
  - centroids:  float32 ``(k, dim)``
  - codes:      uint32 ``(n,)`` — 0-based centroid ids (reference is 1-based)
  - packed residuals: uint8 ``(n, dim // 8 * nbits)``

Bit layout parity with the reference (residual.jl:197-208 `_binarize`,
residual.jl:400-407 `_packbits`): per embedding, the bitstring is ordered
dim-major / bit-minor (for d in dims: for b in 0..nbits-1: bit b of the bucket
index of dim d), and packed into bytes LSB-first (Julia ``BitArray`` chunk
semantics). A round-trip through this codec is bit-identical to the
reference's for the same inputs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "bucket_indices",
    "binarize",
    "unbinarize",
    "pack_bits",
    "unpack_bits",
    "compress_into_codes",
    "compress_residuals",
    "compress",
    "decompress_residuals",
    "decompress",
    "bucket_cutoffs_and_weights",
]

_BYTE_WEIGHTS = tuple(1 << k for k in range(8))  # LSB-first


# ---------------------------------------------------------------------------
# bucketing / binarization / bit packing
# ---------------------------------------------------------------------------


def bucket_indices(residuals: jax.Array, bucket_cutoffs: jax.Array) -> jax.Array:
    """Map residual values to bucket ids in ``[0, 2^nbits)``.

    Reference: residual.jl:348-351 ``_bucket_indices`` —
    ``searchsortedfirst(bucket_cutoffs, v) - 1`` == number of cutoffs < v.
    Vectorized as a comparison-sum (cutoffs are tiny: ``2^nbits - 1`` values),
    which XLA fuses into a handful of VPU ops instead of a gather-based
    binary search.
    """
    # (..., 1) > (num_cutoffs,) -> (..., num_cutoffs) -> sum over last axis
    return jnp.sum(
        residuals[..., None] > bucket_cutoffs.astype(residuals.dtype),
        axis=-1,
        dtype=jnp.int32,
    )


def binarize(indices: jax.Array, nbits: int) -> jax.Array:
    """Expand bucket ids ``(n, dim)`` into bits ``(n, dim, nbits)``, LSB first.

    Reference: residual.jl:197-208 ``_binarize`` (bit b = (v >> b) & 1).
    """
    shifts = jnp.arange(nbits, dtype=jnp.int32)
    return (indices[..., None] >> shifts) & 1


def unbinarize(bits: jax.Array) -> jax.Array:
    """Inverse of :func:`binarize`: ``(n, dim, nbits)`` bits -> ``(n, dim)`` ids.

    Reference: residual.jl ``_unbinarize``.
    """
    nbits = bits.shape[-1]
    weights = (1 << jnp.arange(nbits, dtype=jnp.int32))
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def pack_bits(bits: jax.Array) -> jax.Array:
    """Pack a ``(n, dim, nbits)`` bit tensor into ``(n, dim // 8 * nbits)`` uint8.

    Bitstring order is dim-major / bit-minor; bytes are filled LSB-first —
    byte-for-byte identical to the reference's column-major
    ``BitArray(vec(bitsarray))`` packing (residual.jl:400-407).
    """
    n, dim, nbits = bits.shape
    if (dim * nbits) % 8 != 0:
        raise ValueError("dim * nbits must be a multiple of 8")
    flat = bits.reshape(n, dim * nbits // 8, 8)
    weights = jnp.asarray(_BYTE_WEIGHTS, dtype=jnp.int32)
    return jnp.sum(flat.astype(jnp.int32) * weights, axis=-1).astype(jnp.uint8)


def unpack_bits(packed: jax.Array, nbits: int) -> jax.Array:
    """Inverse of :func:`pack_bits`: ``(n, nwords)`` -> ``(n, dim, nbits)``.

    Reference: residual.jl ``_unpackbits``. Accepts the canonical uint8 byte
    rows OR wider little-endian words (uint32 — the serving path stores the
    flat device residual array as uint32 lanes so per-candidate offsets stay
    in 32-bit range; word w's bit b is bitstring position ``wbits*w + b``,
    exactly the LSB-first byte layout re-grouped 4 bytes at a time).
    """
    n, nwords = packed.shape
    wbits = 8 * packed.dtype.itemsize
    dim = nwords * wbits // nbits
    shifts = jnp.arange(wbits, dtype=jnp.uint32)
    bits = (packed.astype(jnp.uint32)[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(n, dim, nbits).astype(jnp.int32)


# ---------------------------------------------------------------------------
# nearest-centroid coding
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bsize",))
def compress_into_codes(
    embs: jax.Array, centroids: jax.Array, *, bsize: int = 4096
) -> jax.Array:
    """Nearest centroid id (by max inner product) for each embedding.

    Reference: residual.jl:67-81 ``compress_into_codes!`` — batched
    ``argmax(centroids' * embs)``. Here the batch loop is a ``lax.map`` over
    padded row-chunks so one compiled program handles any ``n``, and each
    chunk is a single ``(bsize, dim) x (dim, k)`` MXU matmul.

    Returns uint32 codes, 0-based.
    """
    n = embs.shape[0]
    nchunks = max(1, -(-n // bsize))
    padded = nchunks * bsize
    embs_p = jnp.pad(embs, ((0, padded - n), (0, 0)))
    embs_p = embs_p.reshape(nchunks, bsize, -1)
    ct = centroids.T  # (dim, k)

    def one_chunk(chunk):
        scores = jnp.dot(chunk, ct, preferred_element_type=jnp.float32)
        return jnp.argmax(scores, axis=-1).astype(jnp.uint32)

    codes = jax.lax.map(one_chunk, embs_p)
    return codes.reshape(padded)[:n]


# ---------------------------------------------------------------------------
# compression / decompression
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nbits",))
def compress_residuals(
    embs: jax.Array,
    centroid_of_emb: jax.Array,
    bucket_cutoffs: jax.Array,
    *,
    nbits: int,
) -> jax.Array:
    """Quantize ``embs - centroid_of_emb`` into packed uint8 residuals."""
    res = embs.astype(jnp.float32) - centroid_of_emb.astype(jnp.float32)
    idx = bucket_indices(res, bucket_cutoffs)
    return pack_bits(binarize(idx, nbits))


@functools.partial(jax.jit, static_argnames=("nbits", "bsize"))
def compress(
    embs: jax.Array,
    centroids: jax.Array,
    bucket_cutoffs: jax.Array,
    *,
    nbits: int,
    bsize: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """codes + packed residuals for a batch of embeddings.

    Reference: residual.jl:586-604 ``compress`` (which runs on CPU with a
    Python-level batch loop); here it is one fused jitted program on device.
    """
    codes = compress_into_codes(embs, centroids, bsize=bsize)
    residuals = compress_residuals(
        embs, centroids[codes.astype(jnp.int32)], bucket_cutoffs, nbits=nbits
    )
    return codes, residuals


@functools.partial(jax.jit, static_argnames=("nbits",))
def decompress_residuals(
    packed: jax.Array, bucket_weights: jax.Array, *, nbits: int
) -> jax.Array:
    """Packed uint8 residuals -> float32 ``(n, dim)`` bucket-weight values.

    Reference: residual.jl:698-721 ``decompress_residuals``.
    """
    idx = unbinarize(unpack_bits(packed, nbits))
    return bucket_weights.astype(jnp.float32)[idx]


@functools.partial(jax.jit, static_argnames=("nbits",))
def decompress(
    codes: jax.Array,
    packed: jax.Array,
    centroids: jax.Array,
    bucket_weights: jax.Array,
    *,
    nbits: int,
) -> jax.Array:
    """Reconstruct L2-normalized embeddings from (codes, packed residuals).

    Reference: residual.jl:759-784 ``decompress`` — centroid[code] + residual,
    then renormalize. The reference runs this on CPU during search
    (searching.jl:114-116); here it is a device-side fused program (and the
    search path additionally has a pallas fused decompress+MaxSim kernel).
    """
    res = decompress_residuals(packed, bucket_weights, nbits=nbits)
    emb = centroids[codes.astype(jnp.int32)].astype(jnp.float32) + res
    norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb / jnp.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# codec training statistics
# ---------------------------------------------------------------------------


def bucket_cutoffs_and_weights(
    nbits: int, heldout_residuals: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantile bucket cutoffs/weights + avg residual from heldout residuals.

    Reference: collection_indexer.jl:141-152 ``_bucket_cutoffs_and_weights``
    and :177-195 ``_compute_avg_residuals!``. Quantiles use linear
    interpolation (Julia default == numpy/jnp 'linear').

    Returns ``(bucket_cutoffs (2^nbits - 1,), bucket_weights (2^nbits,),
    avg_residual scalar)`` — all float32.
    """
    num_options = 1 << nbits
    base = np.arange(num_options, dtype=np.float64) / num_options
    cutoff_q = jnp.asarray(base[1:], dtype=jnp.float32)
    weight_q = jnp.asarray(base + 0.5 / num_options, dtype=jnp.float32)
    flat = heldout_residuals.astype(jnp.float32).reshape(-1)
    cutoffs = jnp.quantile(flat, cutoff_q)
    weights = jnp.quantile(flat, weight_q)
    avg_residual = jnp.mean(jnp.abs(heldout_residuals.astype(jnp.float32)))
    return cutoffs.astype(jnp.float32), weights.astype(jnp.float32), avg_residual
