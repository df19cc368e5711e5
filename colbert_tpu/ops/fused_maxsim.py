"""Pallas fused decompress+MaxSim kernel (SURVEY §2 replacement table, last
row; reference decompresses on CPU mid-search, searching.jl:114-116).

Stage-2 scoring reads candidates' PACKED residuals (uint8, dim/8*nbits bytes
per token) and their gathered centroid rows, and produces per-(query-token,
candidate) maxima directly: bit-unpack, bucket-weight decode, centroid-add,
renormalize, Q-dot and the masked max over doc tokens all happen on VMEM
tiles inside one kernel — the decompressed fp32 token embeddings are never
written to HBM (XLA's fused path materializes them once per chunk).

The centroid gather itself stays in XLA: Mosaic has no vector gather from a
VMEM-resident table (verified: "Cannot do int indexing on TPU"), and a
per-row DMA loop is latency-bound; XLA's native HBM gather is the fastest
available primitive for that step.

Mosaic lowering constraints shaped the kernel (all verified on v5e):
  - no minor-dim-merge/split reshapes -> the byte->dim expansion is a
    lane-axis concatenation of shift planes, which lays residual dims out in
    a PERMUTED order; Q and centroid columns are permuted to match (the dot
    and the norm are permutation-invariant),
  - no flat (rows,) masks -> validity comes in as per-candidate token
    counts and the doc-token max runs as a static 128-aligned lane-slice
    loop over a token-major row layout.

Layout contract matches :mod:`colbert_tpu.ops.codec` exactly (dim-major /
bit-minor bitstring, LSB-first bytes — residual.jl:197-208, 400-407):
``bucket_index(d) = (byte[d * nbits // 8] >> (d * nbits % 8)) & (2^nbits-1)``
for the nbits in {1, 2, 4} where a dim never straddles bytes. Validity must
be prefix-contiguous per candidate (true for doclen-padded gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stage2_maxsim_pallas", "pallas_stage2_supported"]

NEG = -1e30


def pallas_stage2_supported(nbits: int, dim: int, backend: str | None = None) -> bool:
    """The kernel covers the codec's practical corner: nbits in {1,2,4}
    (a dim never straddles a byte; the bucket decode is a 2^nbits-way
    select), dim a lane multiple, TPU backend."""
    import jax as _jax

    backend = backend or _jax.default_backend()
    return nbits in (1, 2, 4) and dim % 128 == 0 and backend not in ("cpu",)


def _kernel(q_ref, cent_ref, packed_ref, dl_ref, weights_ref, out_ref,
            *, nbits: int, ldb: int, bc: int):
    # blocks (token-major): q (Lq, dim); cent (ldb, bc, dim) f32; packed
    # (ldb, bc, nwords) uint8 or uint32; dl (1, NC_block=bc) int32 counts;
    # weights (1, 2^nbits); out (Lq, bc) f32 accumulated over the Ld axis
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, NEG)

    nwords = packed_ref.shape[-1]
    dim = cent_ref.shape[-1]
    # packed words are uint8 bytes or little-endian uint32 lanes (the flat
    # device residual layout); a dim never straddles a word for nbits in
    # {1,2,4}, and LE composition makes word w bit b == bitstring 8*4w+b,
    # so the same shift-plane decode works at either width
    wbits = 8 * packed_ref.dtype.itemsize
    per_word = wbits // nbits
    mask_val = (1 << nbits) - 1
    rows = ldb * bc

    if packed_ref.dtype == jnp.uint32:
        # stay unsigned: an int32 cast would arithmetic-shift sign bits in
        packed = packed_ref[:].reshape(rows, nwords)
        planes = [
            ((packed >> jnp.uint32(s * nbits)) & jnp.uint32(mask_val)).astype(jnp.int32)
            for s in range(per_word)
        ]
    else:
        packed = packed_ref[:].astype(jnp.int32).reshape(rows, nwords)
        planes = [(packed >> (s * nbits)) & mask_val for s in range(per_word)]
    # dim-major bit-minor, LSB-first; shift planes concatenated along lanes
    # => residual dim order perm[p] = (p % nwords) * per_word + p // nwords
    idx = jnp.concatenate(planes, axis=1)  # (rows, dim)

    # bucket decode: 2^nbits-way select (tiny unrolled chain on the VPU)
    res = jnp.zeros((rows, dim), jnp.float32)
    for b in range(1 << nbits):
        res = jnp.where(idx == b, weights_ref[0, b], res)

    emb = cent_ref[:].reshape(rows, dim) + res
    # exact sqrt+divide (lax.rsqrt is an approximation on the VPU and costs
    # ~1e-3 relative score error vs the XLA decompress path)
    inv_norm = 1.0 / jnp.sqrt(
        jnp.maximum(jnp.sum(emb * emb, axis=-1, keepdims=True), 1e-24)
    )
    scores = jax.lax.dot_general(
        q_ref[:], emb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # fp32 parity with XLA's einsum
    )  # (Lq, rows), token-major: columns [t*bc:(t+1)*bc] = token t
    scores = scores * inv_norm[:, 0][None, :]

    acc = out_ref[:]
    dl = dl_ref[0, :]  # (bc,)
    for t in range(ldb):
        part = scores[:, t * bc:(t + 1) * bc]            # (Lq, bc)
        mask_t = (dl > (j * ldb + t))[None, :]
        acc = jnp.maximum(acc, jnp.where(mask_t, part, NEG))
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("nbits", "bc", "ldb", "interpret"))
def stage2_maxsim_pallas(
    Q: jax.Array,          # (Lq, dim) f32, Lq % 8 == 0 (pad with zero rows)
    cent_rows: jax.Array,  # (NC, Ld, dim) f32 — centroids[codes], XLA gather
    packed: jax.Array,     # (NC, Ld, nwords) uint8 bytes or LE uint32 lanes
    valid: jax.Array,      # (NC, Ld) bool, prefix-contiguous per candidate
    bucket_weights: jax.Array,  # (2^nbits,) f32
    *,
    nbits: int,
    bc: int = 128,
    ldb: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """-> per-(query-token, candidate) maxima (Lq, NC) f32; candidates with
    zero valid tokens stay at NEG (callers mask and sum over Lq)."""
    Lq, dim = Q.shape
    NC, Ld, nwords = packed.shape
    if Lq % 8 != 0:
        raise ValueError("Lq must be a multiple of 8 (pad Q with zero rows)")
    if NC % bc or Ld % ldb:
        raise ValueError(f"NC={NC} % bc={bc} or Ld={Ld} % ldb={ldb} != 0")
    per_word = 8 * packed.dtype.itemsize // nbits
    perm = np.arange(dim)
    perm = ((perm % nwords) * per_word + perm // nwords).astype(np.int32)
    Qp = Q.astype(jnp.float32)[:, perm]
    # token-major layout: leading-dim merges lower in Mosaic, minor ones don't
    cent_t = cent_rows[..., perm].transpose(1, 0, 2)   # (Ld, NC, dim)
    packed_t = packed.transpose(1, 0, 2)               # (Ld, NC, nbytes)
    dl = valid.sum(axis=-1, dtype=jnp.int32)[None, :]  # (1, NC)
    grid = (NC // bc, Ld // ldb)
    weights2d = bucket_weights.astype(jnp.float32)[None, :]
    kernel = functools.partial(_kernel, nbits=nbits, ldb=ldb, bc=bc)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lq, dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ldb, bc, dim), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ldb, bc, nwords), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1 << nbits), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lq, bc), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Lq, NC), jnp.float32),
        interpret=interpret,
    )(Qp, cent_t, packed_t, dl, weights2d)
    return out
