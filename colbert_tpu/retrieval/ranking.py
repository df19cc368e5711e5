"""Candidate generation + MaxSim ranking.

Reference: src/search/ranking.jl (retrieve/gather/maxsim) and
src/searching.jl:93-128 (the search pipeline). TPU-first redesign:

  - centroid probing uses on-device ``lax.top_k`` (the reference does a CPU
    partial sort and flags it TODO — utils.jl:327-332),
  - candidate doc-token gathers are vectorized numpy (CSR offsets ->
    padded index matrices), not per-pid Python loops (ranking.jl:46-67),
  - decompression + MaxSim run as one jitted device program over the padded
    candidate block (the reference decompresses on CPU mid-search,
    searching.jl:114-116),
  - optional PLAID-style staged pruning: candidates are first scored with
    centroid scores only (no residual decompression), and only the top
    ``ncandidates`` survivors get full scoring. The reference defines
    ``ncandidates`` but never uses it (SURVEY §3.4); here it is live.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.ops import codec as codec_ops
from colbert_tpu.ops.maxsim import maxsim_scores

__all__ = [
    "build_emb2pid",
    "probe_centroids",
    "candidate_pids",
    "gather_padded",
    "score_full",
    "score_approx",
]


def build_emb2pid(doclens: np.ndarray) -> np.ndarray:
    """Embedding id -> passage id (reference: searching.jl:82-91)."""
    return np.repeat(
        np.arange(len(doclens), dtype=np.int64), doclens.astype(np.int64)
    )


@functools.partial(jax.jit, static_argnames=("nprobe",))
def probe_centroids(Q: jax.Array, centroids: jax.Array, *, nprobe: int) -> jax.Array:
    """Top-``nprobe`` centroid ids per query token -> (B, Lq, nprobe) int32.

    Reference: ranking.jl:27-31 (GPU matmul + CPU top-k); here both stay on
    device.
    """
    scores = jnp.einsum(
        "bqd,kd->bqk", Q.astype(jnp.float32), centroids.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    _, idx = jax.lax.top_k(scores, nprobe)
    return idx.astype(jnp.int32)


def candidate_pids(
    cells: np.ndarray,
    ivf: np.ndarray,
    ivf_lengths: np.ndarray,
    emb2pid: np.ndarray,
) -> np.ndarray:
    """Probed centroid ids -> unique candidate passage ids (host side).

    Reference: ranking.jl:7-21 ``_cids_to_eids!`` + :39-43. The IVF is a CSR
    layout (ivf = eids grouped by centroid, ivf_lengths = group sizes); the
    gather is pure numpy slicing over the unique probed cells.
    """
    offsets = np.concatenate([[0], np.cumsum(ivf_lengths)]).astype(np.int64)
    cids = np.unique(cells.reshape(-1))
    if len(cids) == 0:
        return np.zeros((0,), np.int64)
    parts = [ivf[offsets[c] : offsets[c + 1]] for c in cids]
    eids = np.concatenate(parts) if parts else np.zeros((0,), np.int64)
    if len(eids) == 0:
        return np.zeros((0,), np.int64)
    return np.unique(emb2pid[eids])


def _bucket(x: int, step: int) -> int:
    return max(step, -(-x // step) * step)


def gather_padded(
    pids: np.ndarray,
    doclens: np.ndarray,
    emb_offsets: np.ndarray,
    *,
    len_bucket: int = 32,
    pid_bucket: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """Candidate pids -> (gather_idx (P', Ld), mask (P', Ld)) padded index
    matrices into the flat embedding/codes arrays.

    ``P'`` and ``Ld`` are bucketed so the downstream jitted scorer sees a
    small closed set of shapes. Padded rows have all-False masks (score 0).
    Reference equivalent: ranking.jl:46-67 per-pid gather loop.
    """
    if len(pids) == 0:
        return (
            np.zeros((pid_bucket, len_bucket), np.int32),
            np.zeros((pid_bucket, len_bucket), bool),
        )
    dl = doclens[pids].astype(np.int64)
    max_len = int(dl.max()) if len(dl) else 1
    Ld = _bucket(max_len, len_bucket)
    P = _bucket(len(pids), pid_bucket)
    idx = np.zeros((P, Ld), np.int64)
    mask = np.zeros((P, Ld), bool)
    ar = np.arange(Ld)
    idx[: len(pids)] = emb_offsets[pids][:, None] + np.minimum(ar[None, :], dl[:, None] - 1)
    mask[: len(pids)] = ar[None, :] < dl[:, None]
    return idx.astype(np.int32), mask


@functools.partial(jax.jit, static_argnames=("nbits", "pid_chunk"))
def score_full(
    Q: jax.Array,           # (B, Lq, dim)
    codes_g: jax.Array,     # (P, Ld) uint32 — gathered codes
    residuals_g: jax.Array, # (P, Ld, nbytes) uint8 — gathered packed residuals
    dmask: jax.Array,       # (P, Ld) bool
    centroids: jax.Array,
    bucket_weights: jax.Array,
    *,
    nbits: int,
    pid_chunk: int = 128,
) -> jax.Array:
    """Fused decompress + MaxSim -> (B, P) scores, one device program."""
    P, Ld = codes_g.shape
    flat_codes = codes_g.reshape(P * Ld)
    flat_res = residuals_g.reshape(P * Ld, -1)
    embs = codec_ops.decompress(
        flat_codes, flat_res, centroids, bucket_weights, nbits=nbits
    )
    D = embs.reshape(P, Ld, -1)
    return maxsim_scores(Q, D, dmask, pid_chunk=pid_chunk)


@functools.partial(jax.jit, static_argnames=("pid_chunk",))
def score_approx(
    Q: jax.Array,        # (B, Lq, dim)
    codes_g: jax.Array,  # (P, Ld) uint32
    dmask: jax.Array,    # (P, Ld) bool
    centroids: jax.Array,
    *,
    pid_chunk: int = 512,
) -> jax.Array:
    """Centroid-only approximate MaxSim -> (B, P) (PLAID stage-1 scoring).

    Each candidate token embedding is approximated by its centroid; the
    score is computed from the (B, Lq, k) centroid score table by gathering
    per-token columns — no residual decompression, no (P, Ld, dim) tensor.
    """
    cs = jnp.einsum(
        "bqd,kd->bqk", Q.astype(jnp.float32), centroids.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (B, Lq, k)
    B, Lq, _ = cs.shape
    P, Ld = codes_g.shape
    nchunks = max(1, -(-P // pid_chunk))
    padded = nchunks * pid_chunk
    codes_p = jnp.pad(codes_g, ((0, padded - P), (0, 0))).reshape(
        nchunks, pid_chunk, Ld
    )
    mask_p = jnp.pad(dmask, ((0, padded - P), (0, 0))).reshape(nchunks, pid_chunk, Ld)

    def one(args):
        c, m = args  # (pc, Ld)
        # gather (B, Lq, pc, Ld) scores from the centroid table
        s = cs[:, :, c.astype(jnp.int32)]
        s = jnp.where(m[None, None], s, -1e30)
        per_qtok = jnp.max(s, axis=-1)  # (B, Lq, pc)
        any_tok = jnp.any(m, axis=-1)[None, None]
        per_qtok = jnp.where(any_tok, per_qtok, 0.0)
        return jnp.sum(per_qtok, axis=1)  # (B, pc)

    scores = jax.lax.map(one, (codes_p, mask_p))  # (nchunks, B, pc)
    return scores.transpose(1, 0, 2).reshape(B, padded)[:, :P]
