"""MaxSim late-interaction scoring, fully on device.

Reference: src/search/ranking.jl:69-87 ``maxsim`` — ``sum over query tokens of
max over doc tokens of Q·D`` — computed there with a GPU matmul followed by a
*per-passage CPU loop* over slices. Here the candidate set is a padded dense
``(P, Ld, dim)`` tensor scored by one jitted program: a ``lax.map`` over
fixed-size passage chunks, each chunk a single batched MXU einsum with masked
max/sum reductions. No host round-trips, no per-passage Python.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["maxsim_scores"]

NEG = -1e30


@functools.partial(jax.jit, static_argnames=("pid_chunk",))
def maxsim_scores(
    Q: jax.Array,          # (B, Lq, dim) query token embeddings (zeros for unused)
    D: jax.Array,          # (P, Ld, dim) padded candidate doc token embeddings
    dmask: jax.Array,      # (P, Ld) bool — True for real doc tokens
    *,
    pid_chunk: int = 256,
) -> jax.Array:
    """MaxSim scores ``(B, P)``.

    Padding embeddings in ``D`` are masked to -inf before the per-query-token
    max, so zero-padded rows contribute nothing. Passages with zero real
    tokens score 0.
    """
    B, Lq, dim = Q.shape
    P, Ld, _ = D.shape
    nchunks = max(1, -(-P // pid_chunk))
    padded = nchunks * pid_chunk
    D_p = jnp.pad(D, ((0, padded - P), (0, 0), (0, 0))).reshape(
        nchunks, pid_chunk, Ld, dim
    )
    m_p = jnp.pad(dmask, ((0, padded - P), (0, 0))).reshape(nchunks, pid_chunk, Ld)
    Qf = Q.astype(jnp.float32)

    def one(args):
        d, m = args
        # (B, Lq, dim) x (pc, Ld, dim) -> (B, pc, Lq, Ld)
        s = jnp.einsum(
            "bqd,pld->bpql", Qf, d.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(m[None, :, None, :], s, NEG)
        per_qtok = jnp.max(s, axis=-1)  # (B, pc, Lq)
        any_tok = jnp.any(m, axis=-1)[None, :, None]  # (1, pc, 1)
        per_qtok = jnp.where(any_tok, per_qtok, 0.0)
        return jnp.sum(per_qtok, axis=-1)  # (B, pc)

    scores = jax.lax.map(one, (D_p, m_p))  # (nchunks, B, pid_chunk)
    return scores.transpose(1, 0, 2).reshape(B, padded)[:, :P]
