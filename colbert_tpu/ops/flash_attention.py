"""Pallas flash attention for the BERT encoder (non-causal, padding-masked).

Replaces XLA's materialized ``(B, h, S, S)`` score tensor with an online-
softmax kernel that keeps one ``(block_q, block_k)`` tile in VMEM at a time
— the encoder's attention becomes HBM-traffic-free beyond the q/k/v/o
streams. SURVEY §2's replacement table calls for pallas flash-attention in
the encoder (the reference uses NeuralAttentionlib's materialized attention,
checkpoint.jl:24).

Layout: heads are flattened into the batch dim — ``(B*H, S, hd)`` — with
``S`` a multiple of ``block_q``/``block_k`` (the encoder pads sequences to
length buckets that satisfy this) and a per-batch additive bias ``(B, S)``
carrying the padding mask (0 for real tokens, -1e30 for pads).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG = -1e30


def _flash_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    # q_ref: (1, block_q, hd); k/v_ref: (1, S, hd); bias_ref: (1, 1, S)
    q = q_ref[0].astype(jnp.float32) * scale
    S = k_ref.shape[1]
    bq, hd = q.shape
    nk = S // block_k

    def body(i, carry):
        o_acc, m, l = carry
        ks = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vs = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        s = s + bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o_new = alpha * o_acc + jax.lax.dot_general(
            p, vs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return o_new, m_new, l_new

    o_acc = jnp.zeros((bq, hd), jnp.float32)
    m0 = jnp.full((bq, 1), NEG, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    o_acc, m, l = jax.lax.fori_loop(0, nk, body, (o_acc, m0, l0))
    o_ref[0] = (o_acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,      # (B*H, S, hd)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,   # (B, S) additive: 0 for real tokens, -1e30 for pads
    *,
    num_heads: int,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    BH, S, hd = q.shape
    if S % block_q or S % block_k:
        raise ValueError(f"S={S} must be a multiple of block_q/block_k")
    scale = 1.0 / math.sqrt(hd)
    grid = (BH, S // block_q)
    H = num_heads

    kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    # bias rides as (B, 1, S): a (1, 1, S) block keeps the TPU sublane rule
    # happy (sublane dim == array dim), which a 2-D (1, S) block violates.
    bias3 = bias[:, None, :]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda bh, i: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, hd), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, hd), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, hd), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(bias3, q, k, v)
