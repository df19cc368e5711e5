"""Pure-JAX BERT encoder, TPU-first.

Replaces the reference's Transformers.jl/Flux BERT forward (reference:
src/modelling/checkpoint.jl:21-25). Design:

  - params are a plain pytree of arrays; the per-layer params are *stacked*
    along a leading ``num_layers`` axis and the encoder runs as one
    ``lax.scan`` over layers — one compiled layer body regardless of depth
    (faster compiles, and XLA pipelines the scan cleanly),
  - activations run in bfloat16 on the MXU (configurable); layernorm and
    softmax accumulate in float32,
  - attention defaults to an XLA fused dot-product path and can route
    through the pallas flash-attention kernel
    (:mod:`colbert_tpu.ops.flash_attention`) for long sequences,
  - shapes are fully static: (batch, seqlen) int32 ids + bool mask.

Weight layout: all dense kernels are ``(in, out)`` (row-major activations
``x @ W``), i.e. the transpose of torch's ``nn.Linear.weight``.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["BertParams", "BertConfig", "init_bert_params", "bert_encode"]

BertParams = Dict[str, Any]


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "BertConfig":
        """Deterministic test-sized config."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=64,
        )

    @classmethod
    def from_hf_dict(cls, d: dict) -> "BertConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


def _dense_init(key, shape, scale=0.02):
    return scale * jax.random.normal(key, shape, dtype=jnp.float32)


def init_bert_params(key: jax.Array, cfg: BertConfig) -> BertParams:
    """Random-init params pytree (HF BertModel-equivalent structure).

    Used for tests and benchmarks (no checkpoints ship with this repo);
    real checkpoints load via :mod:`colbert_tpu.models.hf_loader` into the
    same pytree.
    """
    keys = iter(jax.random.split(key, 64))
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers

    def ln():
        return {"scale": jnp.ones((H,), jnp.float32), "bias": jnp.zeros((H,), jnp.float32)}

    def dense(din, dout, k):
        return {"kernel": _dense_init(k, (din, dout)), "bias": jnp.zeros((dout,), jnp.float32)}

    def stacked_dense(din, dout, k):
        ks = jax.random.split(k, L)
        return {
            "kernel": jnp.stack([_dense_init(ks[i], (din, dout)) for i in range(L)]),
            "bias": jnp.zeros((L, dout), jnp.float32),
        }

    def stacked_ln():
        return {"scale": jnp.ones((L, H), jnp.float32), "bias": jnp.zeros((L, H), jnp.float32)}

    return {
        "embeddings": {
            "word": _dense_init(next(keys), (cfg.vocab_size, H)),
            "position": _dense_init(next(keys), (cfg.max_position_embeddings, H)),
            "token_type": _dense_init(next(keys), (cfg.type_vocab_size, H)),
            "ln": ln(),
        },
        "layers": {
            "q": stacked_dense(H, H, next(keys)),
            "k": stacked_dense(H, H, next(keys)),
            "v": stacked_dense(H, H, next(keys)),
            "attn_out": stacked_dense(H, H, next(keys)),
            "attn_ln": stacked_ln(),
            "mlp_in": stacked_dense(H, I, next(keys)),
            "mlp_out": stacked_dense(I, H, next(keys)),
            "mlp_ln": stacked_ln(),
        },
    }


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _act(name: str):
    if name in ("gelu", "gelu_new"):
        # HF "gelu" is erf-based; "gelu_new" is tanh-approx. Both supported.
        return partial(jax.nn.gelu, approximate=(name == "gelu_new"))
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unsupported activation {name!r}")


def _attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask_bias: jax.Array, num_heads: int,
    use_flash: bool = False,
) -> jax.Array:
    """Multi-head attention. Shapes: (B, S, H). ``use_flash`` routes through
    the pallas online-softmax kernel (no (S, S) score materialization)."""
    B, S, H = q.shape
    hd = H // num_heads

    if use_flash:
        from colbert_tpu.ops.flash_attention import flash_attention

        def split_flat(x):
            return (
                x.reshape(B, S, num_heads, hd)
                .transpose(0, 2, 1, 3)
                .reshape(B * num_heads, S, hd)
            )

        bias2d = mask_bias[:, 0, 0, :]  # (B, S)
        out = flash_attention(
            split_flat(q), split_flat(k), split_flat(v), bias2d,
            num_heads=num_heads,
        )
        return (
            out.reshape(B, num_heads, S, hd).transpose(0, 2, 1, 3).reshape(B, S, H)
        )

    def split(x):
        return x.reshape(B, S, num_heads, hd).transpose(0, 2, 1, 3)  # (B,h,S,hd)

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / math.sqrt(hd)
    scores = scores + mask_bias  # (B,1,1,S) broadcast
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, S, H).astype(q.dtype)


@partial(jax.jit, static_argnames=("cfg", "dtype_name", "use_flash", "remat"))
def bert_encode(
    params: BertParams,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    cfg: BertConfig,
    dtype_name: str = "bfloat16",
    use_flash: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Full BERT forward -> final hidden states ``(B, S, hidden)`` (dtype per
    ``dtype_name``; callers cast/normalize as needed).

    Equivalent to the reference's ``bert(tokens, mask).hidden_state``
    (checkpoint.jl:21-25), but jitted with a ``lax.scan`` over stacked
    layers. ``use_flash`` requires the sequence length to be a multiple of
    128 (the encoder's length buckets guarantee this when enabled).
    ``remat=True`` checkpoints each layer under the scan — the backward
    recomputes activations layer by layer instead of keeping all 12 layers'
    attention temps live (a bert-base train step at B=96, S=304 needs
    22.6 GB HBM without it, over a v5e's 15.75 GB); inference paths leave
    it off.
    """
    dtype = jnp.dtype(dtype_name)
    B, S = input_ids.shape
    emb = params["embeddings"]
    x = (
        emb["word"][input_ids]
        + emb["position"][jnp.arange(S)][None, :, :]
        + emb["token_type"][jnp.zeros((B, S), jnp.int32)]
    )
    x = _layer_norm(x, emb["ln"]["scale"], emb["ln"]["bias"], cfg.layer_norm_eps)
    x = x.astype(dtype)

    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    mask_bias = jnp.where(attention_mask, 0.0, neg)[:, None, None, :]  # (B,1,1,S)

    act = _act(cfg.hidden_act)
    nheads = cfg.num_attention_heads
    eps = cfg.layer_norm_eps

    def layer(x, lp):
        def d(p, y):
            return jnp.dot(y, p["kernel"].astype(dtype)) + p["bias"].astype(dtype)

        q, k, v = d(lp["q"], x), d(lp["k"], x), d(lp["v"], x)
        attn = _attention(q, k, v, mask_bias, nheads, use_flash=use_flash)
        attn = d(lp["attn_out"], attn)
        x = _layer_norm(x + attn, lp["attn_ln"]["scale"], lp["attn_ln"]["bias"], eps)
        h = act(d(lp["mlp_in"], x).astype(jnp.float32)).astype(dtype)
        h = d(lp["mlp_out"], h)
        x = _layer_norm(x + h, lp["mlp_ln"]["scale"], lp["mlp_ln"]["bias"], eps)
        return x, None

    if remat:
        layer = jax.checkpoint(layer)
    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x
