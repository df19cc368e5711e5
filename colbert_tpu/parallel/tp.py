"""Tensor parallelism for the encoder: Megatron-style param sharding.

The reference is single-GPU (SURVEY §2: no TP of any kind); here the
``model`` mesh axis shards the BERT blocks the standard Megatron way —
GSPMD does the rest, no changes to the forward:

  - q/k/v and mlp_in are *column-parallel* (output dim sharded): each model
    shard computes its own attention heads / MLP slice with no
    communication,
  - attn_out and mlp_out are *row-parallel* (input dim sharded): partial
    sums per shard, and XLA inserts exactly one all-reduce per block before
    the residual layer-norm (the canonical 2-collectives-per-layer TP),
  - embeddings, layer-norms, and the ColBERT linear head are replicated
    (tiny next to the blocks).

Sharding the contiguous last/middle kernel columns splits whole attention
heads as long as ``num_attention_heads % model_axis == 0`` (validated), so
the head reshape/transpose in the forward propagates cleanly.

Composes with data parallelism: the batch shards over ``data`` while every
``model`` group holds one replica of the sharded params.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colbert_tpu.models.bert import BertConfig

__all__ = ["validate_tp", "colbert_param_specs", "shard_params"]


def validate_tp(cfg: BertConfig, n_model: int) -> None:
    if n_model <= 1:
        return
    if cfg.num_attention_heads % n_model:
        raise ValueError(
            f"tensor parallelism needs num_attention_heads "
            f"({cfg.num_attention_heads}) divisible by the model axis ({n_model})"
        )
    if cfg.intermediate_size % n_model:
        raise ValueError(
            f"tensor parallelism needs intermediate_size "
            f"({cfg.intermediate_size}) divisible by the model axis ({n_model})"
        )


def colbert_param_specs(params) -> dict:
    """PartitionSpec pytree for ColBERT params (stacked-layer layout of
    :func:`colbert_tpu.models.bert.init_bert_params` + the linear head).
    Kernels are (L, in, out); column-parallel shards ``out``, row-parallel
    shards ``in``."""
    col_k, col_b = P(None, None, "model"), P(None, "model")
    row_k, repl_b = P(None, "model", None), P(None, None)
    ln = {"scale": P(None, None), "bias": P(None, None)}
    specs = {
        "bert": {
            "embeddings": jax.tree.map(lambda _: P(), params["bert"]["embeddings"]),
            "layers": {
                "q": {"kernel": col_k, "bias": col_b},
                "k": {"kernel": col_k, "bias": col_b},
                "v": {"kernel": col_k, "bias": col_b},
                "attn_out": {"kernel": row_k, "bias": repl_b},
                "attn_ln": ln,
                "mlp_in": {"kernel": col_k, "bias": col_b},
                "mlp_out": {"kernel": row_k, "bias": repl_b},
                "mlp_ln": dict(ln),
            },
        },
        "linear": jax.tree.map(lambda _: P(), params["linear"]),
    }
    return specs


def shard_params(params, mesh: Mesh, cfg: BertConfig):
    """Place ColBERT params TP-sharded over ``mesh``'s model axis (replicated
    over data). With model axis 1 this degenerates to full replication."""
    n_model = mesh.shape["model"]
    validate_tp(cfg, n_model)
    if n_model <= 1:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, repl), params)
    specs = colbert_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
