"""HuggingFace checkpoint loading: colbert-ir/colbertv2.0-style dirs -> JAX pytrees.

TPU-native analogue of the reference's local loader (reference:
src/local_loading.jl:139-209 ``load_hgf_pretrained_local``): reads
``config.json``, the tokenizer files, the BERT weights
(``model.safetensors`` or ``pytorch_model.bin``) and the extra ColBERT
``linear`` projection head (local_loading.jl:97-99), returning
``(BertConfig, ColBERTParams, WordPieceTokenizer)``.

Torch ``nn.Linear.weight`` is ``(out, in)``; all kernels are transposed to
``(in, out)`` here. Per-layer weights are stacked along a leading
``num_layers`` axis to match the scan-based encoder
(:mod:`colbert_tpu.models.bert`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from colbert_tpu.models.bert import BertConfig
from colbert_tpu.tokenization.wordpiece import WordPieceTokenizer

__all__ = ["load_checkpoint", "load_state_dict", "save_checkpoint"]


def load_state_dict(directory: str) -> Dict[str, np.ndarray]:
    """Load raw weights from safetensors (preferred) or a torch pickle."""
    st_path = os.path.join(directory, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return dict(load_file(st_path))
    pt_path = os.path.join(directory, "pytorch_model.bin")
    if os.path.exists(pt_path):
        import torch

        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin under {directory}"
    )


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if any(k.startswith("bert.") for k in sd):
        return {
            (k[len("bert."):] if k.startswith("bert.") else k): v for k, v in sd.items()
        }
    return sd


def _dense(sd, name):
    out = {"kernel": jnp.asarray(sd[f"{name}.weight"].T, jnp.float32)}
    bkey = f"{name}.bias"
    if bkey in sd:
        out["bias"] = jnp.asarray(sd[bkey], jnp.float32)
    return out


def _require_bias(d):
    if "bias" not in d:
        d["bias"] = jnp.zeros((d["kernel"].shape[1],), jnp.float32)
    return d


def _stack(dicts):
    keys = dicts[0].keys()
    return {k: jnp.stack([d[k] for d in dicts]) for k in keys}


def params_from_state_dict(
    sd: Dict[str, np.ndarray], cfg: BertConfig
) -> Dict[str, Any]:
    """Map HF BertModel names -> the scan-stacked colbert_tpu pytree."""
    sd = _strip_prefix(sd)
    emb = {
        "word": jnp.asarray(sd["embeddings.word_embeddings.weight"], jnp.float32),
        "position": jnp.asarray(sd["embeddings.position_embeddings.weight"], jnp.float32),
        "token_type": jnp.asarray(sd["embeddings.token_type_embeddings.weight"], jnp.float32),
        "ln": {
            "scale": jnp.asarray(sd["embeddings.LayerNorm.weight"], jnp.float32),
            "bias": jnp.asarray(sd["embeddings.LayerNorm.bias"], jnp.float32),
        },
    }
    per_layer = {k: [] for k in
                 ("q", "k", "v", "attn_out", "attn_ln", "mlp_in", "mlp_out", "mlp_ln")}
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        per_layer["q"].append(_require_bias(_dense(sd, f"{p}.attention.self.query")))
        per_layer["k"].append(_require_bias(_dense(sd, f"{p}.attention.self.key")))
        per_layer["v"].append(_require_bias(_dense(sd, f"{p}.attention.self.value")))
        per_layer["attn_out"].append(_require_bias(_dense(sd, f"{p}.attention.output.dense")))
        per_layer["attn_ln"].append({
            "scale": jnp.asarray(sd[f"{p}.attention.output.LayerNorm.weight"], jnp.float32),
            "bias": jnp.asarray(sd[f"{p}.attention.output.LayerNorm.bias"], jnp.float32),
        })
        per_layer["mlp_in"].append(_require_bias(_dense(sd, f"{p}.intermediate.dense")))
        per_layer["mlp_out"].append(_require_bias(_dense(sd, f"{p}.output.dense")))
        per_layer["mlp_ln"].append({
            "scale": jnp.asarray(sd[f"{p}.output.LayerNorm.weight"], jnp.float32),
            "bias": jnp.asarray(sd[f"{p}.output.LayerNorm.bias"], jnp.float32),
        })
    return {"embeddings": emb, "layers": {k: _stack(v) for k, v in per_layer.items()}}


def state_dict_from_params(
    params: Dict[str, Any], cfg: BertConfig, *, prefix: str = "bert."
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_state_dict` + linear head: the
    scan-stacked ColBERT pytree -> flat HF-named state dict (torch
    ``(out, in)`` kernel layout). Used to export checkpoints and for
    load-roundtrip tests."""
    bert = params["bert"]
    emb = bert["embeddings"]
    sd: Dict[str, np.ndarray] = {
        f"{prefix}embeddings.word_embeddings.weight": np.asarray(emb["word"]),
        f"{prefix}embeddings.position_embeddings.weight": np.asarray(emb["position"]),
        f"{prefix}embeddings.token_type_embeddings.weight": np.asarray(emb["token_type"]),
        f"{prefix}embeddings.LayerNorm.weight": np.asarray(emb["ln"]["scale"]),
        f"{prefix}embeddings.LayerNorm.bias": np.asarray(emb["ln"]["bias"]),
    }
    layer_map = {
        "q": "attention.self.query",
        "k": "attention.self.key",
        "v": "attention.self.value",
        "attn_out": "attention.output.dense",
        "mlp_in": "intermediate.dense",
        "mlp_out": "output.dense",
    }
    ln_map = {"attn_ln": "attention.output.LayerNorm", "mlp_ln": "output.LayerNorm"}
    layers = bert["layers"]
    for i in range(cfg.num_hidden_layers):
        p = f"{prefix}encoder.layer.{i}"
        for ours, hf in layer_map.items():
            sd[f"{p}.{hf}.weight"] = np.asarray(layers[ours]["kernel"][i]).T
            sd[f"{p}.{hf}.bias"] = np.asarray(layers[ours]["bias"][i])
        for ours, hf in ln_map.items():
            sd[f"{p}.{hf}.weight"] = np.asarray(layers[ours]["scale"][i])
            sd[f"{p}.{hf}.bias"] = np.asarray(layers[ours]["bias"][i])
    sd["linear.weight"] = np.asarray(params["linear"]["kernel"]).T
    if "bias" in params["linear"]:
        sd["linear.bias"] = np.asarray(params["linear"]["bias"])
    return sd


def save_checkpoint(
    directory: str, params: Dict[str, Any], cfg: BertConfig, tokenizer
) -> None:
    """Write an HF-compatible ColBERT checkpoint directory
    (``model.safetensors`` + ``config.json`` + ``vocab.txt``) that
    :func:`load_checkpoint` reads back — the persistence path for
    fine-tuned weights from :mod:`colbert_tpu.training`. The reference only
    consumes checkpoints (local_loading.jl:139-209); it cannot produce them.
    """
    import dataclasses

    from safetensors.numpy import save_file

    os.makedirs(directory, exist_ok=True)
    sd = state_dict_from_params(params, cfg)
    save_file(
        {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in sd.items()},
        os.path.join(directory, "model.safetensors"),
    )
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    ids = sorted(tokenizer.vocab.values())
    if ids != list(range(len(ids))):
        raise ValueError("tokenizer vocab ids must be contiguous to export vocab.txt")
    by_id = sorted(tokenizer.vocab.items(), key=lambda kv: kv[1])
    with open(os.path.join(directory, "vocab.txt"), "w") as f:
        f.write("\n".join(tok for tok, _ in by_id) + "\n")


def load_checkpoint(
    directory: str,
) -> Tuple[BertConfig, Dict[str, Any], WordPieceTokenizer]:
    """Load a ColBERT HF checkpoint dir -> (bert_cfg, colbert_params, tokenizer).

    The ``linear`` head (hidden -> dim) is required, matching the reference's
    ``_load_dense(state_dict, "linear", ...)`` (local_loading.jl:97-99).
    """
    with open(os.path.join(directory, "config.json")) as f:
        cfg = BertConfig.from_hf_dict(json.load(f))
    raw = load_state_dict(directory)
    linear_key = next((k for k in raw if k in ("linear.weight", "model.linear.weight")), None)
    if linear_key is None:
        raise KeyError(
            "checkpoint has no 'linear.weight' projection head — not a ColBERT checkpoint"
        )
    prefix = linear_key[: -len("linear.weight")]
    linear = {"kernel": jnp.asarray(raw[linear_key].T, jnp.float32)}
    if f"{prefix}linear.bias" in raw:
        linear["bias"] = jnp.asarray(raw[f"{prefix}linear.bias"], jnp.float32)
    bert_sd = {k[len(prefix):]: v for k, v in raw.items()} if prefix else raw
    params = {"bert": params_from_state_dict(bert_sd, cfg), "linear": linear}
    tokenizer = WordPieceTokenizer.from_pretrained(directory)
    return cfg, params, tokenizer
