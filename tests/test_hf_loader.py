"""Checkpoint-loading fidelity (reference: local_loading.jl:139-209).

SURVEY §7 flags weight-loading fidelity as a silent-MRR-killer, so the loader
is tested against a synthesized HF-style checkpoint: a known pytree is
exported with HF names (torch (out, in) layout, ``bert.`` prefix, linear
head), written to disk, loaded back, and checked for pytree AND forward
equality. A final skip-unless-checkpoint test pins the reference's exact
behavioral oracle (README.md:151-156).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.models.bert import BertConfig
from colbert_tpu.models.colbert import encode_batch, init_colbert_params
from colbert_tpu.models.hf_loader import (
    load_checkpoint,
    params_from_state_dict,
    state_dict_from_params,
)
from colbert_tpu.utils.testing import make_vocab

TINY = BertConfig(
    vocab_size=96, hidden_size=32, num_hidden_layers=3,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
)


def _write_checkpoint(directory, params, cfg, *, fmt="safetensors"):
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    vocab = make_vocab(extra_words=cfg.vocab_size - len(make_vocab(0)))
    with open(os.path.join(directory, "vocab.txt"), "w") as f:
        f.write("\n".join(list(vocab)[: cfg.vocab_size]))
    with open(os.path.join(directory, "tokenizer_config.json"), "w") as f:
        json.dump({"do_lower_case": True}, f)
    sd = state_dict_from_params(params, cfg)
    if fmt == "safetensors":
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  os.path.join(directory, "model.safetensors"))
    else:
        import torch

        # .copy(): jax-exported arrays can be non-writable and torch warns
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v).copy())
             for k, v in sd.items()},
            os.path.join(directory, "pytorch_model.bin"))


def _assert_params_equal(got, want):
    flat_g, tree_g = jax.tree_util.tree_flatten(got)
    flat_w, tree_w = jax.tree_util.tree_flatten(want)
    assert tree_g == tree_w
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-6)


def _assert_forward_equal(params_a, params_b, cfg, rng):
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), bool)
    keep = jnp.asarray(rng.random((2, 16)) > 0.2)
    out_a = encode_batch(params_a, ids, mask, keep, cfg=cfg, dtype_name="float32")
    out_b = encode_batch(params_b, ids, mask, keep, cfg=cfg, dtype_name="float32")
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fmt", ["safetensors", "torch"])
def test_roundtrip_pytree_and_forward(tmp_path, rng, fmt):
    if fmt == "torch":
        pytest.importorskip("torch")
    params = init_colbert_params(jax.random.PRNGKey(3), TINY, dim=16, linear_bias=True)
    ckpt = str(tmp_path / f"ckpt_{fmt}")
    _write_checkpoint(ckpt, params, TINY, fmt=fmt)

    cfg_loaded, params_loaded, tokenizer = load_checkpoint(ckpt)
    assert cfg_loaded == TINY
    assert len(tokenizer.vocab) == TINY.vocab_size
    _assert_params_equal(params_loaded, params)
    _assert_forward_equal(params_loaded, params, TINY, rng)


def test_loader_requires_linear_head(tmp_path):
    params = init_colbert_params(jax.random.PRNGKey(0), TINY, dim=16)
    ckpt = str(tmp_path / "no_head")
    _write_checkpoint(ckpt, params, TINY)
    from safetensors.numpy import load_file, save_file

    sd = load_file(os.path.join(ckpt, "model.safetensors"))
    sd.pop("linear.weight")
    save_file(sd, os.path.join(ckpt, "model.safetensors"))
    with pytest.raises(KeyError, match="linear"):
        load_checkpoint(ckpt)


def test_unprefixed_state_dict(rng):
    # HF BertModel checkpoints without the "bert." prefix must load too
    params = init_colbert_params(jax.random.PRNGKey(5), TINY, dim=16)
    sd = state_dict_from_params(params, TINY, prefix="")
    sd.pop("linear.weight")
    got = params_from_state_dict(sd, TINY)
    _assert_params_equal(got, params["bert"])


# --- behavioral oracle against the reference (needs the real checkpoint) ---

CHECKPOINT = os.environ.get(
    "COLBERT_CHECKPOINT", os.path.expanduser("~/checkpoints/colbertv2.0")
)
SAMPLE_TSV = "/root/reference/examples/sample_collection.tsv"


@pytest.mark.skipif(
    not os.path.isdir(CHECKPOINT) or not os.path.exists(SAMPLE_TSV),
    reason="colbertv2.0 checkpoint not available in this environment",
)
def test_behavioral_oracle_sample_collection(tmp_path):
    """Reference oracle (README.md:151-156 / BASELINE.md): on the 10-passage
    sample corpus, `search("what was Cesar Milan's trick?", 2)` returns pids
    [10, 8] (1-based) with scores ~ (5.9721, 3.7733)."""
    from colbert_tpu.config import ColBERTConfig
    from colbert_tpu.indexing.builder import Indexer, load_collection
    from colbert_tpu.retrieval.searcher import Searcher

    cfg = ColBERTConfig(checkpoint=CHECKPOINT, nbits=2, kmeans_niters=20)
    passages = load_collection(SAMPLE_TSV)
    path = str(tmp_path / "oracle_idx")
    Indexer(cfg, collection=passages).index(path)
    s = Searcher(path, config=cfg)
    pids, scores = s.search("what was Cesar Milan's trick?", k=2)
    assert list(pids + 1) == [10, 8]  # reference pids are 1-based
    np.testing.assert_allclose(scores, [5.9721255, 3.7732823], atol=0.15)
