"""Encoder tests: numerical parity of the scan-based JAX BERT against
torch/transformers BertModel with identical weights (the reference has no
such test — SURVEY §7 'hard parts' calls out weight-loading fidelity), plus
ColBERT post-processing invariants."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.models.bert import BertConfig, bert_encode, init_bert_params
from colbert_tpu.models.colbert import (
    compact_doc_embeddings,
    encode_batch,
    init_colbert_params,
)

TINY = dict(
    vocab_size=64,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    max_position_embeddings=40,
    type_vocab_size=2,
)


@pytest.fixture(scope="module")
def hf_pair(tmp_path_factory):
    """A tiny torch BertModel and our params loaded from its state_dict."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(**TINY)
    model = BertModel(hf_cfg)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from colbert_tpu.models.hf_loader import params_from_state_dict

    cfg = BertConfig(**TINY)
    params = params_from_state_dict(sd, cfg)
    return model, cfg, params


def test_bert_matches_transformers(hf_pair):
    import torch

    model, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, TINY["vocab_size"], size=(3, 17)).astype(np.int32)
    mask = np.ones((3, 17), dtype=bool)
    mask[1, 12:] = False
    mask[2, 5:] = False

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    ours = np.asarray(
        bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg=cfg,
                    dtype_name="float32")
    )
    # attended positions must match tightly in fp32
    err = np.abs(ours - ref)[mask]
    assert err.max() < 2e-4, f"max err {err.max()}"


def test_bert_bf16_close_to_fp32(hf_pair):
    _, cfg, params = hf_pair
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, TINY["vocab_size"], size=(2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), bool)
    a = np.asarray(bert_encode(params, ids, mask, cfg=cfg, dtype_name="float32"))
    b = np.asarray(bert_encode(params, ids, mask, cfg=cfg, dtype_name="bfloat16"))
    # bf16 activations: loose agreement is expected and sufficient
    denom = np.abs(a).mean()
    assert np.abs(a - b.astype(np.float32)).mean() / denom < 0.05


def test_encode_batch_norms_and_masking():
    cfg = BertConfig.tiny()
    params = init_colbert_params(jax.random.PRNGKey(0), cfg, dim=16)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, 12)), jnp.int32)
    attn = np.ones((4, 12), bool)
    attn[2, 8:] = False
    keep = attn.copy()
    keep[:, 3] = False  # pretend token 3 is punctuation everywhere
    emb = np.asarray(
        encode_batch(params, ids, jnp.asarray(attn), jnp.asarray(keep), cfg=cfg,
                     dtype_name="float32")
    )
    assert emb.shape == (4, 12, 16)
    norms = np.linalg.norm(emb, axis=-1)
    np.testing.assert_allclose(norms[keep], 1.0, atol=1e-5)
    np.testing.assert_allclose(norms[~keep], 0.0, atol=1e-6)


def test_compact_doc_embeddings():
    emb = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    keep = np.array([[True, False, True, False], [True, True, True, False]])
    flat, doclens = compact_doc_embeddings(emb, keep)
    np.testing.assert_array_equal(doclens, [2, 3])
    assert flat.shape == (5, 3)
    np.testing.assert_array_equal(flat[0], emb[0, 0])
    np.testing.assert_array_equal(flat[1], emb[0, 2])
    np.testing.assert_array_equal(flat[2], emb[1, 0])


def test_load_checkpoint_roundtrip(tmp_path):
    """Full checkpoint-dir load: config.json + pytorch_model.bin with 'bert.'
    prefix + linear head + vocab.txt (reference: local_loading.jl:139-209)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel

    torch.manual_seed(0)
    model = BertModel(HFConfig(**TINY))
    sd = {f"bert.{k}": v for k, v in model.state_dict().items()}
    sd["linear.weight"] = torch.randn(8, TINY["hidden_size"])
    torch.save(sd, tmp_path / "pytorch_model.bin")
    with open(tmp_path / "config.json", "w") as f:
        json.dump(TINY, f)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[unused0]", "[unused1]"]
    vocab += [f"tok{i}" for i in range(TINY["vocab_size"] - len(vocab))]
    with open(tmp_path / "vocab.txt", "w") as f:
        f.write("\n".join(vocab) + "\n")

    from colbert_tpu.models.hf_loader import load_checkpoint

    cfg, params, tok = load_checkpoint(str(tmp_path))
    assert cfg.hidden_size == TINY["hidden_size"]
    assert params["linear"]["kernel"].shape == (TINY["hidden_size"], 8)
    assert "bias" not in params["linear"]
    assert params["bert"]["layers"]["q"]["kernel"].shape == (
        TINY["num_hidden_layers"], TINY["hidden_size"], TINY["hidden_size"],
    )
    assert tok.cls_id == 2


def test_load_checkpoint_requires_linear(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel

    model = BertModel(HFConfig(**TINY))
    torch.save(model.state_dict(), tmp_path / "pytorch_model.bin")
    with open(tmp_path / "config.json", "w") as f:
        json.dump(TINY, f)
    from colbert_tpu.models.hf_loader import load_checkpoint

    with pytest.raises(KeyError, match="linear"):
        load_checkpoint(str(tmp_path))
