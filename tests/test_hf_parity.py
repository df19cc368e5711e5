"""Activation-level parity vs the real HuggingFace BertModel.

The synthetic loader round-trip (test_hf_loader.py) only proves the loader
inverts this repo's own exporter — a wrong layernorm/gelu/head-ordering
convention would pass it and silently destroy MRR (SURVEY §7 hard-parts
list). Here the SAME random state dict initializes ``transformers.BertModel``
and this repo's scan-stacked encoder (via the production mapping
``hf_loader.params_from_state_dict``), and hidden states must agree to fp32
tolerance. Reference behavior being reproduced: the BERT forward the
reference gets from Transformers.jl (/root/reference/src/modelling/checkpoint.jl:21-25)
loaded by /root/reference/src/local_loading.jl:64-104.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from colbert_tpu.models.bert import BertConfig, bert_encode
from colbert_tpu.models.hf_loader import params_from_state_dict


def _hf_model(seed: int, **overrides):
    """Randomly initialized HF BertModel (no pooler) + matching our config."""
    kwargs = dict(
        vocab_size=97,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=48,
        type_vocab_size=2,
        layer_norm_eps=1e-12,
        hidden_act="gelu",
    )
    kwargs.update(overrides)
    torch.manual_seed(seed)
    hf_cfg = transformers.BertConfig(
        attn_implementation="eager", **kwargs
    )
    model = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    ours_cfg = BertConfig(**kwargs)
    return model, ours_cfg


def _ours_from_hf(model, ours_cfg):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return params_from_state_dict(sd, ours_cfg)


def _compare(model, ours_cfg, B, S, seed, atol=2e-4):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, ours_cfg.vocab_size, (B, S)).astype(np.int32)
    # ragged attention masks incl. one fully-attended row
    lens = rng.integers(max(1, S // 3), S + 1, B)
    lens[0] = S
    mask = (np.arange(S)[None, :] < lens[:, None])

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    out = np.asarray(
        bert_encode(
            _ours_from_hf(model, ours_cfg),
            jnp.asarray(ids),
            jnp.asarray(mask),
            cfg=ours_cfg,
            dtype_name="float32",
        )
    )
    # masked positions still produce hidden states in both implementations
    # (masked queries attend to the valid keys); compare everything
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=atol)


@pytest.mark.parametrize("B,S", [(2, 16), (3, 48), (1, 7)])
def test_hidden_states_match_hf(B, S):
    model, cfg = _hf_model(seed=0)
    _compare(model, cfg, B, S, seed=B * 100 + S)


def test_gelu_new_variant():
    """HF 'gelu_new' (tanh approximation) must route to the matching JAX
    gelu — mixing erf/tanh variants is a silent sub-1% activation skew."""
    model, cfg = _hf_model(seed=1, hidden_act="gelu_new")
    assert cfg.hidden_act == "gelu_new"
    _compare(model, cfg, 2, 24, seed=7)


def test_layer_norm_eps_respected():
    """The configured eps must reach the normalization itself. Through a
    full random-init forward the eps term is numerically invisible (hidden
    variance is O(1)), so this checks the unit convention against torch on
    engineered near-constant rows — where eps dominates the denominator."""
    from colbert_tpu.models.bert import _layer_norm

    rng = np.random.default_rng(5)
    H = 64
    # var ~1e-6: rsqrt(var + eps) differs by >10x between eps 1e-12 and 1e-3
    x = (1e-3 * rng.standard_normal((4, H)) + 0.5).astype(np.float32)
    scale = rng.standard_normal(H).astype(np.float32)
    bias = rng.standard_normal(H).astype(np.float32)
    outs = {}
    for eps in (1e-12, 1e-5, 1e-3):
        ref = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (H,),
            torch.from_numpy(scale), torch.from_numpy(bias), eps,
        ).numpy()
        ours = np.asarray(
            _layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), eps)
        )
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
        outs[eps] = ours
    # teeth: the eps values produce measurably different outputs here
    assert not np.allclose(outs[1e-12], outs[1e-3], rtol=1e-3, atol=1e-3)
    # and the full forward honors a non-default config eps end-to-end
    model, cfg = _hf_model(seed=2, layer_norm_eps=1e-5)
    _compare(model, cfg, 2, 24, seed=9)


def test_full_colbert_forward_matches_hf():
    """End-to-end: HF BertModel + torch linear head + L2 normalize ==
    this repo's fused query/doc forward (reference checkpoint.jl:21-25
    ``linear(bert(...))`` + normalize at checkpoint.jl:40-44)."""
    from colbert_tpu.models.colbert import encode_batch

    model, cfg = _hf_model(seed=3)
    dim = 24
    torch.manual_seed(4)
    linear = torch.nn.Linear(cfg.hidden_size, dim, bias=False).eval()

    params = {
        "bert": _ours_from_hf(model, cfg),
        "linear": {"kernel": jnp.asarray(linear.weight.detach().numpy().T)},
    }
    rng = np.random.default_rng(3)
    B, S = 3, 20
    ids = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), bool)
    keep = rng.random((B, S)) > 0.2

    with torch.no_grad():
        h = model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state
        proj = linear(h).numpy()
    proj = np.where(keep[..., None], proj, 0.0)
    norms = np.linalg.norm(proj, axis=-1, keepdims=True)
    ref = np.where(norms > 0, proj / np.maximum(norms, 1e-30), 0.0)

    out = np.asarray(
        encode_batch(
            params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(keep),
            cfg=cfg, dtype_name="float32",
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-4)
