"""Flash attention kernel vs the XLA materialized-attention path (interpret
mode; the real Mosaic compile is exercised on TPU by bench/entry)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops.flash_attention import flash_attention


def _reference(q, k, v, bias2d, num_heads):
    # q/k/v: (B*H, S, hd); bias2d: (B, S)
    BH, S, hd = q.shape
    B = BH // num_heads
    scores = jnp.einsum("nqd,nkd->nqk", q, k) / math.sqrt(hd)
    bias = jnp.repeat(bias2d, num_heads, axis=0)  # (B*H, S)
    scores = scores + bias[:, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", probs, v)


@pytest.mark.parametrize("S,block", [(128, 128), (256, 128)])
def test_flash_matches_reference(rng, S, block):
    B, H, hd = 2, 3, 32
    q = jnp.asarray(rng.standard_normal((B * H, S, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B * H, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B * H, S, hd)), jnp.float32)
    mask = np.ones((B, S), bool)
    mask[1, S // 2:] = False  # padding on one batch row
    bias = jnp.where(jnp.asarray(mask), 0.0, -1e30).astype(jnp.float32)

    got = flash_attention(q, k, v, bias, num_heads=H, block_q=block,
                          block_k=block, interpret=True)
    want = _reference(q, k, v, bias, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_rejects_unaligned():
    q = jnp.zeros((2, 100, 32))
    bias = jnp.zeros((1, 100))
    with pytest.raises(ValueError, match="multiple"):
        flash_attention(q, q, q, bias, num_heads=2, interpret=True)


def test_bert_encode_flash_matches_xla(rng):
    from colbert_tpu.models.bert import BertConfig, bert_encode, init_bert_params

    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=128,
    )
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(0, 64, (2, 128)), jnp.int32)
    mask = np.ones((2, 128), bool)
    mask[1, 64:] = False
    a = bert_encode(params, ids, jnp.asarray(mask), cfg=cfg, dtype_name="float32")
    # interpret-mode flash inside the full encoder (CPU test path)
    import colbert_tpu.ops.flash_attention as fa
    import functools
    orig = fa.flash_attention
    fa.flash_attention = functools.partial(orig, interpret=True)
    try:
        b = bert_encode(params, ids, jnp.asarray(mask), cfg=cfg,
                        dtype_name="float32", use_flash=True)
    finally:
        fa.flash_attention = orig
    got, want = np.asarray(b), np.asarray(a)
    err = np.abs(got - want)[np.asarray(mask)]
    assert err.max() < 5e-4, err.max()
