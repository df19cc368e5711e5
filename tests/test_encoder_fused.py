"""Fused/device-resident encode paths must match the reference-equivalent
stepwise path exactly."""

import jax.numpy as jnp
import numpy as np

from colbert_tpu.ops import codec as codec_ops
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


def test_encode_to_device_matches_host_path():
    enc = make_encoder(dim=32, seed=0)
    passages = synthetic_collection(13, seed=3)  # odd count: partial batches
    flat_host, dl_host = enc.encode_passages(passages)
    flat_dev, valid, dl_dev = enc.encode_passages_to_device(passages)
    np.testing.assert_array_equal(dl_host, dl_dev)
    got = np.asarray(flat_dev, np.float32)[valid]
    assert got.shape == flat_host.shape
    # the device-resident sample rides in bf16 (HBM halving for codec
    # training); the host fp32 values must match exactly after the same cast
    import jax.numpy as jnp

    want = np.asarray(jnp.asarray(flat_host, jnp.bfloat16), np.float32)
    # row order differs (encode order vs passage order): compare as multisets
    # via lexicographic sort
    order_a = np.lexsort(got.T)
    order_b = np.lexsort(want.T)
    np.testing.assert_array_equal(got[order_a], want[order_b])
    # padded rows are exactly zero
    np.testing.assert_allclose(np.asarray(flat_dev)[~valid], 0.0)


def test_transfer_dtype_bf16_default_close_to_fp32():
    """Default D2H payload is bf16 (the tunneled-link bottleneck); outputs
    stay fp32 and must match the fp32-wire values to bf16 rounding."""
    enc = make_encoder(dim=32, seed=0)
    passages = synthetic_collection(9, seed=5)
    assert enc.config.transfer_dtype == "bfloat16"
    flat_bf16, dl_a = enc.encode_passages(passages)
    assert flat_bf16.dtype == np.float32
    enc.config.transfer_dtype = "float32"
    flat_fp32, dl_b = enc.encode_passages(passages)
    np.testing.assert_array_equal(dl_a, dl_b)
    # unit-norm embeddings: bf16 has 8 mantissa bits -> |err| <= 2^-8
    assert np.abs(flat_bf16 - flat_fp32).max() <= 1 / 256
    # and the bf16-wire values are exactly the fp32 ones rounded to bf16
    want = np.asarray(jnp.asarray(flat_fp32, jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(flat_bf16, want)


def test_transfer_dtype_int8_quantized_wire():
    """int8 wire: device quantizes round(x*127), host dequantizes /127 —
    error bounded by half a quantization step per component."""
    enc = make_encoder(dim=32, seed=0)
    passages = synthetic_collection(9, seed=5)
    enc.config.transfer_dtype = "float32"
    flat_fp32, dl_a = enc.encode_passages(passages)
    enc.config.transfer_dtype = "int8"
    flat_i8, dl_b = enc.encode_passages(passages)
    np.testing.assert_array_equal(dl_a, dl_b)
    assert flat_i8.dtype == np.float32
    assert np.abs(flat_i8 - flat_fp32).max() <= 0.5 / 127 + 1e-6
    # dequantized values land exactly on the int8 grid
    grid = np.round(flat_i8 * 127)
    np.testing.assert_allclose(flat_i8 * 127, grid, atol=1e-4)


def test_encode_compressed_matches_stepwise():
    enc = make_encoder(dim=32, seed=0)
    # the stepwise oracle compresses host-side embeddings; keep the wire
    # fp32 so codes can't flip at bucket/argmax boundaries vs the fused path
    enc.config.transfer_dtype = "float32"
    passages = synthetic_collection(11, seed=4)
    rng = np.random.default_rng(0)
    k = 16
    centroids = rng.standard_normal((k, 32)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    cutoffs = np.asarray([-0.05, 0.0, 0.05], np.float32)

    codes_f, res_f, dl_f = enc.encode_passages_compressed(
        passages, jnp.asarray(centroids), jnp.asarray(cutoffs), nbits=2
    )
    embs, dl = enc.encode_passages(passages)
    codes_s, res_s = codec_ops.compress(
        jnp.asarray(embs), jnp.asarray(centroids), jnp.asarray(cutoffs), nbits=2
    )
    np.testing.assert_array_equal(dl_f, dl)
    np.testing.assert_array_equal(codes_f, np.asarray(codes_s))
    np.testing.assert_array_equal(res_f, np.asarray(res_s))
