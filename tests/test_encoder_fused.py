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


def test_compress_sample_matches_fused_chunk_path():
    """The small-corpus fast path (compress the device-resident sample
    instead of re-encoding — builder.py's `precomputed`) must reproduce the
    fused per-chunk encode+compress artifacts. The sample rides bf16, so
    codes/bucket ties may flip at ulp level; everything else is identical."""
    enc = make_encoder(dim=32, seed=0)
    passages = synthetic_collection(17, seed=7)
    buf, valid, doclens, layout = enc.encode_passages_to_device(
        passages, return_layout=True
    )
    k, nbits = 16, 2
    rng = np.random.default_rng(0)
    cent = rng.standard_normal((k, 32)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    cutoffs = jnp.asarray(np.array([-0.02, 0.0, 0.02], np.float32))
    cent_d = jnp.asarray(cent)

    codes_fast, res_fast = enc.compress_sample_to_host(
        buf, layout, doclens, cent_d, cutoffs, nbits=nbits
    )
    codes_ref, res_ref, dl_ref = enc.encode_passages_compressed(
        passages, cent_d, cutoffs, nbits=nbits
    )
    np.testing.assert_array_equal(doclens, dl_ref)
    assert codes_fast.shape == codes_ref.shape
    assert res_fast.shape == res_ref.shape
    # bf16 sample vs fp32 fused path: agreement must be near-total
    assert (codes_fast == codes_ref).mean() > 0.98
    assert (res_fast == res_ref).all(axis=1).mean() > 0.90


def test_builder_fast_path_produces_searchable_index(tmp_path):
    """An index built through the sample-reuse fast path (always taken at
    small corpus sizes: sample_pids covers N<=30720 entirely) must be
    complete and exact under search."""
    from colbert_tpu.indexing.builder import Indexer
    from colbert_tpu.indexing import builder as builder_mod

    enc = make_encoder(dim=32, seed=0)
    passages = synthetic_collection(24, seed=11)
    taken = {}
    orig = enc.compress_sample_to_host

    def spy(*a, **kw):
        taken["fast"] = True
        return orig(*a, **kw)

    enc.compress_sample_to_host = spy
    Indexer(enc.config, encoder=enc, collection=passages).index(
        str(tmp_path / "idx")
    )
    assert taken.get("fast"), "small corpus must take the sample-reuse path"
    from colbert_tpu.retrieval.searcher import Searcher

    s = Searcher(str(tmp_path / "idx"), encoder=enc)
    ranking = s.search(passages[5][:40], k=3)
    assert ranking[0][0] == 5


def test_encode_to_device_empty_input_honors_return_layout():
    enc = make_encoder(dim=32, seed=0)
    buf, valid, doclens = enc.encode_passages_to_device([])
    assert buf.shape == (0, 32) and valid.shape == (0,) and doclens.shape == (0,)
    buf, valid, doclens, layout = enc.encode_passages_to_device(
        [], return_layout=True
    )
    assert layout == []


def test_take_rows_bucketing_and_scatter_roundtrip():
    import numpy as np

    from colbert_tpu.models.encoder import _scatter_compact_rows, _take_rows

    rng = np.random.default_rng(7)
    keep = rng.random((5, 9)) < 0.6
    take, v = _take_rows(keep)
    assert v == int(keep.sum())
    assert take.shape[0] == 2048  # minimum bucket
    assert (take[:v] == np.flatnonzero(keep.reshape(-1))).all()
    assert (take[v:] == 0).all()

    # compacted rows scatter back to exactly where the block scatter puts them
    counts = keep.sum(axis=1).astype(np.int64)
    idx = np.array([3, 0, 4, 1, 2])  # original passage ids, batch order
    doclens = np.zeros(5, np.int64)
    doclens[idx] = counts
    dest_offsets = np.concatenate([[0], np.cumsum(doclens[:-1])])
    values = rng.standard_normal((5, 9, 4)).astype(np.float32)
    comp = values[keep]  # row-major kept rows, like the device gather
    out = np.zeros((int(counts.sum()), 4), np.float32)
    _scatter_compact_rows(out, dest_offsets, idx, counts, comp)
    from colbert_tpu.models.encoder import _scatter_compact

    out_block = np.zeros_like(out)
    _scatter_compact(out_block, dest_offsets, idx, keep, values)
    assert (out == out_block).all()
