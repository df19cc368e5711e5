"""Codec unit tests — mirrors the reference's roundtrip/inversion properties
(reference: test/indexing/codecs/residual.jl:154, :844, :975 and the
compress_into_codes permuted-centroid test at :5-57)."""

import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops import codec


NBITS = [1, 2, 4, 8]


def test_bucket_indices_hand_computed():
    # reference test residual.jl:163 style: hand-computed bucket ids
    cutoffs = jnp.asarray([0.0, 0.5, 1.0])
    vals = jnp.asarray([[-1.0, 0.0, 0.25, 0.5, 0.75, 1.0, 2.0]])
    idx = codec.bucket_indices(vals, cutoffs)
    # number of cutoffs strictly less than v (searchsortedfirst - 1)
    np.testing.assert_array_equal(np.asarray(idx), [[0, 0, 1, 1, 2, 2, 3]])


@pytest.mark.parametrize("nbits", NBITS)
def test_unbinarize_inverts_binarize(rng, nbits):
    data = jnp.asarray(rng.integers(0, 1 << nbits, size=(50, 16)), dtype=jnp.int32)
    bits = codec.binarize(data, nbits)
    assert bits.shape == (50, 16, nbits)
    back = codec.unbinarize(bits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(data))


@pytest.mark.parametrize("nbits", NBITS)
def test_unpackbits_inverts_packbits(rng, nbits):
    bits = jnp.asarray(rng.integers(0, 2, size=(30, 32, nbits)), dtype=jnp.int32)
    packed = codec.pack_bits(bits)
    assert packed.shape == (30, 32 * nbits // 8)
    assert packed.dtype == jnp.uint8
    back = codec.unpack_bits(packed, nbits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))


def test_packbits_lsb_first_layout():
    # bit b of dim d sits at flat position d*nbits + b, packed LSB-first:
    # value 1 (nbits=1) at dim 0 only -> first byte == 0b00000001
    bits = np.zeros((1, 8, 1), dtype=np.int32)
    bits[0, 0, 0] = 1
    packed = codec.pack_bits(jnp.asarray(bits))
    assert int(packed[0, 0]) == 1
    bits[0, 0, 0] = 0
    bits[0, 7, 0] = 1  # dim 7 -> MSB of first byte
    packed = codec.pack_bits(jnp.asarray(bits))
    assert int(packed[0, 0]) == 128
    # nbits=2: dim0 value 2 -> bit1 set -> flat position 1 -> byte 0b00000010
    idx = np.zeros((1, 4), dtype=np.int32)
    idx[0, 0] = 2
    packed = codec.pack_bits(codec.binarize(jnp.asarray(idx), 2))
    assert int(packed[0, 0]) == 2


@pytest.mark.parametrize("nbits", [1, 2, 4])
def test_unpack_bits_uint32_lanes_match_bytes(rng, nbits):
    # the flat device residual layout views packed byte rows as little-endian
    # uint32 lanes; unpack_bits must decode identically from either width
    dim = 32
    idx = rng.integers(0, 1 << nbits, size=(40, dim))
    packed = codec.pack_bits(codec.binarize(jnp.asarray(idx, np.int32), nbits))
    p8 = np.asarray(packed)
    p32 = jnp.asarray(np.ascontiguousarray(p8).view(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(codec.unpack_bits(packed, nbits)),
        np.asarray(codec.unpack_bits(p32, nbits)),
    )


@pytest.mark.parametrize("nbits", [1, 2, 4])
def test_decompress_residuals_inverts_binarize(rng, nbits):
    # reference residual.jl test :975 — with bucket_weights placed at bucket
    # ids, decompress_residuals recovers the bucket id of each residual.
    dim = 24
    weights = jnp.arange(1 << nbits, dtype=jnp.float32)
    idx = rng.integers(0, 1 << nbits, size=(40, dim))
    packed = codec.pack_bits(codec.binarize(jnp.asarray(idx, dtype=jnp.int32), nbits))
    out = codec.decompress_residuals(packed, weights, nbits=nbits)
    np.testing.assert_array_equal(np.asarray(out), idx.astype(np.float32))


def test_compress_into_codes_identity_permutation(rng):
    # reference residual.jl:5-57 — embeddings that *are* permuted centroids
    # code back to their own centroid.
    k, dim = 100, 16
    centroids = rng.standard_normal((k, dim)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    perm = rng.permutation(k)
    codes = codec.compress_into_codes(
        jnp.asarray(centroids[perm]), jnp.asarray(centroids), bsize=17
    )
    np.testing.assert_array_equal(np.asarray(codes), perm)


@pytest.mark.parametrize("nbits", [2, 4])
def test_compress_decompress_roundtrip_accuracy(rng, nbits):
    """End-to-end codec property: reconstruction ≈ original when residuals are
    small and bucket weights are representative."""
    n, k, dim = 500, 32, 32
    centroids = rng.standard_normal((k, dim)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    assign = rng.integers(0, k, size=n)
    noise = 0.02 * rng.standard_normal((n, dim)).astype(np.float32)
    embs = centroids[assign] + noise
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)

    res = embs - centroids[np.asarray(
        codec.compress_into_codes(jnp.asarray(embs), jnp.asarray(centroids))
    )]
    cutoffs, weights, avg = codec.bucket_cutoffs_and_weights(nbits, jnp.asarray(res))
    assert cutoffs.shape == ((1 << nbits) - 1,)
    assert weights.shape == (1 << nbits,)
    assert float(avg) > 0

    codes, packed = codec.compress(
        jnp.asarray(embs), jnp.asarray(centroids), cutoffs, nbits=nbits
    )
    recon = codec.decompress(
        codes, packed, jnp.asarray(centroids), weights, nbits=nbits
    )
    cos = np.sum(np.asarray(recon) * embs, axis=1)
    assert cos.mean() > 0.98


def test_zero_residual_property(rng):
    # reference collection_indexer.jl:113-166 — if heldout ⊂ centroids the
    # residuals are exactly zero and all cutoffs/weights are 0.
    k, dim = 20, 16
    centroids = rng.standard_normal((k, dim)).astype(np.float32)
    codes = codec.compress_into_codes(jnp.asarray(centroids), jnp.asarray(centroids))
    res = centroids - centroids[np.asarray(codes)]
    cutoffs, weights, avg = codec.bucket_cutoffs_and_weights(2, jnp.asarray(res))
    assert float(avg) == 0.0
    np.testing.assert_allclose(np.asarray(cutoffs), 0.0)
    np.testing.assert_allclose(np.asarray(weights), 0.0)


def test_bucket_quantile_parity():
    # hand value check (reference collection_indexer.jl:85-111): for nbits=1,
    # cutoff = median, weights = 25th/75th percentiles (linear interpolation)
    data = jnp.asarray(np.arange(101, dtype=np.float32))
    cutoffs, weights, _ = codec.bucket_cutoffs_and_weights(1, data)
    np.testing.assert_allclose(np.asarray(cutoffs), [50.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(weights), [25.0, 75.0], atol=1e-5)
