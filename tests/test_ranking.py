"""Ranking tests — emb2pid, IVF candidate generation, padded gather, MaxSim
vs brute force (reference: test/search/ranking.jl, test/searching.jl)."""

import jax.numpy as jnp
import numpy as np

from colbert_tpu.indexing.builder import build_ivf
from colbert_tpu.ops import codec as codec_ops
from colbert_tpu.ops.maxsim import maxsim_scores
from colbert_tpu.retrieval import ranking


def test_build_emb2pid():
    doclens = np.asarray([2, 0, 3, 1])
    emb2pid = ranking.build_emb2pid(doclens)
    np.testing.assert_array_equal(emb2pid, [0, 0, 2, 2, 2, 3])  # zero-len doc skipped


def test_candidate_pids_vs_handbuilt_ivf(rng):
    # reference ranking.jl:13-36 — random ground-truth inverted file
    ncent, nemb = 10, 100
    codes = rng.integers(0, ncent, nemb).astype(np.uint32)
    ivf, ivf_lengths = build_ivf(codes, ncent)
    # ivf groups embedding ids by code
    offsets = np.concatenate([[0], np.cumsum(ivf_lengths)])
    for c in range(ncent):
        np.testing.assert_array_equal(
            np.sort(ivf[offsets[c]:offsets[c + 1]]), np.where(codes == c)[0]
        )
    doclens = np.full(20, 5)
    emb2pid = ranking.build_emb2pid(doclens)
    cells = np.asarray([[1, 3], [3, 7]])
    pids = ranking.candidate_pids(cells, ivf, ivf_lengths, emb2pid)
    want_eids = np.where(np.isin(codes, [1, 3, 7]))[0]
    np.testing.assert_array_equal(pids, np.unique(emb2pid[want_eids]))


def test_candidate_pids_empty():
    pids = ranking.candidate_pids(
        np.zeros((0, 2), int), np.zeros(0, int), np.zeros(3, int), np.zeros(0, int)
    )
    assert len(pids) == 0


def test_probe_centroids_topk(rng):
    Q = rng.standard_normal((2, 4, 8)).astype(np.float32)
    C = rng.standard_normal((20, 8)).astype(np.float32)
    cells = np.asarray(ranking.probe_centroids(jnp.asarray(Q), jnp.asarray(C), nprobe=3))
    assert cells.shape == (2, 4, 3)
    scores = np.einsum("bqd,kd->bqk", Q, C)
    for b in range(2):
        for q in range(4):
            np.testing.assert_array_equal(
                np.sort(cells[b, q]), np.sort(np.argsort(-scores[b, q])[:3])
            )


def test_gather_padded(rng):
    doclens = np.asarray([3, 5, 2, 4])
    offsets = np.concatenate([[0], np.cumsum(doclens[:-1])])
    pids = np.asarray([1, 3])
    idx, mask = ranking.gather_padded(pids, doclens, offsets, len_bucket=8, pid_bucket=4)
    assert idx.shape == (4, 8) and mask.shape == (4, 8)
    np.testing.assert_array_equal(idx[0, :5], [3, 4, 5, 6, 7])  # pid 1 embs
    assert mask[0, :5].all() and not mask[0, 5:].any()
    np.testing.assert_array_equal(idx[1, :4], [10, 11, 12, 13])  # pid 3 embs
    assert not mask[2:].any()  # padded rows


def test_maxsim_vs_bruteforce(rng):
    # reference ranking.jl:137-162 — maxsim vs hand scores
    B, Lq, dim, P, Ld = 2, 4, 8, 5, 6
    Q = rng.standard_normal((B, Lq, dim)).astype(np.float32)
    D = rng.standard_normal((P, Ld, dim)).astype(np.float32)
    mask = rng.random((P, Ld)) > 0.3
    mask[0] = False  # one empty passage
    got = np.asarray(maxsim_scores(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(mask),
                                   pid_chunk=2))
    want = np.zeros((B, P), np.float32)
    for b in range(B):
        for p in range(P):
            if not mask[p].any():
                continue
            s = Q[b] @ D[p][mask[p]].T  # (Lq, real_tokens)
            want[b, p] = s.max(axis=1).sum()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_score_full_matches_numpy_decompress_maxsim(rng):
    """Fused decompress+MaxSim == decompress-then-maxsim done stepwise."""
    nbits, dim, k = 2, 16, 8
    n = 30
    centroids = rng.standard_normal((k, dim)).astype(np.float32)
    codes = rng.integers(0, k, n).astype(np.uint32)
    cutoffs = np.sort(rng.standard_normal(3)).astype(np.float32)
    weights = np.sort(rng.standard_normal(4)).astype(np.float32)
    packed = np.asarray(codec_ops.pack_bits(codec_ops.binarize(
        jnp.asarray(rng.integers(0, 4, (n, dim)), jnp.int32), nbits)))

    doclens = np.asarray([10, 8, 12])
    offsets = np.asarray([0, 10, 18])
    pids = np.asarray([0, 2])
    idx, mask = ranking.gather_padded(pids, doclens, offsets, len_bucket=16, pid_bucket=2)
    Q = rng.standard_normal((1, 4, dim)).astype(np.float32)

    got = np.asarray(ranking.score_full(
        jnp.asarray(Q), jnp.asarray(codes[idx]), jnp.asarray(packed[idx]),
        jnp.asarray(mask), jnp.asarray(centroids), jnp.asarray(weights), nbits=nbits,
    ))[0, :2]

    embs = np.asarray(codec_ops.decompress(
        jnp.asarray(codes), jnp.asarray(packed), jnp.asarray(centroids),
        jnp.asarray(weights), nbits=nbits))
    want = []
    for p, off, dl in [(0, 0, 10), (2, 18, 12)]:
        s = Q[0] @ embs[off:off + dl].T
        want.append(s.max(axis=1).sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_score_approx_upper_structure(rng):
    """Approx scores use centroid embeddings: equal to full scores when
    residuals are zero-decoded (weights all zero) and centroids unit-norm."""
    nbits, dim, k = 1, 8, 6
    centroids = rng.standard_normal((k, dim)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    n = 12
    codes = rng.integers(0, k, n).astype(np.uint32)
    doclens = np.asarray([6, 6])
    offsets = np.asarray([0, 6])
    pids = np.asarray([0, 1])
    idx, mask = ranking.gather_padded(pids, doclens, offsets, len_bucket=8, pid_bucket=2)
    Q = rng.standard_normal((1, 3, dim)).astype(np.float32)
    approx = np.asarray(ranking.score_approx(
        jnp.asarray(Q), jnp.asarray(codes[idx]), jnp.asarray(mask),
        jnp.asarray(centroids), pid_chunk=2))[0]
    # brute force with centroid embeddings
    embs = centroids[codes]
    for p, (off, dl) in enumerate([(0, 6), (6, 6)]):
        s = Q[0] @ embs[off:off + dl].T
        np.testing.assert_allclose(approx[p], s.max(axis=1).sum(), rtol=1e-5)
