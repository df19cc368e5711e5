"""k-means tests — mirrors reference test/utils.jl:5-138 (sub-kernels vs
closed-form, assignment argmin, smoke fit) plus recovery of planted clusters."""

import jax.numpy as jnp
import numpy as np

from colbert_tpu.ops import kmeans


def _planted(rng, k=8, per=50, dim=16, spread=0.01):
    centers = rng.standard_normal((k, dim)).astype(np.float32) * 3
    labels = np.repeat(np.arange(k), per)
    data = centers[labels] + spread * rng.standard_normal(
        (k * per, dim)
    ).astype(np.float32)
    return data, labels, centers


def test_assign_clusters_matches_bruteforce(rng):
    data = rng.standard_normal((37, 8)).astype(np.float32)
    cents = rng.standard_normal((5, 8)).astype(np.float32)
    got = np.asarray(kmeans.assign_clusters(jnp.asarray(data), jnp.asarray(cents), bsize=10))
    d2 = ((data[:, None, :] - cents[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(got, d2.argmin(1))


def test_lloyd_stats_matches_bruteforce(rng):
    data = rng.standard_normal((41, 8)).astype(np.float32)
    cents = rng.standard_normal((6, 8)).astype(np.float32)
    sums, counts = kmeans.lloyd_stats(jnp.asarray(data), jnp.asarray(cents), k=6, bsize=16)
    d2 = ((data[:, None, :] - cents[None]) ** 2).sum(-1)
    assign = d2.argmin(1)
    exp_counts = np.bincount(assign, minlength=6).astype(np.float32)
    exp_sums = np.zeros((6, 8), np.float32)
    np.add.at(exp_sums, assign, data)
    np.testing.assert_allclose(np.asarray(counts), exp_counts)
    np.testing.assert_allclose(np.asarray(sums), exp_sums, rtol=1e-5, atol=1e-5)


def test_empty_cluster_keeps_old_centroid():
    sums = jnp.zeros((3, 4))
    counts = jnp.asarray([2.0, 0.0, 1.0])
    old = jnp.ones((3, 4))
    new = kmeans.centroids_from_stats(sums, counts, old)
    np.testing.assert_allclose(np.asarray(new)[1], 1.0)  # kept
    np.testing.assert_allclose(np.asarray(new)[0], 0.0)  # updated


def test_kmeans_recovers_planted_clusters(rng):
    data, labels, centers = _planted(rng)
    res = kmeans.kmeans(jnp.asarray(data), 8, niters=25, seed=0, bsize=64)
    assert res.shift < 1e-2
    # quantization error is tiny relative to the data spread (Lloyd's from
    # random init may merge/split planted clusters, so only assert inertia)
    assign = np.asarray(res.assignments)
    learned = np.asarray(res.centroids)
    err = np.linalg.norm(data - learned[assign], axis=1).mean()
    assert err < 0.5 * np.linalg.norm(data - data.mean(0), axis=1).mean()


def test_kmeans_converges_from_planted_centers(rng):
    # initialized at the planted centers, one iteration is already a fixed
    # point up to the blob noise: shift must hit tol immediately
    data, labels, centers = _planted(rng, spread=0.001)
    cents = jnp.asarray(centers)
    new, shift = kmeans.lloyd_step(jnp.asarray(data), cents, k=8, bsize=64)
    assert float(shift) < 0.01
    assign = np.asarray(kmeans.assign_clusters(jnp.asarray(data), new, bsize=64))
    np.testing.assert_array_equal(assign, labels)


def test_kmeans_k_greater_than_n_raises(rng):
    data = jnp.asarray(rng.standard_normal((5, 4)).astype(np.float32))
    try:
        kmeans.kmeans(data, 10)
        assert False, "expected ValueError"
    except ValueError:
        pass
