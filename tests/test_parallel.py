"""Multi-device tests on the 8-device virtual CPU mesh: sharded k-means,
data-parallel encode, and sharded scoring must match their single-device
counterparts exactly (the reference has no distributed code to test —
SURVEY §2 'Parallelism inventory: none')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops import codec as codec_ops
from colbert_tpu.ops import kmeans as kmeans_ops
from colbert_tpu.parallel.mesh import make_mesh
from colbert_tpu.parallel import kmeans_dist, search_dist
from colbert_tpu.retrieval import ranking


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    return make_mesh(8, 1)


def test_sharded_lloyd_step_matches_single(rng, mesh):
    n, dim, k = 203, 16, 10  # deliberately not divisible by 8
    data = rng.standard_normal((n, dim)).astype(np.float32)
    cents = data[:k].copy()
    ndev = 8
    padded = -(-n // ndev) * ndev
    data_p = np.zeros((padded, dim), np.float32)
    data_p[:n] = data
    w = np.zeros(padded, np.float32)
    w[:n] = 1
    new_sh, shift_sh = kmeans_dist.lloyd_step_sharded(
        jnp.asarray(data_p), jnp.asarray(cents), jnp.asarray(w), mesh, k=k, bsize=32
    )
    new_1, shift_1 = kmeans_ops.lloyd_step(jnp.asarray(data), jnp.asarray(cents), k=k, bsize=32)
    np.testing.assert_allclose(np.asarray(new_sh), np.asarray(new_1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(shift_sh), float(shift_1), rtol=1e-4)


def test_kmeans_sharded_full_fit(rng, mesh):
    data = rng.standard_normal((500, 8)).astype(np.float32)
    res = kmeans_dist.kmeans_sharded(data, 16, mesh, niters=8, seed=0, bsize=64)
    res1 = kmeans_ops.kmeans(jnp.asarray(data), 16, niters=8, seed=0, bsize=64)
    # same init + same math => identical trajectories (fp reassoc tolerance)
    np.testing.assert_allclose(
        np.asarray(res.centroids), np.asarray(res1.centroids), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(res.assignments, np.asarray(res1.assignments))


def test_encode_dp_matches_single(rng, mesh):
    """The production DP encode (ColBERTEncoder.attach_mesh + _put_batch,
    what Indexer wires up) must equal the single-device forward exactly."""
    from colbert_tpu.models.bert import BertConfig
    from colbert_tpu.models.colbert import encode_batch, init_colbert_params
    from colbert_tpu.utils.testing import make_encoder

    enc = make_encoder(dim=16, seed=0, bert_config=BertConfig.tiny())
    enc.config.activation_dtype = "float32"
    enc.attach_mesh(mesh)
    cfg = enc.bert_config
    ids = rng.integers(0, cfg.vocab_size, size=(11, 12)).astype(np.int32)  # 11 % 8 != 0
    mask = np.ones((11, 12), bool)
    keep = mask.copy()
    keep[:, 0] = False
    ids_d, mask_d, keep_d = enc._put_batch(ids, mask, keep)
    assert ids_d.shape[0] == 16  # padded to the 8-device data axis
    out_dp = np.asarray(encode_batch(
        enc.params, ids_d, mask_d, keep_d, cfg=cfg, dtype_name="float32",
    ))[:11]
    out_1 = np.asarray(encode_batch(
        enc.params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(keep),
        cfg=cfg, dtype_name="float32",
    ))
    np.testing.assert_allclose(out_dp, out_1, rtol=1e-4, atol=1e-5)


def test_tp_encode_matches_single(rng):
    """Megatron-sharded params (2 data x 4 model) must reproduce the
    replicated forward exactly up to float reassociation."""
    from colbert_tpu.models.bert import BertConfig
    from colbert_tpu.models.colbert import encode_batch
    from colbert_tpu.parallel.tp import shard_params, validate_tp
    from colbert_tpu.utils.testing import make_encoder

    enc = make_encoder(dim=16, seed=0, bert_config=BertConfig.tiny())
    cfg = enc.bert_config  # 4 heads, intermediate 128: divisible by model=4
    ids = rng.integers(0, cfg.vocab_size, size=(8, 12)).astype(np.int32)
    mask = np.ones((8, 12), bool)
    keep = mask.copy()
    keep[:, 2] = False
    out_1 = np.asarray(encode_batch(
        enc.params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(keep),
        cfg=cfg, dtype_name="float32",
    ))

    tp_mesh = make_mesh(2, 4)
    enc.attach_mesh(tp_mesh)
    # params actually sharded on the model axis
    qk = enc.params["bert"]["layers"]["q"]["kernel"]
    assert "model" in qk.sharding.spec
    ids_d, mask_d, keep_d = enc._put_batch(ids, mask, keep)
    out_tp = np.asarray(encode_batch(
        enc.params, ids_d, mask_d, keep_d, cfg=cfg, dtype_name="float32",
    ))
    np.testing.assert_allclose(out_tp, out_1, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError):
        validate_tp(BertConfig(num_attention_heads=6), 4)


def test_sharded_scoring_topk_matches_single(rng, mesh):
    nbits, dim, kcent = 2, 16, 12
    n = 64 * 8  # embeddings
    centroids = rng.standard_normal((kcent, dim)).astype(np.float32)
    codes = rng.integers(0, kcent, n).astype(np.uint32)
    packed = np.asarray(codec_ops.pack_bits(codec_ops.binarize(
        jnp.asarray(rng.integers(0, 4, (n, dim)), jnp.int32), nbits)))
    weights = np.sort(rng.standard_normal(4)).astype(np.float32)

    P_rows = 32  # 32 candidate passages x Ld=16 tokens, 32 % 8 == 0
    doclens = np.full(P_rows, 16)
    offsets = np.arange(P_rows) * 16
    pids = np.arange(P_rows)
    idx, mask = ranking.gather_padded(pids, doclens, offsets, len_bucket=16, pid_bucket=8)
    Q = rng.standard_normal((2, 4, dim)).astype(np.float32)

    scores_sh, rows_sh = search_dist.score_full_sharded_topk(
        jnp.asarray(Q), codes[idx], packed[idx], mask,
        jnp.asarray(centroids), jnp.asarray(weights), mesh, nbits=nbits, k=5,
    )
    full = np.asarray(ranking.score_full(
        jnp.asarray(Q), jnp.asarray(codes[idx]), jnp.asarray(packed[idx]),
        jnp.asarray(mask), jnp.asarray(centroids), jnp.asarray(weights), nbits=nbits,
    ))
    for b in range(2):
        want_rows = np.argsort(-full[b])[:5]
        np.testing.assert_array_equal(np.sort(rows_sh[b]), np.sort(want_rows))
        np.testing.assert_allclose(
            np.sort(scores_sh[b]), np.sort(full[b][want_rows]), rtol=1e-5
        )


def test_mesh_shapes():
    m = make_mesh(4, 2)
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(16, 1)
