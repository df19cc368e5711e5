"""Training: the jitted contrastive step must optimize the real encoder —
loss falls, pos/neg margin grows — and its MaxSim math must match the
retrieval scorer. (No reference equivalent: training is the reference's
roadmap item, README.md:179-190.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.training.trainer import (
    ColBERTTrainer,
    colbert_maxsim,
    pairwise_softmax_loss,
)
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


def test_colbert_maxsim_matches_reference_math(rng):
    B, Lq, Ld, dim = 3, 4, 6, 8
    Q = rng.standard_normal((B, Lq, dim)).astype(np.float32)
    D = rng.standard_normal((B, Ld, dim)).astype(np.float32)
    dmask = rng.random((B, Ld)) > 0.3
    dmask[:, 0] = True  # every doc has at least one token
    S = np.asarray(colbert_maxsim(jnp.asarray(Q), jnp.asarray(D), jnp.asarray(dmask)))
    # hand-computed: per query token, max over REAL doc tokens (ranking.jl:69-87)
    for qi in range(B):
        for di in range(B):
            want = sum(
                max(float(Q[qi, l] @ D[di, m]) for m in range(Ld) if dmask[di, m])
                for l in range(Lq)
            )
            np.testing.assert_allclose(S[qi, di], want, rtol=1e-5, atol=1e-5)


def test_pairwise_loss_properties():
    pos = jnp.asarray([5.0, 5.0])
    neg = jnp.asarray([1.0, 1.0])
    good = float(pairwise_softmax_loss(pos, neg))
    bad = float(pairwise_softmax_loss(neg, pos))
    assert good < bad
    even = float(pairwise_softmax_loss(pos, pos))
    np.testing.assert_allclose(even, np.log(2), rtol=1e-5)


def test_distill_kl_properties():
    from colbert_tpu.training.trainer import distill_kl_loss

    logits = jnp.asarray([[3.0, 1.0], [0.5, 2.5]])
    # matching teacher (any constant shift) -> zero loss
    np.testing.assert_allclose(
        float(distill_kl_loss(logits, logits + 7.0)), 0.0, atol=1e-6
    )
    # disagreeing teacher -> positive loss
    assert float(distill_kl_loss(logits, -logits)) > 0.1


def test_distillation_follows_teacher_not_labels():
    """With inverted teacher scores (teacher prefers the 'negative'), KL
    training must push the student's margin NEGATIVE — proof the step
    optimizes the teacher distribution, not the contrastive labels."""
    import optax

    enc = make_encoder(dim=32, seed=0)
    trainer = ColBERTTrainer(enc, optimizer=optax.adam(1e-3))
    triples = _triples(8, seed=3)
    teacher = np.tile(np.asarray([[0.0, 4.0]], np.float32), (8, 1))  # neg wins
    first = trainer.train_step(triples, teacher_scores=teacher)
    for _ in range(14):
        last = trainer.train_step(triples, teacher_scores=teacher)
    assert last["loss"] < first["loss"]
    assert last["margin"] < 0  # student learned the teacher's preference


def _triples(n, seed=0):
    """Positives share the query's words; negatives come from other docs."""
    rng = np.random.default_rng(seed)
    docs = synthetic_collection(2 * n, seed=seed + 1, words_per_doc=10)
    out = []
    for i in range(n):
        pos = docs[i]
        words = pos.split()
        q = " ".join(rng.choice(words, size=min(4, len(words)), replace=False))
        out.append((q, pos, docs[n + i]))
    return out


@pytest.mark.parametrize("in_batch", [True, False])
def test_training_improves_margin(in_batch):
    import optax

    enc = make_encoder(dim=32, seed=0)
    trainer = ColBERTTrainer(
        enc, optimizer=optax.adam(1e-3), in_batch_negatives=in_batch
    )
    triples = _triples(8, seed=3)
    first = trainer.train_step(triples)
    for _ in range(14):
        last = trainer.train_step(triples)
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"]
    assert last["margin"] > first["margin"]
    assert last["pairwise_acc"] >= 0.75  # positives clearly beat negatives


def test_trained_params_flow_into_retrieval(tmp_path):
    """The trainer mutates encoder.params in place — a subsequent index
    build + search uses the fine-tuned weights (one encoder object end to
    end, like the reference's Indexer/Searcher share the checkpoint)."""
    import optax

    from colbert_tpu.indexing.builder import Indexer
    from colbert_tpu.retrieval.searcher import Searcher

    enc = make_encoder(dim=32, seed=0)
    before = np.asarray(enc.params["linear"]["kernel"]).copy()
    trainer = ColBERTTrainer(enc, optimizer=optax.adam(1e-3))
    trainer.train(_triples(12, seed=5), batch_size=6, epochs=1)
    after = np.asarray(enc.params["linear"]["kernel"])
    assert np.abs(after - before).max() > 1e-5  # params actually moved

    passages = synthetic_collection(30, seed=2)
    path = str(tmp_path / "idx")
    Indexer(enc.config, encoder=enc, collection=passages).index(path)
    s = Searcher(path, encoder=enc)
    pids, _ = s.search_batch([passages[4], passages[21]], k=3)
    assert pids[0][0] == 4 and pids[1][0] == 21

    # fine-tuned weights export as an HF-compatible checkpoint and load
    # back bit-for-bit through the production loader
    from colbert_tpu.models.hf_loader import load_checkpoint

    ckpt = str(tmp_path / "ckpt")
    trainer.save_checkpoint(ckpt)
    cfg2, params2, tok2 = load_checkpoint(ckpt)
    for a, b in zip(
        jax.tree.leaves(enc.params), jax.tree.leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert tok2.vocab == enc.tokenizer.vocab
