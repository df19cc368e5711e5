"""Contrastive training of the ColBERT encoder (query, positive, negative).

The training objective is the original ColBERT pairwise softmax
cross-entropy over (d+, d-) MaxSim scores (Khattab & Zaharia, 2020 —
the recipe the reference's checkpoint `colbert-ir/colbertv2.0` descends
from), optionally widened with in-batch negatives: every other query's
positive serves as an extra negative, which is free on TPU because the
(B, B) score matrix is one einsum.

TPU-first shape: ONE jitted program per step — query forward, doc forward,
MaxSim, loss, backward, and the optax update all fuse under jit; no
Python-side per-sample work. Data parallelism = shard the batch leading dim
over a mesh (params replicated); XLA inserts the gradient all-reduce.

The reference has no training code; "training support" is its roadmap item
(README.md:179-190).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from colbert_tpu.models.bert import BertConfig
from colbert_tpu.models.colbert import ColBERTParams, encode_batch

__all__ = [
    "colbert_maxsim",
    "pairwise_softmax_loss",
    "distill_kl_loss",
    "make_train_step",
    "ColBERTTrainer",
]


def colbert_maxsim(Q: jax.Array, D: jax.Array, dmask: jax.Array) -> jax.Array:
    """Late-interaction scores: sum over query tokens of the max dot product
    over doc tokens (reference scoring math: ranking.jl:69-87), batched all
    queries x all docs -> (Bq, Bd).

    ``Q``: (Bq, Lq, dim) normalized; ``D``: (Bd, Ld, dim) normalized;
    ``dmask``: (Bd, Ld) True on real doc tokens (masked positions are
    excluded from the max).
    """
    sim = jnp.einsum("qld,bmd->qblm", Q, D, preferred_element_type=jnp.float32)
    sim = jnp.where(dmask[None, :, None, :], sim, -jnp.inf)
    per_qtok = jnp.max(sim, axis=-1)            # (Bq, Bd, Lq)
    # queries are MASK-padded to fixed length (all positions real), but a
    # doc with zero real tokens would give -inf maxima: clamp to 0
    per_qtok = jnp.where(jnp.isfinite(per_qtok), per_qtok, 0.0)
    return per_qtok.sum(axis=-1)                # (Bq, Bd)


def pairwise_softmax_loss(
    scores_pos: jax.Array, scores_neg: jax.Array
) -> jax.Array:
    """Original ColBERT objective: CE over the (pos, neg) score pair."""
    logits = jnp.stack([scores_pos, scores_neg], axis=-1)  # (B, 2)
    return -jax.nn.log_softmax(logits, axis=-1)[..., 0].mean()


def distill_kl_loss(student_logits: jax.Array, teacher_scores: jax.Array) -> jax.Array:
    """ColBERTv2's distillation objective: KL(softmax(teacher) ||
    softmax(student)) over each example's candidate scores (Santhanam et
    al. 2022 — the recipe behind the reference's own checkpoint). Zero
    exactly when the student reproduces the teacher's score gaps."""
    t = jax.nn.softmax(teacher_scores, axis=-1)
    return jnp.sum(
        t * (jnp.log(jnp.maximum(t, 1e-12)) - jax.nn.log_softmax(student_logits, -1)),
        axis=-1,
    ).mean()


def _inbatch_loss(S_pos: jax.Array, scores_neg: jax.Array) -> jax.Array:
    """CE where query i's positives compete with its hard negative AND every
    other query's positive (in-batch negatives). ``S_pos``: (B, B) query x
    positive-doc scores; ``scores_neg``: (B,) hard-negative scores."""
    logits = jnp.concatenate([S_pos, scores_neg[:, None]], axis=1)  # (B, B+1)
    labels = jnp.arange(S_pos.shape[0])
    return -jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=1
    ).mean()


def make_train_step(
    bert_cfg: BertConfig,
    optimizer,
    *,
    dtype_name: str = "bfloat16",
    in_batch_negatives: bool = True,
) -> Callable:
    """-> jitted ``step(params, opt_state, batch) -> (params, opt_state,
    metrics)``. ``batch`` is a dict of device-ready arrays:
    ``q_ids/q_mask`` (B, Lq), ``pos_ids/pos_mask/pos_keep`` and
    ``neg_ids/neg_mask/neg_keep`` (B, Ld). ``optimizer`` is any optax
    GradientTransformation.
    """

    def loss_fn(params: ColBERTParams, batch: dict) -> Tuple[jax.Array, dict]:
        B = batch["q_ids"].shape[0]
        q_keep = jnp.ones_like(batch["q_mask"])  # queries keep all positions
        # remat: checkpoint each BERT layer so the backward recomputes
        # activations instead of holding 12 layers of attention temps (a
        # bert-base step at B=32 triples, S~300 otherwise needs 22.6 GB)
        Q = encode_batch(
            params, batch["q_ids"], batch["q_mask"], q_keep,
            cfg=bert_cfg, dtype_name=dtype_name, remat=True,
        )
        # one fused doc forward over [positives; negatives]
        d_ids = jnp.concatenate([batch["pos_ids"], batch["neg_ids"]])
        d_mask = jnp.concatenate([batch["pos_mask"], batch["neg_mask"]])
        d_keep = jnp.concatenate([batch["pos_keep"], batch["neg_keep"]])
        D = encode_batch(
            params, d_ids, d_mask, d_keep, cfg=bert_cfg, dtype_name=dtype_name,
            remat=True,
        )
        Dp, Dn = D[:B], D[B:]
        kp, kn = d_keep[:B], d_keep[B:]
        if "teacher_scores" in batch:
            # ColBERTv2 distillation: match the teacher's (pos, neg) gaps
            s_pos = jnp.diagonal(colbert_maxsim(Q, Dp, kp))
            s_neg = jnp.diagonal(colbert_maxsim(Q, Dn, kn))
            logits = jnp.stack([s_pos, s_neg], axis=-1)
            loss = distill_kl_loss(logits, batch["teacher_scores"])
        elif in_batch_negatives:
            S_pos = colbert_maxsim(Q, Dp, kp)               # (B, B)
            s_neg = jnp.diagonal(colbert_maxsim(Q, Dn, kn)) # (B,)
            loss = _inbatch_loss(S_pos, s_neg)
            s_pos = jnp.diagonal(S_pos)
        else:
            s_pos = jnp.diagonal(colbert_maxsim(Q, Dp, kp))
            s_neg = jnp.diagonal(colbert_maxsim(Q, Dn, kn))
            loss = pairwise_softmax_loss(s_pos, s_neg)
        acc = (s_pos > s_neg).mean()
        return loss, {"loss": loss, "pairwise_acc": acc,
                      "margin": (s_pos - s_neg).mean()}

    @jax.jit
    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics

    return step


@dataclass
class ColBERTTrainer:
    """Fine-tune a ColBERT encoder on (query, positive, negative) triples.

    Wraps tokenization (query [Q]/doc [D] markers, MASK augmentation,
    skiplist — identical to inference) and the jitted train step. With a
    mesh attached on the encoder, batches shard over the data axis and XLA
    all-reduces the gradients (params stay replicated).
    """

    encoder: "object"  # colbert_tpu.models.encoder.ColBERTEncoder
    learning_rate: float = 3e-5
    weight_decay: float = 0.01
    in_batch_negatives: bool = True
    warmup_steps: int = 0
    total_steps: int | None = None  # with warmup: linear decay to 0 after it
    max_grad_norm: float | None = 1.0
    optimizer: "object" = None  # optax transform; default clip+adamw

    def __post_init__(self) -> None:
        import optax

        if self.optimizer is None:
            if self.warmup_steps and self.total_steps:
                lr = optax.warmup_cosine_decay_schedule(
                    0.0, self.learning_rate, self.warmup_steps, self.total_steps
                )
            elif self.warmup_steps:
                lr = optax.linear_schedule(
                    0.0, self.learning_rate, self.warmup_steps
                )
            else:
                lr = self.learning_rate
            adamw = optax.adamw(lr, weight_decay=self.weight_decay)
            self.optimizer = (
                optax.chain(optax.clip_by_global_norm(self.max_grad_norm), adamw)
                if self.max_grad_norm is not None
                else adamw
            )
        self.opt_state = self.optimizer.init(self.encoder.params)
        self._step = make_train_step(
            self.encoder.bert_config, self.optimizer,
            dtype_name=self.encoder.config.activation_dtype,
            in_batch_negatives=self.in_batch_negatives,
        )
        self.history: list[dict] = []

    def _tensorize(self, triples: Sequence[Tuple[str, str, str]]) -> dict:
        from colbert_tpu.models.colbert import skiplist_keep_mask
        from colbert_tpu.tokenization.tensorize import (
            tensorize_docs,
            tensorize_queries,
        )

        enc, cfg = self.encoder, self.encoder.config
        qs, pos, neg = (list(x) for x in zip(*triples))
        q_ids, q_mask = tensorize_queries(
            qs, enc.tokenizer, query_token_id=enc.query_token_id,
            query_maxlen=cfg.query_maxlen,
            attend_to_mask_tokens=cfg.attend_to_mask_tokens,
        )
        batch = {"q_ids": q_ids, "q_mask": q_mask}
        for name, texts in (("pos", pos), ("neg", neg)):
            ids, mask = tensorize_docs(
                (), enc.tokenizer, doc_token_id=enc.doc_token_id,
                doc_maxlen=cfg.doc_maxlen, length_bucket=cfg.doc_maxlen,
                encoded=enc.tokenize_batch(texts),
            )
            batch[f"{name}_ids"] = ids
            batch[f"{name}_mask"] = mask
            batch[f"{name}_keep"] = skiplist_keep_mask(ids, mask, enc.skiplist)
        return batch

    def train_step(
        self,
        triples: Sequence[Tuple[str, str, str]],
        teacher_scores: np.ndarray | None = None,
    ) -> dict:
        """One optimizer step on a batch of (query, pos, neg) -> metrics.

        With ``teacher_scores`` (B, 2) — a cross-encoder's (pos, neg)
        scores — the step optimizes ColBERTv2's KL distillation objective
        instead of the contrastive CE."""
        host = self._tensorize(triples)
        if teacher_scores is not None:
            host["teacher_scores"] = np.asarray(teacher_scores, np.float32)
        if self.encoder.mesh is not None:
            # place batches sharded over the data axis so mesh DP actually
            # engages through the public API (params stay replicated; XLA
            # all-reduces the grads)
            ndev = self.encoder.mesh.shape["data"]
            if len(triples) % ndev:
                raise ValueError(
                    f"batch size {len(triples)} must divide the data axis "
                    f"({ndev} devices) for mesh training"
                )
            batch = {
                k: jax.device_put(np.asarray(v), self.encoder._data_sharding)
                for k, v in host.items()
            }
        else:
            batch = {k: jnp.asarray(v) for k, v in host.items()}
        self.encoder.params, self.opt_state, metrics = self._step(
            self.encoder.params, self.opt_state, batch
        )
        metrics = {k: float(v) for k, v in metrics.items()}
        self.history.append(metrics)
        return metrics

    def save_checkpoint(self, directory: str) -> None:
        """Persist the fine-tuned weights as an HF-compatible checkpoint
        directory that ``Indexer``/``Searcher`` (and
        :func:`colbert_tpu.models.hf_loader.load_checkpoint`) load back."""
        from colbert_tpu.models.hf_loader import save_checkpoint

        save_checkpoint(
            directory, self.encoder.params, self.encoder.bert_config,
            self.encoder.tokenizer,
        )

    def train(
        self,
        triples: Iterable[Tuple[str, str, str]],
        *,
        batch_size: int = 32,
        epochs: int = 1,
        seed: int = 0,
    ) -> list[dict]:
        """Mini-batch training over a triple list -> per-step metrics."""
        triples = list(triples)
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(epochs):
            order = rng.permutation(len(triples))
            # drop the ragged tail: each distinct batch shape is a new
            # compile, and a fixed shape keeps training at one program
            for lo in range(0, len(order) - batch_size + 1, batch_size):
                batch = [triples[i] for i in order[lo:lo + batch_size]]
                out.append(self.train_step(batch))
        return out
