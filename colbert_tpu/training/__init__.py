"""Training: contrastive fine-tuning of the ColBERT encoder.

No reference equivalent — "training support" is on the reference's roadmap
(README.md:179-190) and `rank`/`nranks` were placeholders for it
(config.jl:13-14). Implemented TPU-first: one jitted train step (forward +
MaxSim + loss + grads + optimizer in a single program), optional data
parallelism by sharding the batch over a mesh (XLA inserts the gradient
all-reduce).
"""

from colbert_tpu.training.trainer import (
    ColBERTTrainer,
    colbert_maxsim,
    distill_kl_loss,
    make_train_step,
    pairwise_softmax_loss,
)

__all__ = [
    "ColBERTTrainer",
    "colbert_maxsim",
    "distill_kl_loss",
    "make_train_step",
    "pairwise_softmax_loss",
]
