"""Fine-tune a ColBERT checkpoint on (query, positive, negative) triples.

Usage:
    python examples/train.py <checkpoint_dir> <triples.tsv> <out_checkpoint> \
        [--batch-size 32] [--epochs 1] [--lr 3e-5] [--pairwise]

``triples.tsv``: one ``query\\tpositive\\tnegative`` per line (the standard
MS MARCO triples format). The fine-tuned weights are exported as an
HF-compatible checkpoint directory usable by ``Indexer``/``Searcher``.

No reference equivalent ("training support" is the reference's roadmap
item, README.md:179-190).
"""

import os
import sys

# the package is used from the repo checkout (no pip install step)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging


def read_triples(path: str) -> list[tuple[str, str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 3:
                out.append((parts[0], parts[1], parts[2]))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("triples")
    ap.add_argument("out_checkpoint")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--lr", type=float, default=3e-5)
    ap.add_argument("--pairwise", action="store_true",
                    help="plain (pos, neg) CE instead of in-batch negatives")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from colbert_tpu.config import ColBERTConfig
    from colbert_tpu.models.encoder import ColBERTEncoder
    from colbert_tpu.models.hf_loader import load_checkpoint
    from colbert_tpu.training import ColBERTTrainer

    bert_cfg, params, tokenizer = load_checkpoint(args.checkpoint)
    encoder = ColBERTEncoder(params, bert_cfg, tokenizer, ColBERTConfig())
    trainer = ColBERTTrainer(
        encoder, learning_rate=args.lr,
        in_batch_negatives=not args.pairwise,
    )
    triples = read_triples(args.triples)
    print(f"{len(triples)} triples", file=sys.stderr)
    for epoch in range(args.epochs):
        metrics = trainer.train(triples, batch_size=args.batch_size,
                                epochs=1, seed=epoch)
        last = metrics[-1] if metrics else {}
        print(f"epoch {epoch}: steps={len(metrics)} "
              f"loss={last.get('loss', float('nan')):.4f} "
              f"acc={last.get('pairwise_acc', float('nan')):.3f}",
              file=sys.stderr)
    trainer.save_checkpoint(args.out_checkpoint)
    print(f"saved fine-tuned checkpoint to {args.out_checkpoint}", file=sys.stderr)


if __name__ == "__main__":
    main()
