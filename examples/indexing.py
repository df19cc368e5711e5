"""Build an index over a TSV collection (mirrors reference examples/indexing.jl).

Usage:
    python examples/indexing.py <checkpoint_dir> <collection.tsv> <index_dir>

With a real ``colbert-ir/colbertv2.0`` checkpoint directory this reproduces
the reference's 10-passage README walkthrough; without one (this environment
ships no checkpoints), pass ``--random-weights`` to exercise the full
pipeline with a deterministic random bert-base model.
"""

import os
import sys

# the package is used from the repo checkout (no pip install step)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging

from colbert_tpu import ColBERTConfig, Indexer


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("collection")
    ap.add_argument("index_dir")
    ap.add_argument("--nbits", type=int, default=2)
    ap.add_argument("--doc-maxlen", type=int, default=300)
    ap.add_argument("--random-weights", action="store_true",
                    help="use a deterministic random bert-base model instead of "
                         "loading the checkpoint (no checkpoint required; "
                         "its synthetic vocab is word00000-style tokens, so "
                         "natural-language text tokenizes to [UNK])")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    config = ColBERTConfig(
        checkpoint=args.checkpoint,
        collection=args.collection,
        index_path=args.index_dir,
        nbits=args.nbits,
        doc_maxlen=args.doc_maxlen,
    )
    if args.random_weights:
        from bench import make_bench_encoder  # repo-root bench fixtures
        from colbert_tpu.models.encoder import ColBERTEncoder

        bench_enc, _ = make_bench_encoder()
        encoder = ColBERTEncoder(
            bench_enc.params, bench_enc.bert_config, bench_enc.tokenizer, config
        )
        indexer = Indexer(config, encoder=encoder)
    else:
        indexer = Indexer(config)
    path = indexer.index()
    print(f"index built at {path}")


if __name__ == "__main__":
    main()
