"""Incrementally update an existing index: add, remove, compact.

Usage:
    python examples/update.py <index_dir> add "new passage one" "two" ...
    python examples/update.py <index_dir> remove 17 42
    python examples/update.py <index_dir> compact
    # pass --checkpoint DIR if the index's config points elsewhere

No reference equivalent ("index updation" is the reference's roadmap item,
README.md:179-190). Open searchers keep their snapshot; serving fronts can
switch with ``BatchingSearcher.swap(Searcher(index_dir))``.
"""

import os
import sys

# the package is used from the repo checkout (no pip install step)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("action", choices=["add", "remove", "compact"])
    ap.add_argument("items", nargs="*",
                    help="passages for add, pids for remove")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir (overrides the index config's)")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from colbert_tpu import IndexUpdater
    from colbert_tpu.config import ColBERTConfig
    from colbert_tpu.models.encoder import ColBERTEncoder
    from colbert_tpu.models.hf_loader import load_checkpoint

    config = ColBERTConfig.load(os.path.join(args.index_dir, "config.json"))
    bert_cfg, params, tokenizer = load_checkpoint(
        args.checkpoint or config.checkpoint
    )
    encoder = ColBERTEncoder(params, bert_cfg, tokenizer, config)
    updater = IndexUpdater(args.index_dir, encoder)

    if args.action == "add":
        pids = updater.add(list(args.items))
        print(f"added pids {pids.tolist()}", file=sys.stderr)
    elif args.action == "remove":
        updater.remove([int(p) for p in args.items])
        print(f"removed {args.items}", file=sys.stderr)
    else:
        pid_map = updater.compact()
        kept = int((pid_map >= 0).sum())
        print(f"compacted: {kept} pids remain", file=sys.stderr)


if __name__ == "__main__":
    main()
