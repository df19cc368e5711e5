"""Serve an index over HTTP with cross-request batching.

Usage:
    python examples/serve.py <index_dir> [--port 8080] [--checkpoint DIR]
    curl -XPOST localhost:8080/search -d '{"query": "...", "k": 5}'
    curl localhost:8080/health ; curl localhost:8080/stats

No reference equivalent (serving is on the reference's roadmap,
README.md:179-190). Concurrent clients share device dispatches through
:class:`colbert_tpu.serving.batcher.BatchingSearcher`.
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
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--max-batch", type=int, default=128)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint dir (overrides the index config's)")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from colbert_tpu import Searcher
    from colbert_tpu.serving.http import serve

    encoder = None
    if args.checkpoint:
        from colbert_tpu.config import ColBERTConfig
        from colbert_tpu.models.encoder import ColBERTEncoder
        from colbert_tpu.models.hf_loader import load_checkpoint

        config = ColBERTConfig.load(
            os.path.join(args.index_dir, "config.json")
        )
        bert_cfg, params, tokenizer = load_checkpoint(args.checkpoint)
        encoder = ColBERTEncoder(params, bert_cfg, tokenizer, config)
    searcher = Searcher(args.index_dir, encoder=encoder)
    print(f"serving {args.index_dir} on http://{args.host}:{args.port}",
          file=sys.stderr)
    serve(searcher, args.host, args.port,
          max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)


if __name__ == "__main__":
    main()
