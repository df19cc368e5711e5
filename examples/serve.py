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
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from colbert_tpu import Searcher
    from colbert_tpu.serving.http import serve

    searcher = Searcher(args.index_dir)
    print(f"serving {args.index_dir} on http://{args.host}:{args.port}",
          file=sys.stderr)
    serve(searcher, args.host, args.port,
          max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)


if __name__ == "__main__":
    main()
