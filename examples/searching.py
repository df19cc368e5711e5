"""Query an index (mirrors reference examples/searching.jl).

Usage:
    python examples/searching.py <index_dir> "your query" [-k 5]
    python examples/searching.py <index_dir> --interactive
"""

import os
import sys

# the package is used from the repo checkout (no pip install step)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from colbert_tpu import Searcher




def make_searcher(index_dir: str, random_weights: bool):
    """Searcher for the index; --random-weights injects the deterministic
    bench encoder (an index built with --random-weights must be searched
    with it too — there is no checkpoint to load)."""
    if random_weights:
        from bench import make_bench_encoder

        encoder, _ = make_bench_encoder()
        return Searcher(index_dir, encoder=encoder)
    return Searcher(index_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("query", nargs="?")
    ap.add_argument("-k", type=int, default=5)
    ap.add_argument("--interactive", action="store_true")
    ap.add_argument("--random-weights", action="store_true",
                    help="use the deterministic random-weight bench encoder "
                         "(for indexes built with indexing.py --random-weights)")
    args = ap.parse_args()

    searcher = make_searcher(args.index_dir, args.random_weights)

    def run(q: str) -> None:
        pids, scores = searcher.search(q, k=args.k)
        for rank, (pid, score) in enumerate(zip(pids, scores), 1):
            if pid < 0:
                break
            print(f"{rank:2d}. pid={pid} score={score:.4f}")

    if args.interactive:
        while True:
            try:
                q = input("query> ").strip()
            except EOFError:
                break
            if q:
                run(q)
    else:
        if not args.query:
            ap.error("query required unless --interactive")
        run(args.query)


if __name__ == "__main__":
    main()
