"""Query an index (mirrors reference examples/searching.jl).

Usage:
    python examples/searching.py <index_dir> "your query" [-k 5]
    python examples/searching.py <index_dir> --interactive
"""

import argparse

from colbert_tpu import Searcher


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("query", nargs="?")
    ap.add_argument("-k", type=int, default=5)
    ap.add_argument("--interactive", action="store_true")
    args = ap.parse_args()

    searcher = Searcher(args.index_dir)

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
