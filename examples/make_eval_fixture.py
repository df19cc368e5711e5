"""Generate a synthetic MS-MARCO-shaped eval fixture (TREC format).

The north-star quality number (MRR@10 / Success@5 on MS MARCO with the
real colbertv2.0 checkpoint — BASELINE.md) is environment-blocked here
(zero egress: no checkpoint, no dataset). This script makes the protocol a
rehearsable one-command drill anyway: it writes a ``collection.tsv``,
``queries.tsv`` and TREC ``qrels.txt`` over the bench corpus (queries are
passage prefixes; the source passage is the relevant document), so the
full real-data pipeline —

    python examples/make_eval_fixture.py /tmp/fx --n 141431 --queries 64
    python examples/indexing.py none /tmp/fx/collection.tsv /tmp/fx/idx \\
        --random-weights
    python examples/evaluate.py /tmp/fx/idx /tmp/fx/queries.tsv \\
        /tmp/fx/qrels.txt --random-weights

— runs end-to-end through the public entry points. When a checkpoint and
MS MARCO are available, the SAME three commands minus the random-weights
flag (and with the real files) produce the north-star number. Reference
protocol being reproduced: examples/AIHelpMe/evals.jl:29-43 (index ->
batched search -> hit-rate against known answers).
"""

import os
import sys

# the package is used from the repo checkout (no pip install step)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=141_431,
                    help="collection size (bench topical corpus)")
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--prefix-chars", type=int, default=200,
                    help="query = this many chars of its source passage")
    args = ap.parse_args()

    from bench import synthetic_passages  # repo-root bench fixtures

    os.makedirs(args.out_dir, exist_ok=True)
    passages = synthetic_passages(args.n)
    with open(os.path.join(args.out_dir, "collection.tsv"), "w") as f:
        for pid, text in enumerate(passages):
            f.write(f"{pid}\t{text}\n")

    # queries over a pid spread; ground truth = the source passage
    probe = list(range(0, args.n, max(1, args.n // args.queries)))
    probe = probe[: args.queries]
    with open(os.path.join(args.out_dir, "queries.tsv"), "w") as f:
        for qid, pid in enumerate(probe):
            f.write(f"q{qid}\t{passages[pid][: args.prefix_chars]}\n")
    with open(os.path.join(args.out_dir, "qrels.txt"), "w") as f:
        for qid, pid in enumerate(probe):
            f.write(f"q{qid} 0 {pid} 1\n")
    print(f"fixture at {args.out_dir}: {args.n} passages, "
          f"{len(probe)} queries (TREC qrels)")


if __name__ == "__main__":
    main()
