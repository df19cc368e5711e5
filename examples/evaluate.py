"""Run a retrieval-quality eval over an index (MS MARCO / LoTTe formats).

Usage:
    python examples/evaluate.py <index_dir> <queries.tsv> <qrels> [--lotte]

``qrels`` is TREC format (``qid 0 pid rel``) by default, or LoTTe JSONL
(``{"qid":..., "answer_pids":[...]}``) with ``--lotte``. Reports MRR@10,
Success@5, nDCG@10, QPS (protocol sources: BASELINE.md north-star targets;
the reference's only eval is the LCS hit-rate script,
examples/AIHelpMe/evals.jl:29-43, available as
colbert_tpu.evaluation.metrics.lcs_hit_rate).
"""

import os
import sys

# the package is used from the repo checkout (no pip install step)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

from colbert_tpu import Searcher
from colbert_tpu.evaluation.runner import (
    evaluate,
    load_qrels_lotte,
    load_qrels_trec,
    load_queries_tsv,
)




from searching import make_searcher  # shared helper (same dir)

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("queries")
    ap.add_argument("qrels")
    ap.add_argument("--lotte", action="store_true")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--random-weights", action="store_true",
                    help="use the deterministic random-weight bench encoder "
                         "(for indexes built with indexing.py --random-weights)")
    args = ap.parse_args()

    searcher = make_searcher(args.index_dir, args.random_weights)
    qids, queries = load_queries_tsv(args.queries)
    qrels = (load_qrels_lotte if args.lotte else load_qrels_trec)(args.qrels)
    report = evaluate(searcher, queries, qids, qrels, k=args.k,
                      batch_size=args.batch_size)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
